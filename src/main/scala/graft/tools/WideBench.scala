package graft.tools

import org.apache.spark.sql.SparkSession

/** Wide-leg-only mirror of graft.Bench's scaling.wide section (same stored
  * parquet corpus, same pinned shuffle partitions, same interleaved pairs
  * and min-per-phase statistic) — for sizing SPARK_GRAFT_WIDE_PAGES
  * without paying for the full battery. Usage: WideBench [pages [reps]] */
object WideBench {

  private def session(cores: Int): SparkSession = {
    val s = graft.GraftSession.builder(cores, s"wide-bench-$cores")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toLong).getOrElse(2000000L)
    val reps = if (args.length > 1) args(1).toInt else 2
    val corpusPath = s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-$pages.parquet"

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusPath))) {
      val s = session(32)
      graft.fixtures.Corpus.generate(s, pages)
        .write.mode("overwrite").parquet(corpusPath)
      s.stop()
      System.gc()
    }

    def pagesDs(s: SparkSession, limit: Long) = {
      import s.implicits._
      val df = s.read.parquet(corpusPath)
      (if (limit > 0) df.limit(limit.toInt) else df).as[graft.schema.WebPage]
    }

    def wideRun(s: SparkSession, limit: Long): Long = {
      val sc = s.sparkContext
      val ds = graft.statements.MtbDataset.build(
        s, pagesDs(s, limit),
        sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities)),
        sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer),
        minCount = 2, minPoolSize = 2)
      val c = ds.pools.count()
      s.catalog.clearCache()
      c
    }

    def wideLeg(cores: Int): WideScaleProbe.PhasedCpu = {
      val s = session(cores)
      wideRun(s, 2000)
      val r = WideScaleProbe.phasedRunCpuOn(s, pagesDs(s, 0))
      s.stop()
      System.gc()
      r
    }

    val pairsRun = (1 to reps).map { i =>
      val loR = wideLeg(4)
      val hiR = wideLeg(16)
      val (lo, cLo) = (loR.wall, loR.pools)
      val (hi, cHi) = (hiR.wall, hiR.pools)
      require(cLo == cHi, s"pools disagree: $cLo vs $cHi")
      println(f"pair $i lo=${lo.map(_._2).sum}%.1f hi=${hi.map(_._2).sum}%.1f " +
        f"eff=${(lo.map(_._2).sum / hi.map(_._2).sum) / 4}%.3f")
      lo.zip(hi).foreach { case ((n, l), (_, h)) =>
        val cpuL = loR.cpuSec.getOrElse(n, 0.0)
        val cpuH = hiR.cpuSec.getOrElse(n, 0.0)
        // cpu_ratio ~1.0 = both legs executed the same on-CPU work (wall
        // gap is host scheduling/stalls); util = cpu / (cores * wall)
        println(f"  $n%-24s lo=$l%7.2f hi=$h%7.2f eff=${(l / h) / 4}%.3f  " +
          f"cpu_lo=$cpuL%7.2f cpu_hi=$cpuH%7.2f cpu_ratio=${if (cpuL > 0) cpuH / cpuL else 0.0}%.3f " +
          f"util_lo=${cpuL / (4 * l)}%.2f util_hi=${cpuH / (16 * h)}%.2f")
      }
      (lo, hi)
    }

    val names = pairsRun.head._1.map(_._1)
    val loM = names.map(n => n -> pairsRun.map(_._1.toMap.apply(n)).min)
    val hiM = names.map(n => n -> pairsRun.map(_._2.toMap.apply(n)).min)
    println(f"MIN-PER-PHASE pages=$pages reps=$reps")
    names.indices.foreach { i =>
      println(f"  ${names(i)}%-24s lo=${loM(i)._2}%7.2f hi=${hiM(i)._2}%7.2f " +
        f"eff=${(loM(i)._2 / hiM(i)._2) / 4}%.3f")
    }
    val steady = names.indices.filter(i => hiM(i)._2 >= 2.0)
    val sEff = (steady.map(loM(_)._2).sum / steady.map(hiM(_)._2).sum) / 4
    println(f"steady(hi>=2s): eff=$sEff%.3f over ${steady.map(names)}")
    println(f"overall: eff=${(loM.map(_._2).sum / hiM.map(_._2).sum) / 4}%.3f")
  }
}
