package graft.tools

import org.apache.spark.sql.SparkSession
import graft.statements.Encode

/** Wide-op (shuffle-heavy MTB chain) scaling probe: efficiency vs corpus
  * size, to separate per-job fixed overhead from genuine shuffle scaling.
  * Usage: WideScaleProbe [pages ...] */
object WideScaleProbe {

  private def session(cores: Int): SparkSession = {
    val b = graft.GraftSession.builder(cores, s"wide-probe-$cores")
    // PROBE_PARTITIONS: fix shuffle partitions across legs so both core
    // counts sort/aggregate identical partition sizes (otherwise the lo
    // leg's 4 fat partitions pay more per-partition spill, inflating eff)
    sys.env.get("PROBE_PARTITIONS").foreach(p => b.config("spark.sql.shuffle.partitions", p))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def run(s: SparkSession, n: Long): Long = {
    val sc = s.sparkContext
    val ds = graft.statements.MtbDataset.build(
      s, graft.fixtures.Corpus.generate(s, n),
      sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities)),
      sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer),
      minCount = 2, minPoolSize = 2)
    val c = ds.pools.count()
    s.catalog.clearCache()
    c
  }

  /** Phase-timed single run: statements materialization vs the rest. */
  def phases(s: SparkSession, n: Long): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    val sc = s.sparkContext
    val gaz = sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities))
    val tok = sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer)
    def t[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    import s.implicits._
    val statements = graft.triples.TriplePipeline
      .normalizePages(graft.fixtures.Corpus.generate(s, n), graft.triples.TriplePipeline.Config())
      .as[(String, String)]
      .flatMap { case (url, tn) =>
        val doc = graft.annotate.Annotator.annotate(url, tn, gaz.value)
        graft.statements.Windowing.statements(doc, graft.triples.TriplePipeline.stableDocOrd(url))
      }
      .toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tStatements = t(statements.count())
    val enc = Encode.dictEncode(statements)
    val tXDim = t(enc.xDim.count())
    val tEDim = t(enc.eDim.count())
    val afterMin = Encode.freqFilter(enc.fact, 2)
    val afterPool = Encode.freqFilter(afterMin, 2)
    val tFact = t(afterPool.count())
    val tokEnc = afterPool // skip tokenize detail; reuse build for rest
    val tRest = t {
      val ds = graft.statements.MtbDataset.build(s, graft.fixtures.Corpus.generate(s, n), gaz, tok,
        minCount = 2, minPoolSize = 2)
      ds.pools.count()
    }
    statements.unpersist()
    s.catalog.clearCache()
    val _ = tokEnc
    Seq("statements" -> tStatements, "xDim" -> tXDim, "eDim" -> tEDim,
      "factFiltered" -> tFact, "fullBuild" -> tRest)
  }

  def main(args: Array[String]): Unit = {
    val mode = sys.env.getOrElse("PROBE_MODE", "scale")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(200000L, 600000L)
    if (mode == "phases") {
      sizes.foreach { n =>
        Seq(4, 16).foreach { c =>
          val s = session(c)
          run(s, 2000)
          val ph = phases(s, n)
          s.stop()
          println(f"pages=$n cores=$c " + ph.map { case (k, v) => f"$k=$v%.1f" }.mkString(" "))
        }
      }
    } else sizes.foreach { n =>
      val lo = session(4)
      run(lo, 20000)
      val t0 = System.nanoTime(); run(lo, n); val tLo = (System.nanoTime() - t0) / 1e9
      lo.stop()
      val hi = session(16)
      run(hi, 20000)
      val t1 = System.nanoTime(); run(hi, n); val tHi = (System.nanoTime() - t1) / 1e9
      hi.stop()
      println(f"pages=$n lo=$tLo%.1f hi=$tHi%.1f eff=${(tLo / tHi) / 4}%.3f")
    }
  }
}
