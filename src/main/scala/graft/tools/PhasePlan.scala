package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the executed plan of the MTB filter_tokenize_encode stage (the
  * freq-filter semi join + tokenize + DenseId range exchange) over the
  * stored bench corpus — to see which join strategy actually runs and
  * where the non-scaling constant lives. Usage: PhasePlan [pages] */
object PhasePlan {
  def main(args: Array[String]): Unit = {
    val limit = args.headOption.map(_.toInt).getOrElse(100000)
    val s = graft.GraftSession.builder(16, "phase-plan")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val corpusPath = s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-1000000.parquet"
    val pages = s.read.parquet(corpusPath).limit(limit).as[graft.schema.WebPage]
    val sc = s.sparkContext
    val gaz = sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities))

    val statements = graft.triples.TriplePipeline
      .normalizePages(pages, graft.triples.TriplePipeline.Config(windowSize = 40))
      .as[(String, String)]
      .flatMap { case (url, textNorm) =>
        val doc = graft.annotate.Annotator.annotate(url, textNorm, gaz.value)
        graft.statements.Windowing.statements(
          doc, graft.triples.TriplePipeline.stableDocOrd(url), 40)
      }
      .toDF()
      .drop("url")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    statements.count()

    val enc = graft.statements.Encode.dictEncode(statements)
    val afterPool = graft.statements.Encode.freqFilter(enc.fact, 2)
    // force through count so AQE finalizes, then print the executed plan
    val t0 = System.nanoTime()
    val n = afterPool.count()
    println(f"afterPool count=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(afterPool.queryExecution.executedPlan.toString.take(8000))
    s.stop()
  }
}
