package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.annotate.Gazetteer
import graft.kernel.ScoringKernel
import graft.schema.WebPage
import graft.tokenize.BertTokenizer
import graft.triples.TriplePipeline

/** Streaming ingest for the flagship KG pipeline: `readStream` over a
  * parquet directory of web pages → the SAME fused narrow pass
  * (normalize → annotate → window → encode → batch-score → label) →
  * append-mode parquet triple sink.
  *
  * The batch pipeline (`TriplePipeline.run`) is stateless per page, so it
  * lifts onto Structured Streaming unchanged — each micro-batch is one
  * narrow map over new files, checkpointed by the streaming engine, which
  * is exactly the incremental-Common-Crawl ingest shape: drop a new WARC
  * dump into the input directory and only it is processed. */
object TripleStream {

  /** Run the streaming pipeline over `pagesDir` until no input remains
    * (AvailableNow); triples land under `outDir` as parquet. Restarting
    * with the same checkpoint resumes incrementally (file-source log). */
  def run(
      spark: SparkSession,
      pagesDir: String,
      outDir: String,
      checkpointDir: String,
      gaz: Broadcast[Gazetteer],
      tokenizer: Broadcast[BertTokenizer],
      kernel: Broadcast[ScoringKernel],
      idx2rel: Broadcast[Map[Int, String]],
      cfg: TriplePipeline.Config = TriplePipeline.Config()): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[WebPage].schema
    val pages = spark.readStream
      .schema(schema)
      .parquet(pagesDir)
      .as[WebPage]
    val triples = TriplePipeline.run(spark, pages, gaz, tokenizer, kernel, idx2rel, cfg)
    val q = triples.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }

  def readTriples(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
