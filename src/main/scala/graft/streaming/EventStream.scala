package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface: windowed aggregation with watermark over
  * the events table. For the sandbox the parquet directory drives a real
  * streaming query synchronously (memory sink + processAllAvailable); in
  * production the same plan reads Kafka/files incrementally. */
object EventStream {

  /** Hourly per-type counts/sums via a real streaming query. Returns the
    * final materialized result (hour, event_type, n, total_value). */
  def hourlyAgg(spark: SparkSession, eventsParquet: String): DataFrame = {
    val schema = spark.read.parquet(eventsParquet).schema
    // the streaming file source needs a DIRECTORY; point it at the parent
    // with a glob filter selecting just this table's file(s)
    val f = new java.io.File(eventsParquet)
    val (dir, glob) =
      if (f.isDirectory) (eventsParquet, "*")
      else (f.getParent, f.getName)
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
      // watermarks need an instant (LTZ) type; session TZ is UTC so the
      // NTZ->LTZ cast is value-preserving and reversed on output
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // decimal sum: exact + order-independent, so the streaming result is
      // bit-identical to the batch oracle regardless of micro-batch order
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("total_value"))
      .select(
        col("w.start").cast("timestamp_ntz").as("hour"),
        col("event_type"),
        col("n"),
        col("total_value"))

    val name = s"graft_stream_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
