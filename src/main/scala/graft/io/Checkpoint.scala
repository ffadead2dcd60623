package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage checkpoint manager + per-partition lineage metrics — the engine's
  * generalization of the reference's skip-if-exists pickle caches
  * (`mtb_data_loader.py:102-105`, `:136-145`; SURVEY.md §2.30, §7.4), made
  * auditable and partition-granular per the north rule ("resumable from
  * checkpoint with per-partition lineage + metrics").
  *
  * Each stage writes: `<root>/<stage>/` (parquet) + `<root>/<stage>.ok`
  * (manifest json: row count, checksum, wall ms) + rows in the metrics
  * table `<root>/_metrics/` (stage, run_id, partition_id, rows_out,
  * checksum, wall_ms). On restart, stages with a complete manifest are read
  * back, not recomputed — so a killed run resumes mid-pipeline with
  * identical results (determinism is guaranteed by the stages themselves).
  *
  * Sandbox note (SURVEY.md §7.6): no Iceberg runtime jar exists offline, so
  * tables are partitioned parquet + JSON manifest with Iceberg-like
  * semantics behind this one seam; production swaps writeTo()/snapshots in
  * without touching call sites.
  */
final class CheckpointManager(spark: SparkSession, root: String, runId: String) {

  private def stageDir(name: String) = s"$root/$name"
  private def manifestPath(name: String) = Paths.get(s"$root/$name.ok")
  private val metricsDir = s"$root/_metrics"

  def isComplete(name: String): Boolean = Files.exists(manifestPath(name))

  /** Run (or resume) a stage. `compute` is only invoked on a cache miss. */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (isComplete(name)) {
      spark.read.parquet(stageDir(name))
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(stageDir(name))
      val wallMs = (System.nanoTime() - t0) / 1000000L

      // per-partition lineage over the MATERIALIZED stage output: stable
      // across resume because it reads the written files, not the plan.
      // ONE scan: the lineage is partition-count-sized, so collect it and
      // derive the manifest totals (row count, checksum) locally — the
      // previous shape re-scanned the stage output three times (metrics
      // write, rows count, checksum aggregate)
      val written = spark.read.parquet(stageDir(name))
      val lineageLocal = written
        .groupBy(spark_partition_id().as("partition_id"))
        .agg(
          count(lit(1)).as("rows_out"),
          // decimal sum: ANSI mode would overflow a long checksum
          sum(xxhash64(struct(written.columns.map(col): _*)).cast("decimal(38,0)"))
            .cast("string").as("checksum"))
        .collect()
      import spark.implicits._
      lineageLocal.toSeq
        .map(r => (name, runId, r.getInt(0), r.getLong(1), r.getString(2), wallMs))
        .toDF("stage", "run_id", "partition_id", "rows_out", "checksum", "wall_ms")
        .coalesce(1)
        .write.mode("append").parquet(metricsDir)

      val rows = lineageLocal.iterator.map(_.getLong(1)).sum
      val checksum =
        if (lineageLocal.isEmpty) null
        else lineageLocal.iterator
          .map(r => new java.math.BigDecimal(r.getString(2)))
          .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      Files.createDirectories(Paths.get(root))
      Files.write(
        manifestPath(name),
        s"""{"stage":"$name","run_id":"$runId","rows":$rows,"checksum":"$checksum","wall_ms":$wallMs}"""
          .getBytes(StandardCharsets.UTF_8))
      written
    }
  }

  def metrics: DataFrame = spark.read.parquet(metricsDir)

  private val kpiDir = s"$root/_kpi"

  /** Per-epoch KPI series (§2.29 — the reference appends per-epoch losses /
    * accuracy lists into its model checkpoints, `mtb_model.py:205-222`):
    * one appended row per (epoch, name) in a queryable parquet table
    * instead of pickled lists inside a weights file. */
  def logKpi(epoch: Int, name: String, value: Double): Unit = {
    import spark.implicits._
    Seq((runId, epoch, name, value))
      .toDF("run_id", "epoch", "kpi", "value")
      .coalesce(1)
      .write.mode("append").parquet(kpiDir)
  }

  /** The KPI series, ordered for plotting/regression checks. */
  def kpiSeries: DataFrame =
    spark.read.parquet(kpiDir).orderBy("kpi", "epoch")

  /** Invalidate a stage (and force downstream recompute on next run). */
  def invalidate(name: String): Unit = {
    Files.deleteIfExists(manifestPath(name))
  }
}
