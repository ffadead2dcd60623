package graft.statements

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DenseId

/** Gradient-accumulation batching (SURVEY.md §2.32) — the DATA side of
  * the reference's accumulation loop (`sem_eval_model.py:236-245`):
  * mini-batches of `miniBatchSize` stream through the model, a points
  * counter accumulates, and the optimizer steps once it reaches
  * `batchSize` (loss pre-scaled by 1/batch_size at `:237`).
  *
  * Distributed re-expression: each relation gets a deterministic rank in
  * the epoch-keyed shuffle order (the §2.17 pool-shuffle discipline), and
  * from the rank the micro-batch id, the accumulation step that consumes
  * it, and the reference's loss scale — all pure arithmetic, so the
  * assignment is exactly oracle-checkable AND stable under partitioning,
  * retry, or resume. A training executor partitions by accum_step and
  * walks micro-batches in order; the optimizer-step boundary is a column,
  * not driver state. */
object GradAccum {

  def assign(
      rel: DataFrame,
      idCol: String,
      batchSize: Int,
      miniBatchSize: Int,
      epoch: Int,
      seed: Long = 42L): DataFrame = {
    require(miniBatchSize > 0 && batchSize >= miniBatchSize,
      s"need batchSize >= miniBatchSize > 0, got $batchSize/$miniBatchSize")
    // optimizer fires after ceil(batchSize / miniBatchSize) micro-batches
    // (points_seen >= batch_size with miniBatchSize points per micro)
    val microsPerStep = (batchSize + miniBatchSize - 1) / miniBatchSize
    val h = PortableRng.drawCol(
      PortableRng.mixCol(lit(seed), lit(epoch.toLong)), lit(5L), col(idCol))
    DenseId
      .withDenseId(rel.withColumn("shuffle_h", h), "rank", col("shuffle_h"), col(idCol))
      .withColumn("micro_batch", floor(col("rank") / miniBatchSize).cast("long"))
      .withColumn("accum_step", floor(col("micro_batch") / microsPerStep).cast("long"))
      .withColumn("loss_scale", lit(1.0d / batchSize))
      .drop("shuffle_h")
  }
}
