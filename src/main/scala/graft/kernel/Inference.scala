package graft.kernel

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Broadcast-model mapPartitions inference driver (SURVEY.md §2.22-2.24).
  *
  * Scale design: the model is broadcast once per executor; rows are length-
  * bucketed inside each partition (`sortWithinPartitions(size)`, the Spark
  * equivalent of the reference's batch length sort,
  * `preprocessing_funcs.py:92-98`) so padding waste stays low; batches are
  * padded to the batch max like Pad_Sequence (`:75-119`) and scored in one
  * kernel call. No collect, no driver loop — pure per-partition streaming.
  */
object Inference {

  final case class ScoreInput(id: Long, tokenIds: Seq[Int], e1Start: Int, e2Start: Int)
  final case class Scored(id: Long, pred: Int)

  def classify(
      spark: SparkSession,
      in: Dataset[ScoreInput],
      kernel: Broadcast[ScoringKernel],
      padId: Int,
      batchSize: Int = 64,
      maxSeqLen: Int = 512): Dataset[Scored] = {
    import spark.implicits._
    in.sortWithinPartitions(size($"tokenIds"))
      .mapPartitions { rows =>
        val k = kernel.value
        rows.grouped(batchSize).flatMap { group =>
          val batch = group.toArray
          val maxLen = math.min(
            maxSeqLen,
            if (batch.isEmpty) 0 else batch.map(_.tokenIds.length).max)
          val padded = batch.map { r =>
            val ids = r.tokenIds.take(maxLen).toArray
            val out = if (ids.length == maxLen) ids
            else ids ++ Array.fill(maxLen - ids.length)(padId)
            (out, r.e1Start, r.e2Start)
          }
          val logits = k.scoreBatch(padded)
          batch.indices.map(i => Scored(batch(i).id, StubKernel.argmax(logits(i))))
        }
      }
  }
}
