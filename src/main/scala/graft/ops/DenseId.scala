package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.LongType

/** Dense contiguous ids 0..n-1 in a global sort order WITHOUT a
  * partition-less ranking window (which funnels every row through one task
  * — the classic `WindowExec: No Partition Defined` scale-killer).
  *
  * Two-phase plan: range-repartition on the order key, sort within
  * partitions, then enumerate with per-partition offsets (zipWithIndex
  * semantics: one lightweight count job whose shuffle output is reused by
  * the main job). The assigned id equals the row's rank in the global sort
  * order, so the result is deterministic regardless of the sampled range
  * boundaries — provided `orderCols` is a total order (unique keys), which
  * every call site guarantees (first-seen structs / (docOrd, pairOrd)).
  *
  * At 100 TB this is the standard dense-id idiom: the widest shuffle is a
  * range exchange of the input itself; no stage sees more than one
  * partition's rows at a time.
  */
object DenseId {

  def withDenseId(df: DataFrame, idName: String, orderCols: Column*): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}

    val spark = df.sparkSession
    val numParts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(numParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(idName, LongType, nullable = false)
    // stay on InternalRow (no external-Row decode/re-encode: the fact-table
    // call site carries token arrays, and boxing them twice per row costs
    // more than the id assignment itself). zipWithIndex's count job reuses
    // the range exchange's shuffle output.
    val rdd = sorted.queryExecution.toRdd
      .zipWithIndex()
      .mapPartitions { it =>
        val idRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        it.map { case (row, i) =>
          idRow.update(0, i)
          joined(row, idRow): InternalRow
        }
      }
    GraftBridge.internalDF(spark, rdd, schema)
  }
}
