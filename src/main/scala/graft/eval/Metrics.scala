package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.Triple

/** Evaluation metrics — re-expression of `sem_eval_model.py:326-374`
  * (accuracy + micro P/R/F1) and the BASELINE.md triple matcher
  * (SURVEY.md §2.28). All distributed joins/aggregations; no collect of
  * row-level data. */
object Metrics {

  final case class PRF(precision: Double, recall: Double, f1: Double)

  /** Micro-averaged P/R/F1 from (id, pred) vs (id, gold) frames. In
    * single-label multiclass micro-P = micro-R = accuracy, but we compute
    * from TP/FP/FN so the formula holds for partial prediction sets too. */
  def microPRF(pred: DataFrame, gold: DataFrame): PRF = {
    val joined = gold.as("g").join(pred.as("p"), Seq("id"), "left")
    val agg = joined.agg(
      sum(when(col("p.pred") === col("g.gold"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("p.pred").isNotNull, 1L).otherwise(0L)).as("npred"),
      count(lit(1)).as("ngold"))
    val row = agg.collect()(0)
    val tp = row.getLong(0).toDouble
    val np = row.getLong(1).toDouble
    val ng = row.getLong(2).toDouble
    val p = if (np > 0) tp / np else 0.0
    val r = if (ng > 0) tp / ng else 0.0
    val f1 = if (p + r > 0) 2 * p * r / (p + r) else 0.0
    PRF(p, r, f1)
  }

  /** Triple matcher: exact (subj,pred,obj[,url]) equi-join.
    * P = matched/|predicted|, R = matched/|reference|. Distinct first so
    * duplicates cannot inflate either side. */
  def triplePR(
      predicted: Dataset[Triple],
      reference: Dataset[Triple],
      matchUrl: Boolean = true): PRF = {
    val keys = if (matchUrl) Seq("subj", "pred", "obj", "url") else Seq("subj", "pred", "obj")
    val p = predicted.toDF().select(keys.map(col): _*).distinct()
    val g = reference.toDF().select(keys.map(col): _*).distinct()
    val matched = p.join(g, keys, "left_semi").count().toDouble
    val np = p.count().toDouble
    val ng = g.count().toDouble
    val prec = if (np > 0) matched / np else 0.0
    val rec = if (ng > 0) matched / ng else 0.0
    val f1 = if (prec + rec > 0) 2 * prec * rec / (prec + rec) else 0.0
    PRF(prec, rec, f1)
  }
}
