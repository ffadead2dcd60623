package graft.statements

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.annotate.Gazetteer
import graft.schema.WebPage
import graft.tokenize.BertTokenizer
import graft.triples.TriplePipeline

/** MTB pre-training dataset builder — the distributed equivalent of the
  * reference's `build_dataset` + `preprocess` chain (SURVEY.md §3.1):
  * statements → dict-encode (§2.9) → min_count filter (§2.10) →
  * min_pool_size filter → marker insert + tokenize + span fixup (§2.11-13)
  * → relation ids → entity-pair pools with train/validation split
  * (§1.8, §2.16).
  *
  * Shuffle boundaries match §3.1 exactly: the two dictionary groupBys, the
  * two frequency groupBys and the pools groupBy; everything else is narrow.
  */
object MtbDataset {

  final case class Result(
      tokenizedRelations: DataFrame, // relation_id, token_ids, e1_span, e2_span, e1_id, e2_id
      pools: DataFrame,              // e1_id, e2_id, relation_ids, set
      e1Pool: DataFrame,
      e2Pool: DataFrame,
      xDim: DataFrame,
      eDim: DataFrame)

  def build(
      spark: SparkSession,
      pages: Dataset[WebPage],
      gaz: Broadcast[Gazetteer],
      tokenizer: Broadcast[BertTokenizer],
      minCount: Int = 2,
      minPoolSize: Int = 8,
      windowSize: Int = 40,
      splitSeed: Long = 42L): Result = {
    import spark.implicits._

    // statements as a DataFrame (url, docOrd, pairOrd, tokens, spans, e1, e2)
    val statements = TriplePipeline
      .normalizePages(pages, TriplePipeline.Config(windowSize = windowSize))
      .as[(String, String)]
      .flatMap { case (url, textNorm) =>
        val doc = graft.annotate.Annotator.annotate(url, textNorm, gaz.value)
        Windowing.statements(doc, TriplePipeline.stableDocOrd(url), windowSize)
      }
      .toDF()

    val enc = Encode.dictEncode(statements)
    val afterMin = Encode.freqFilter(enc.fact, minCount)
    val afterPool = Encode.freqFilter(afterMin, minPoolSize)
    val (xDim, eDim) = Encode.pruneDims(afterPool, enc.xDim, enc.eDim)

    // marker insertion + tokenize + span fixup; drop rows whose markers
    // vanish (ValueError path) — counted by the caller via metrics
    val tokEnc = afterPool
      .map { row =>
        val tokens: Seq[String] =
          row.getAs[scala.collection.Seq[String]]("tokens").toSeq
        val e1 = graft.schema.Span(row.getAs[Int]("e1s"), row.getAs[Int]("e1e"))
        val e2 = graft.schema.Span(row.getAs[Int]("e2s"), row.getAs[Int]("e2e"))
        val encOpt = Markers.encode(tokenizer.value)(tokens, e1, e2)
        (
          row.getAs[Long]("docOrd"),
          row.getAs[Int]("pairOrd"),
          row.getAs[Long]("e1_id"),
          row.getAs[Long]("e2_id"),
          encOpt.map(_.tokenIds).orNull,
          encOpt.map(e => Seq(e.e1Span.start, e.e1Span.end)).orNull,
          encOpt.map(e => Seq(e.e2Span.start, e.e2Span.end)).orNull)
      }
      .toDF("docOrd", "pairOrd", "e1_id", "e2_id", "token_ids", "e1_span", "e2_span")
      .filter(col("token_ids").isNotNull)

    val withIds = Encode.withRelationIds(tokEnc)
    val pools = Encode.pools(withIds, splitSeed)
    Result(
      tokenizedRelations = withIds,
      pools = pools,
      e1Pool = Encode.entityPool(withIds, "e1"),
      e2Pool = Encode.entityPool(withIds, "e2"),
      xDim = xDim,
      eDim = eDim)
  }

  /** Positive sampling (§2.18): seeded, key-derived — take up to maxSize
    * relation ids per pool, ordering by a per-epoch hash (the reference's
    * np.random.choice becomes deterministic). */
  def samplePositives(pools: DataFrame, maxSize: Int, epoch: Int): DataFrame =
    pools
      .withColumn("rid", explode(col("relation_ids")))
      .withColumn("h", xxhash64(col("rid"), lit(epoch)))
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("e1_id"), col("e2_id"))
            .orderBy(col("h"))))
      .filter(col("rn") <= maxSize)
      .drop("h", "rn")

  /** Negative candidates for a pool (§2.19): relations sharing e1 but not
    * e2 (or vice versa) — the reference's set difference becomes
    * array_except over the pre-grouped pools. */
  def negativeCandidates(
      pools: DataFrame,
      e1Pool: DataFrame,
      e2Pool: DataFrame): DataFrame =
    pools
      .join(e1Pool.withColumnRenamed("relation_ids", "e1_rids"), Seq("e1_id"))
      .join(e2Pool.withColumnRenamed("relation_ids", "e2_rids"), Seq("e2_id"))
      .withColumn("neg_e1_not_e2", array_except(col("e1_rids"), col("e2_rids")))
      .withColumn("neg_e2_not_e1", array_except(col("e2_rids"), col("e1_rids")))
      .drop("e1_rids", "e2_rids")
}
