package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.link.{ConnectedComponents, MinHashLSH}

/** Deduplication operators for training-data curation at corpus scale.
  *
  * - exact: one hash-aggregate over the normalized text (partial+final
  *   combine; the canonical id is min(doc_id) so output is deterministic)
  * - minhash: shingle → signature → banded LSH → verified edges →
  *   connected components → cluster representative (scales linearly; the
  *   hot-bucket cap in MinHashLSH bounds worst-case skew)
  * - simhash: 64-bit near-dup signature, hamming-bucket join
  * - ngram-jaccard: exact verification operator for candidate pairs
  */
object Dedup {

  /** Exact dedup: (doc_id, canonical_id, dup_count). canonical = min id of
    * identical text. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = docs
      .groupBy(col(textCol))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))
    docs
      .join(canon, Seq(textCol))
      .select(col(idCol), col("canonical_id"), col("dup_count"))
  }

  /** Near-dup clusters via MinHash/LSH + connected components:
    * (doc_id, cluster_id). Singletons map to themselves. */
  def minhashClusters(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 48,
      bands: Int = 16): DataFrame = {
    val edges = MinHashLSH
      .similarPairs(spark, docs.select(col(idCol), col(textCol)), idCol, textCol,
        numHashes = numHashes, bands = bands, threshold = threshold,
        shingleMode = "word")
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = ConnectedComponents.run(spark, edges)
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .join(comps.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component"), col("doc_id")))
      .select("doc_id", "cluster_id")
  }

  /** 64-bit SimHash over whitespace tokens (weight 1 per token). */
  def simhash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = MinHashLSH.hash64(t, 0x51_7cc1b727220a95L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhashDF(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, simhash(graft.textnorm.PyText.pySplit(text).toSeq))
      })
      .toDF(idCol, "simhash")
  }

  /** Exact word-set Jaccard between two token arrays as a Column expr. */
  def jaccardCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0d, 1d).otherwise(inter / uni)
  }
}
