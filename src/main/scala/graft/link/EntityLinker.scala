package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity canonicalization: MinHash/LSH blocking → similarity edges →
  * connected components → canonical id/surface per cluster (north_star
  * "entity linking with MinHash/LSH candidate blocking plus
  * canonicalization via connected-components over the mention graph").
  *
  * Canonical surface = the surface of the lowest first-appearance id in the
  * cluster, so output is deterministic (never depends on partitioning). */
object EntityLinker {

  /** @param eDim entity dimension (e_id: long, e_text: string)
    * @return (e_id, e_text, canon_id, canon_text) */
  def canonicalize(
      spark: SparkSession,
      eDimIn: DataFrame,
      threshold: Double = 0.7,
      numHashes: Int = 48,
      bands: Int = 16): DataFrame = {
    // five consumers (LSH sigs + two text joins + comp join + canon agg);
    // the dim is dimension-sized by construction, persist it
    val eDim = eDimIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = MinHashLSH
      .similarPairs(spark, eDim, "e_id", "e_text",
        numHashes = numHashes, bands = bands, threshold = threshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))

    val comps = ConnectedComponents.run(spark, edges)

    // entities untouched by any edge are their own canonical form
    val withComp = eDim
      .join(comps.withColumnRenamed("node", "e_id"), Seq("e_id"), "left")
      .withColumn("component", coalesce(col("component"), col("e_id")))

    val canonSurface = withComp
      .groupBy(col("component"))
      .agg(min(struct(col("e_id"), col("e_text"))).as("c"))
      .select(
        col("component"),
        col("c.e_id").as("canon_id"),
        col("c.e_text").as("canon_text"))

    withComp
      .join(canonSurface, Seq("component"))
      .select(col("e_id"), col("e_text"), col("canon_id"), col("canon_text"))
  }

  /** Rewrite triples to canonical entity surfaces. */
  def canonicalizeTriples(
      triples: DataFrame,
      linked: DataFrame): DataFrame = {
    val bySurface = linked.select(col("e_text"), col("canon_text")).distinct()
    triples
      .join(bySurface.withColumnRenamed("e_text", "subj"), Seq("subj"), "left")
      .withColumn("subj_c", coalesce(col("canon_text"), col("subj")))
      .drop("canon_text")
      .join(bySurface.withColumnRenamed("e_text", "obj"), Seq("obj"), "left")
      .withColumn("obj_c", coalesce(col("canon_text"), col("obj")))
      .select(
        col("subj_c").as("subj"),
        col("pred"),
        col("obj_c").as("obj"),
        col("url"))
  }
}
