package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph materialization over the triple stream (north rule: "triple
  * extraction, entity linking, canonicalization, graph materialize"):
  * the KG as queryable node/edge tables rather than raw triples.
  *
  *  - edges: (src_id, dst_id, pred, weight) — weight = support count over
  *    the corpus; one hash aggregation on (subj, pred, obj)
  *  - nodes: (e_id, surface, out_degree, in_degree, degree) — built from
  *    the aggregated edge table (dimension-sized), never from raw triples
  *
  * Ids are xxhash64 of the (canonicalized) surface, so node identity is
  * stable across incremental runs without a global id dictionary — the
  * property that matters at 10^12 documents, where re-ranking a dense id
  * space per batch is not an option. */
object KgGraph {

  final case class Materialized(nodes: DataFrame, edges: DataFrame)

  def materialize(triples: DataFrame): Materialized = {
    val edges = triples
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(count(lit(1)).as("weight"))
      .withColumn("src_id", xxhash64(col("subj")))
      .withColumn("dst_id", xxhash64(col("obj")))
      .select("src_id", "dst_id", "pred", "weight", "subj", "obj")

    val out = edges.groupBy(col("subj").as("surface"))
      .agg(sum(col("weight")).as("out_degree"))
    val in = edges.groupBy(col("obj").as("surface"))
      .agg(sum(col("weight")).as("in_degree"))
    val nodes = out
      .join(in, Seq("surface"), "full_outer")
      .na.fill(0L, Seq("out_degree", "in_degree"))
      .withColumn("e_id", xxhash64(col("surface")))
      .withColumn("degree", col("out_degree") + col("in_degree"))
      .select("e_id", "surface", "out_degree", "in_degree", "degree")
    Materialized(nodes, edges.drop("subj", "obj"))
  }

  /** Partitioned write for both tables (same Iceberg-seam convention as
    * TripleSink). */
  def write(m: Materialized, path: String): Unit = {
    m.nodes.write.mode("overwrite").parquet(s"$path/nodes")
    m.edges.write.mode("overwrite").parquet(s"$path/edges")
  }
}
