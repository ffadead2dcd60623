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

    // one pass: each edge contributes (subj, w, 0) and (obj, 0, w) rows to
    // a single degree aggregate — same totals as the former
    // out-agg/in-agg/full-outer-join shape, without the second aggregate
    // pass over the edges and the full-outer sort-merge join's two sorts
    val nodes = edges
      .select(explode(array(
        struct(col("subj").as("surface"), col("weight").as("out_w"), lit(0L).as("in_w")),
        struct(col("obj").as("surface"), lit(0L).as("out_w"), col("weight").as("in_w"))))
        .as("s"))
      .select(col("s.surface"), col("s.out_w"), col("s.in_w"))
      .groupBy(col("surface"))
      .agg(sum(col("out_w")).as("out_degree"), sum(col("in_w")).as("in_degree"))
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
