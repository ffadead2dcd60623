package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.annotate.{Annotator, Gazetteer}

/** KG-construction operators exposed over generic document tables (the
  * driver's `documents` parquet): mention detection, banded pair windows,
  * first-appearance dictionary encoding, co-occurrence graph + components.
  * These are the same engine stages the page pipeline uses, parameterized
  * by an arbitrary gazetteer. */
object KgOps {

  /** Default gazetteer for the TPC-H-ish synthetic documents vocabulary. */
  val DocGazetteer: Seq[String] = Seq(
    "spark", "table", "join", "merge", "window", "stream", "vector",
    "customer", "query", "batch")

  /** First-occurrence mention positions per document: (doc_id, mention,
    * pos). Runs the real Annotator (gazetteer match + dedupe-first-wins)
    * as one narrow flatMap. */
  def mentions(
      spark: SparkSession,
      docs: DataFrame,
      surfaces: Seq[String] = DocGazetteer): DataFrame = {
    import spark.implicits._
    val gaz = spark.sparkContext.broadcast(new Gazetteer(surfaces))
    docs
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Annotator.annotate(id.toString, text, gaz.value).mentions.map { m =>
          (id, m.text, m.start)
        }
      }
      .toDF("doc_id", "mention", "pos")
  }

  /** Banded pair counts: ordered mention pairs with 1 <= gap <= window —
    * the row-local theta self-join (§2.8's band predicate) aggregated per
    * doc: (doc_id, n_pairs). */
  def bandPairCounts(mentionsDf: DataFrame, window: Int = 40): DataFrame = {
    val a = mentionsDf.select(col("doc_id"), col("mention").as("m1"), col("pos").as("p1"))
    val b = mentionsDf.select(col("doc_id"), col("mention").as("m2"), col("pos").as("p2"))
    a.join(b, Seq("doc_id"))
      .filter(col("p2") - col("p1") >= 1 && col("p2") - col("p1") <= window)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Banded mention pairs with surfaces (for frequency/graph stages). */
  def bandPairs(mentionsDf: DataFrame, window: Int = 40): DataFrame = {
    val a = mentionsDf.select(col("doc_id"), col("mention").as("m1"), col("pos").as("p1"))
    val b = mentionsDf.select(col("doc_id"), col("mention").as("m2"), col("pos").as("p2"))
    a.join(b, Seq("doc_id"))
      .filter(col("p2") - col("p1") >= 1 && col("p2") - col("p1") <= window)
      .select(col("doc_id"), col("m1"), col("m2"))
  }

  /** First-appearance dense ids for mention surfaces: (mention, e_id) —
    * the §2.9 dictionary-encode over an arbitrary mention table. */
  def dictEncode(mentionsDf: DataFrame): DataFrame =
    mentionsDf
      .groupBy("mention")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first_seen"))
      .withColumn(
        "e_id",
        row_number().over(Window.orderBy(col("first_seen"))).cast("long") - 1)
      .select("mention", "e_id")

  /** Pair frequencies with min-support filter (§2.10). */
  def pairFreq(pairs: DataFrame, minCount: Long): DataFrame =
    pairs
      .groupBy("m1", "m2")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Mention co-occurrence graph → connected components over mention ids:
    * (e_id, component). */
  def mentionComponents(
      spark: SparkSession,
      mentionsDf: DataFrame,
      window: Int = 40,
      minCount: Long = 1): DataFrame = {
    val dict = dictEncode(mentionsDf)
    val freq = pairFreq(bandPairs(mentionsDf, window), minCount)
    val edges = freq
      .join(dict.withColumnRenamed("mention", "m1").withColumnRenamed("e_id", "src"), Seq("m1"))
      .join(dict.withColumnRenamed("mention", "m2").withColumnRenamed("e_id", "dst"), Seq("m2"))
      .select("src", "dst")
    val comps = graft.link.ConnectedComponents.run(spark, edges)
    dict
      .join(comps.withColumnRenamed("node", "e_id"), Seq("e_id"), "left")
      .withColumn("component", coalesce(col("component"), col("e_id")))
      .select("e_id", "component")
  }
}
