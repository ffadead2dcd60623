package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Param-tuning probe: recall@5 of lshTopK / ivfTopK vs exact top-k on the
  * driver's embeddings table (weak-similarity regime — top-5 neighbor
  * cosine ~0.24-0.4 — which is the hard case for ANN). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 32)
    val exact = Similarity.bruteForceTopK(q, e, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(s).size.toDouble / exact.size
    }

    for (probeDist <- Seq(1, 2); tables <- Seq(8, 12)) {
      val t0 = System.nanoTime()
      val r = recall(Similarity.lshTopK(spark, q, e, 5, tables = tables, probeDist = probeDist))
      println(f"lsh probeDist=$probeDist tables=$tables recall=$r%.3f  ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    for (nProbe <- Seq(8, 16, 24, 32)) {
      val t0 = System.nanoTime()
      val r = recall(Similarity.ivfTopK(spark, q, e, 5, nLists = 64, nProbe = nProbe))
      println(f"ivf nLists=64 nProbe=$nProbe recall=$r%.3f  ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
