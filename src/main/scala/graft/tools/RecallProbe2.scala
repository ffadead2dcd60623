package graft.tools
import org.apache.spark.sql.functions._
import graft.ops.Similarity
/** Round-4 probe: IVF recall with trained vs sampled centroids, isotropic
  * (sf embeddings) and clustered fixtures. */
object RecallProbe2 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.get(8, "recall-probe2")
    s.sparkContext.setLogLevel("ERROR")
    def rec(exact: org.apache.spark.sql.DataFrame, approx: org.apache.spark.sql.DataFrame): Double = {
      val nEx = exact.count().toDouble
      approx.select(col("query_id"), col("neighbor_id"))
        .join(exact.select(col("query_id"), col("neighbor_id")), Seq("query_id", "neighbor_id"), "left_semi")
        .count() / nEx
    }
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = s.read.parquet(sf + "/embeddings.parquet")
      val q = e.filter(col("vec_id") < 32)
      val exact = Similarity.bruteForceTopK(q, e, 5).persist()
      exact.count()
      for (it <- Seq(0, 8)) {
        val r = rec(exact, Similarity.ivfTopK(s, q, e, 5, trainIters = it))
        println(f"[probe] sf=$sf iters=$it isotropic_recall=$r%.3f")
      }
      exact.unpersist()
    }
    val cv = graft.fixtures.ClusteredVecs.generate(s, 1024, 32, 32).persist()
    cv.count()
    val cq = cv.filter(col("vec_id") < 32)
    val cExact = Similarity.bruteForceTopK(cq, cv, 5).persist()
    cExact.count()
    for (it <- Seq(0, 8); np <- Seq(2, 4, 8)) {
      val r = rec(cExact, Similarity.ivfTopK(s, cq, cv, 5, nLists = 32, nProbe = np, trainIters = it))
      println(f"[probe] clustered iters=$it nProbe=$np recall=$r%.3f")
    }
    s.stop()
  }
}
