package graft.tools
import org.apache.spark.sql.functions._
object ProbeMerge {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8, "probe-merge")
    spark.sparkContext.setLogLevel("ERROR")
    val raw = graft.SparkEntry.kgTriples(spark, 512, canonical = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    raw.count()
    val eDim = raw.select(col("subj").as("e_text"))
      .unionAll(raw.select(col("obj").as("e_text"))).distinct()
      .withColumn("e_id", xxhash64(col("e_text")))
    for (thr <- Seq(0.7, 0.5, 0.35, 0.25)) {
      val linked = graft.link.EntityLinker.canonicalize(spark, eDim, threshold = thr)
      val relabeled = linked.filter(col("e_text") =!= col("canon_text")).count()
      println(s"[merge] threshold=$thr relabeled_surfaces=$relabeled of ${linked.count()}")
    }
    spark.stop()
  }
}
