package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Quick scaling probe: times the KG pipeline at each core count in
  * SPARK_GRAFT_CORES (csv, default "4,16") over SPARK_GRAFT_SCALE_PAGES
  * pages. Prints one line per level. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CORES", "4,16")
      .split(",").map(_.trim.toInt)
    val pages = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAGES", "100000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "1").toInt

    cores.foreach { c =>
      val spark = GraftSession.builder(c, s"probe-$c").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      SparkEntry.kgTriples(spark, 2000, canonical = false).count() // warmup
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.kgTriples(spark, pages, canonical = false).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val best = times.map(_._1).min
      println(f"CORES=$c pages=$pages best=${best}%.2fs triples=${times.head._2} rate=${times.head._2 / best}%.0f/s")
      spark.stop()
    }
  }
}
