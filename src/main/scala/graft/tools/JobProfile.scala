package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-time attribution for ONE battery query (guide §1/§7
  * without the disabled UI): runs the query under the battery protocol
  * (warm session, q12 warmup, cache cleared) with a listener recording
  * every job's description, start and end, then prints the job timeline
  * plus the DRIVER GAPS between consecutive jobs — which is where eager
  * probe/collect constants and plan-time hide. Measurement surface only.
  *
  * Usage: JobProfile <queryName> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.get(32, "jobprofile")
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q12_lang_profile")(spark, sfDir).count()
    spark.catalog.clearCache()

    final case class J(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.callSite.short"))).getOrElse("")
        jobs.put(js.jobId, J(js.jobId, desc, js.time, 0L))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    }

    (1 to reps).foreach { rep =>
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val t0ms = System.currentTimeMillis()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain job-end events
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()

      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      println(f"== $name rep $rep: wall $wall%.2f s, ${js.size} jobs")
      var prevEnd = t0ms
      var jobSum = 0.0
      var gapSum = 0.0
      js.foreach { j =>
        val gap = (j.start - prevEnd) / 1e3
        val dur = (math.max(j.end, j.start) - j.start) / 1e3
        jobSum += dur
        gapSum += math.max(gap, 0)
        println(f"  [gap ${math.max(gap, 0)}%6.3f] job ${j.id}%3d $dur%7.3f s  ${j.desc.take(70)}")
        prevEnd = math.max(j.end, prevEnd)
      }
      val tail = (t0ms + (wall * 1000).toLong - prevEnd) / 1e3
      println(f"  [tail gap ${math.max(tail, 0)}%.3f]  jobs $jobSum%.2f s, driver gaps $gapSum%.2f s")
    }
    spark.stop()
  }
}
