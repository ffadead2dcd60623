package graft.tools

/** Battery-protocol timing for a query subset: one warm JVM/session at
  * local[32], q12 warmup, then each named query timed twice with cache
  * clearing between reps (exactly graft.Bench's battery loop) — for
  * isolating whether a slow driver-bench sample is the query or the
  * hypervisor window it ran in. Usage: TimeQueries <sfDir> <name> [name…] */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val s = graft.GraftSession.get(32, "timeq")
    s.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q12_lang_profile")(s, sfDir).count()
    names.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(s, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache()
        sec
      }
      println(f"TIMEQ $n best=${times.min}%.2f reps=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    s.stop()
  }
}
