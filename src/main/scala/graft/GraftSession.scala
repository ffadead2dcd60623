package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults every entry point shares.
  *
  * local[N] stands in for an N-executor cluster (see BASELINE.md): shuffle
  * partitions track core count instead of the default 200, AQE is on so
  * skewed stages re-plan at runtime, and broadcast joins stay enabled for
  * the dimension tables (vocab, label maps, entity dictionaries).
  */
object GraftSession {

  def builder(cores: Int, app: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // local mode shares one JVM between driver and executor: a long
      // stop-the-world pause (a full GC of a large fixed heap on this
      // slow-paging microVM can exceed 2 min) must not trip the 120 s
      // default heartbeat timeout — HeartbeatReceiver would remove the
      // only executor, local mode cannot re-register it (no
      // CoarseGrainedScheduler endpoint), and the session dies after 60
      // failed heartbeats. On a real cluster these would stay at their
      // defaults; here a stall is survivable by construction.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "20s")

  def get(cores: Int, app: String = "graft"): SparkSession = {
    val spark = builder(cores, app).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft defaults onto an externally created session (tests). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
