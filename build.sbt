ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bertrelationextractionspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Firecracker microVM: first-touch page faults are very slow (measured
  // ~8 cores of pure kernel time when the GC keeps growing/moving a large
  // heap). Fix: FIXED-size, pre-touched heap — fault every page exactly
  // once at JVM start, then reuse; ParallelGC for batch throughput.
  "-XX:+UseParallelGC",
  "-XX:+AlwaysPreTouch",
  "-XX:-UseAdaptiveSizePolicy",
)
// Heap split: tests keep 12g (pre-touch cost paid on every `sbt test`);
// run/runMain (Bench/Verify mains) default to 48g — the wide scaling
// legs persist two multi-GB tables (statements + tokenized relations at
// 1M pages) and a 20g unified pool spilled ~5 GB per leg, turning the
// 4-core leg superlinear (24 min vs the ~5.5 min linear extrapolation).
// The box has 125 GiB; 48g pre-touches in ~15 s, once per bench JVM.
// (runMain forks through the `run` settings, so one block covers both.)
Test / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
Compile / run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
