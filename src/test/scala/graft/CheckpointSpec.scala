package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.io.CheckpointManager

/** F5 resume semantics: kill-after-stage-k equivalent — a fresh manager over
  * the same root must reuse completed stages (no recompute) and produce
  * identical final output. */
class CheckpointSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ckpt-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stages are computed once, resumed from disk, with lineage rows") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt").toString
    var computes = 0

    def runPipeline(mgr: CheckpointManager): Array[Long] = {
      val s1 = mgr.stage("numbers") {
        computes += 1
        spark.range(100).toDF("n")
      }
      val s2 = mgr.stage("evens") {
        computes += 1
        s1.filter($"n" % 2 === 0)
      }
      s2.as[Long].collect().sorted
    }

    val m1 = new CheckpointManager(spark, root, "run1")
    val out1 = runPipeline(m1)
    assert(computes == 2)
    assert(out1.length == 50)

    // simulate a crash + restart: new manager, same root
    val m2 = new CheckpointManager(spark, root, "run2")
    val out2 = runPipeline(m2)
    assert(computes == 2, "completed stages must not recompute on resume")
    assert(out2.sameElements(out1), "resumed output must be identical")

    // per-partition lineage exists for both stages
    val metrics = m2.metrics
    val stages = metrics.select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("numbers", "evens"))
    val rowsOut = metrics
      .groupBy("stage").sum("rows_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rowsOut("numbers") == 100L && rowsOut("evens") == 50L)

    // invalidate a mid stage: only that stage recomputes
    m2.invalidate("evens")
    val out3 = runPipeline(new CheckpointManager(spark, root, "run3"))
    assert(computes == 3)
    assert(out3.sameElements(out1))
  }
}
