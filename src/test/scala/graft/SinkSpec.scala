package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Salting
import graft.schema.Triple
import graft.triples.TripleSink

class SinkSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sink-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("triples round-trip through the partitioned sink") {
    import spark.implicits._
    val triples = Seq(
      Triple("a", "Cause-Effect(e1,e2)", "b", "u1"),
      Triple("c", "Cause-Effect(e1,e2)", "d", "u2"),
      Triple("e", "Other", "f", "u3")).toDS()
    val dir = Files.createTempDirectory("graft_sink").toString + "/triples"
    TripleSink.write(triples, dir, filesPerPred = 2)
    val back = TripleSink.read(spark, dir).collect().toSet
    assert(back == triples.collect().toSet)
    // hive partitioning by predicate is physically present
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("pred_part="))
    assert(parts.length == 2)
  }

  test("salted count equals plain count under hot-key skew") {
    import spark.implicits._
    val rows = (1 to 10000).map(i => (if (i % 5 == 0) "hot" else s"k${i % 97}", i))
    val df = rows.toDF("k", "v")
    val salted = Salting.saltedCount(df, Seq("k"), salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 2000)
  }

  test("salted collect_list gathers identical multisets") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("k" + (i % 3), i.toLong)).toDF("k", "v")
    val salted = Salting.saltedCollectList(df, Seq("k"), "v", salt = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    val plain = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.collect_list("v").as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(salted == plain)
  }
}
