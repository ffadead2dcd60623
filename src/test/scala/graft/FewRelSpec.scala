package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.fewrel.FewRel
import graft.fixtures.FewRelFixture
import graft.tokenize.Vocab

class FewRelSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fewrel-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val fixtureFile = {
    val dir = Files.createTempDirectory("graft_fewrel")
    FewRelFixture.writeTo(dir).toString
  }

  test("JSON source parses, validates and filters like the reference") {
    val parsed = FewRel.read(spark, fixtureFile).collect()
    // the one-to-many and adjacent-entity examples must be dropped
    assert(parsed.length == FewRelFixture.expectedValid)
    assert(parsed.map(_.relation).distinct.sorted.toSeq ==
      FewRelFixture.Relations.sorted)
    parsed.foreach { ex =>
      assert(ex.hEnd <= ex.tStart || ex.tEnd <= ex.hStart, "separated entities")
      assert(ex.tokens.forall(t => t == t.toLowerCase), "lowercased")
    }
  }

  test("marker insertion adds exactly 4 tokens in reference order") {
    val parsed = FewRel.read(spark, fixtureFile).collect()
    parsed.take(20).foreach { ex =>
      val marked = FewRel.insertMarkers(ex)
      assert(marked.length == ex.tokens.length + 4)
      assert(marked.indexOf("[E1]") >= 0 && marked.indexOf("[/E2]") >= 0)
      // entity surfaces preserved between their markers
      val e1 = marked.slice(marked.indexOf("[E1]") + 1, marked.indexOf("[/E1]"))
      assert(e1 == ex.tokens.slice(ex.hStart, ex.hEnd))
    }
  }

  test("validation rejects the reference's filtered shapes") {
    assert(FewRel.validate("r", Seq("a", "b", "c"), Seq(Seq(0), Seq(2)), Seq(Seq(2))).isEmpty)
    assert(FewRel.validate("r", Seq("a", "b", "c"), Seq(Seq(0)), Seq(Seq(1))).isEmpty) // adjacent
    assert(FewRel.validate("r", Seq("a", "b", "c", "d"), Seq(Seq(0)), Seq(Seq(2))).nonEmpty)
    assert(FewRel.validate("r", Seq("a", "b", "c", "d"), Seq(Seq(0, 2)), Seq(Seq(3))).isEmpty) // gap
  }

  test("5-way 1-shot episode accuracy beats chance with the stub head") {
    val examples = FewRel.read(spark, fixtureFile)
    val acc = FewRel.episodeAccuracy(
      spark, examples, spark.sparkContext.broadcast(Vocab.fixtureTokenizer),
      nWay = 5, kShot = 1)
    // distinct entity vocab per example group: the hash-bag embedding should
    // be far above the 1/5 chance floor
    assert(acc > 0.4, s"episode accuracy $acc")
  }
}
