package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.link.{ConnectedComponents, EntityLinker, MinHashLSH}

class LinkSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("link-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("minhash estimates track exact jaccard") {
    val a = MinHashLSH.shingles("acme corporation", 3)
    val b = MinHashLSH.shingles("acme corp", 3)
    val c = MinHashLSH.shingles("the weather in lima", 3)
    val est = MinHashLSH.estJaccard(
      MinHashLSH.signature(a, 128), MinHashLSH.signature(b, 128))
    val exact = MinHashLSH.exactJaccard(a, b)
    assert(math.abs(est - exact) < 0.2)
    assert(MinHashLSH.exactJaccard(a, c) < 0.1)
  }

  test("LSH blocking finds near-duplicate surfaces and skips distant ones") {
    import spark.implicits._
    val entities = Seq(
      (0L, "acme corporation"),
      (1L, "acme corporatio"), // near-dup
      (2L, "globex incorporated"),
      (3L, "globex incorporate"), // near-dup
      (4L, "stark industries"),
      (5L, "the weather in lima")
    ).toDF("e_id", "e_text")
    val pairs = MinHashLSH
      .similarPairs(spark, entities, "e_id", "e_text", threshold = 0.6)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("connected components: min-label over chains and stars") {
    import spark.implicits._
    // chain 1-2-3-4, star 10-(11,12,13), isolated edge 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L)).toDF("src", "dst")
    val comps = ConnectedComponents.run(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(comps(_) == 10L))
    assert(comps(20L) == 20L && comps(21L) == 20L)
  }

  test("canonicalization picks lowest-id surface per cluster, keeps singletons") {
    import spark.implicits._
    val eDim = Seq(
      (0L, "acme corporation"),
      (1L, "acme corporatio"),
      (2L, "stark industries")
    ).toDF("e_id", "e_text")
    val linked = EntityLinker.canonicalize(spark, eDim, threshold = 0.6)
      .orderBy("e_id")
      .collect()
    assert(linked.length == 3)
    assert(linked(0).getAs[String]("canon_text") == "acme corporation")
    assert(linked(1).getAs[String]("canon_text") == "acme corporation")
    assert(linked(2).getAs[String]("canon_text") == "stark industries")
  }
}
