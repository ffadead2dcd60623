package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits: the properties that make these queries survive a
  * 100x scale-up, asserted against the actual optimized plans.
  *
  *  - no partition-less ranking window anywhere in the battery (the
  *    round-1 scale-killer: `WindowExec: No Partition Defined` moves every
  *    row through one task)
  *  - filters and projections reach the parquet scan (PushedFilters /
  *    pruned ReadSchema)
  *  - small dimension joins broadcast instead of shuffling the fact side
  *  - the flagship pipeline stays a single narrow stage (no Exchange)
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("plan-audit")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no query plans a partition-less ranking window") {
    // every Window operator must declare a partitioning; an empty
    // partition spec prints as "windowspecdefinition(<sort>" with no
    // leading partition expressions
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      // the KG/MTB builders spin up real pipelines; plan-only is enough
      val p =
        try plan(name)
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val bad = p.linesIterator.exists { l =>
        l.contains("Window ") && l.contains("windowspecdefinition(") &&
          // a partitioned window prints partition exprs before the sort
          // order inside the spec; partition-less specs start with the
          // order column list directly followed by ASC/DESC marker count
          l.contains("windowspecdefinition(") && {
            val spec = l.substring(l.indexOf("windowspecdefinition(") + "windowspecdefinition(".length)
            // heuristic: partition-less spec has its first comma-separated
            // token already carrying the sort direction
            spec.split(",").headOption.exists(t => t.contains("ASC") || t.contains("DESC"))
          }
      }
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"partition-less windows in: $offenders")
  }

  test("filter and projection push into the parquet scan (q25 query side)") {
    val p = plan("q25_ann_topk")
    assert(p.contains("LessThan(vec_id,32)") && p.contains("PushedFilters"),
      s"vec_id<32 not pushed:\n${p.take(2000)}")
  }

  test("column pruning reaches the scan (q11 reads only doc_id, text)") {
    val p = plan("q11_token_counts")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("lang") && !scanLine.contains("source"),
      s"scan reads unneeded columns: $scanLine")
  }

  test("dimension joins broadcast (q02 supplier/nation)") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), "dims not broadcast")
    assert(!p.contains("SortMergeJoin"), "dim join fell back to sort-merge")
  }

  test("flagship triples pipeline is a single narrow stage (no Exchange)") {
    val p = SparkEntry.kgTriples(spark, 64, canonical = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"flagship pipeline shuffles:\n${p.take(2000)}")
  }

  test("relational aggregates keep partial (map-side) aggregation") {
    val p = plan("q01_pricing_summary")
    // partial + final HashAggregate pairs around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("q26 LSH bucket exchanges never carry a vector column") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.types.ArrayType

    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        // inputPlan predates EnsureRequirements (no exchanges yet);
        // executedPlan is the current physical plan with them inserted
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    // the edge stage runs eagerly inside ConnectedComponents, so audit it
    // directly rather than the final (post-CC) join plan; disable broadcast
    // so the bucket join plans as the shuffle it would be at scale
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try graft.ops.Dedup
        .embeddingEdges(spark, base, threshold = 0.95, nBits = 8, tables = 8)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val bucketShuffles = allNodes(plan)
      .collect { case e: ShuffleExchangeExec => e }
      .filter(_.outputPartitioning match {
        case h: HashPartitioning => h.expressions.exists(_.toString.contains("sig"))
        case _ => false
      })
    assert(bucketShuffles.nonEmpty,
      s"expected an LSH bucket-join exchange on sig; nodes: ${allNodes(plan).map(_.getClass.getSimpleName).distinct}")
    bucketShuffles.foreach { e =>
      val arrays = e.child.schema.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"vector column rides the bucket-join shuffle: ${arrays.map(_.name)}")
    }
  }
}
