package graft.fewrel

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kernel.PairScoring
import graft.tokenize.BertTokenizer

/** FewRel N-way K-shot support (SURVEY.md §2.34 source + §2.26 episode NN).
  *
  * Source semantics ported from `preprocessing_funcs.py:134-235`:
  *   - drop one-to-many entity mappings (|h_pos| != 1)
  *   - positions must be contiguous runs (validation, reference asserts)
  *   - drop pairs not separated by at least one token (overlap test)
  *   - lowercase tokens (reference default do_lower_case=True)
  *   - insert [E1]/[/E1]/[E2]/[/E2] by token index, h/t order preserved
  *
  * Episode evaluation ported from `infer.py:382-417`: embed each episode
  * row, dot the query (last row) against the supports, hit when the argmax
  * equals the query's relation slot. Random sampling becomes seeded
  * key-derived selection (SURVEY.md §1 determinism note).
  */
object FewRel {

  final case class Example(
      relation: String,
      tokens: Seq[String],
      hStart: Int,
      hEnd: Int, // exclusive
      tStart: Int,
      tEnd: Int)

  private val posSchema = ArrayType(ArrayType(IntegerType))

  /** Distributed JSON source. FewRel files are one object keyed by relation
    * id; relation keys become columns after spark.read.json, which we melt
    * back into rows (driver touches only the schema, never the data). The
    * heterogeneous `h`/`t` arrays arrive stringified; positions re-parse
    * with from_json. */
  def read(spark: SparkSession, path: String): Dataset[Example] = {
    import spark.implicits._
    val raw = spark.read.option("multiLine", "true").json(path)
    val relCols = raw.columns.sorted
    // melt relation columns -> rows with ONE stack projection (the former
    // per-relation unionAll fold built an O(#relations) driver-side plan)
    val stackArgs = relCols
      .map(rel => s"'${rel.replace("'", "''")}', `$rel`")
      .mkString(", ")
    val melted = raw
      .select(expr(s"stack(${relCols.length}, $stackArgs) AS (relation, exs)"))
      .select(col("relation"), explode(col("exs")).as("ex"))
      .select(
        col("relation"),
        col("ex.tokens").as("tokens"),
        // heterogeneous JSON arrays arrive as array<string>; the last
        // element is the stringified positions array "[[i,j,...]]"
        element_at(col("ex.h"), -1).as("h_json"),
        element_at(col("ex.t"), -1).as("t_json"))
    melted
      .withColumn("h_pos", from_json(col("h_json"), posSchema))
      .withColumn("t_pos", from_json(col("t_json"), posSchema))
      .as[(String, Seq[String], String, String, Seq[Seq[Int]], Seq[Seq[Int]])]
      .flatMap { case (rel, tokens, _, _, hPos, tPos) =>
        validate(rel, tokens, hPos, tPos)
      }
  }

  /** The reference's per-example validation + span normalization. */
  def validate(
      rel: String,
      tokens: Seq[String],
      hPosRaw: Seq[Seq[Int]],
      tPosRaw: Seq[Seq[Int]]): Option[Example] = {
    if (hPosRaw == null || tPosRaw == null) return None
    if (hPosRaw.length != 1 || tPosRaw.length != 1) return None // one-to-many
    val h = hPosRaw.head
    val t = tPosRaw.head
    def contiguous(p: Seq[Int]): Boolean = p == (p.min to p.max)
    if (!contiguous(h) || !contiguous(t)) return None // reference asserts
    val (h0, h1) = (h.head, h.last + 1)
    val (t0, t1) = (t.head, t.last + 1)
    // reference overlap test (note it compares the EXCLUSIVE ends)
    if ((t0 <= h1 && h1 <= t1) || (h0 <= t1 && t1 <= h1)) return None
    Some(Example(rel, tokens.map(_.toLowerCase(java.util.Locale.ROOT)), h0, h1, t0, t1))
  }

  /** Marker insertion by token index (`preprocessing_funcs.py:185-208`). */
  def insertMarkers(ex: Example): Seq[String] = {
    val ts = ex.tokens
    val out =
      if (ex.hEnd < ex.tStart)
        ts.slice(0, ex.hStart) ++ Seq("[E1]") ++ ts.slice(ex.hStart, ex.hEnd) ++
          Seq("[/E1]") ++ ts.slice(ex.hEnd, ex.tStart) ++ Seq("[E2]") ++
          ts.slice(ex.tStart, ex.tEnd) ++ Seq("[/E2]") ++ ts.slice(ex.tEnd, ts.length)
      else
        ts.slice(0, ex.tStart) ++ Seq("[E2]") ++ ts.slice(ex.tStart, ex.tEnd) ++
          Seq("[/E2]") ++ ts.slice(ex.tEnd, ex.hStart) ++ Seq("[E1]") ++
          ts.slice(ex.hStart, ex.hEnd) ++ Seq("[/E1]") ++ ts.slice(ex.hEnd, ts.length)
    require(out.length == ts.length + 4, "marker insertion must add 4 tokens")
    out
  }

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** N-way K-shot episode accuracy with the stub pair-embedding head.
    * Episodes derive deterministically from (example index, seed); the
    * query always sits in the target relation's slot (reference geometry:
    * target_idx = N-1, matrix row -1 vs the rest). */
  def episodeAccuracy(
      spark: SparkSession,
      examples: Dataset[Example],
      tokenizer: Broadcast[BertTokenizer],
      nWay: Int = 5,
      kShot: Int = 1,
      seed: Long = 42L,
      dim: Int = 64): Double = {
    import spark.implicits._
    // the labeled support set is a dimension table (FewRel: ~56k rows max);
    // broadcast it, fan the EPISODES out across executors. collect() order
    // depends on partitioning, so impose a total order first — episode i
    // must name the same query example under any parallelism (the q56
    // oracle pins the accuracy)
    val all = examples.collect()
      .sortBy(ex => (ex.relation, ex.tokens.mkString(" "), ex.hStart, ex.tStart, ex.hEnd, ex.tEnd))
    require(all.nonEmpty, "no valid FewRel examples")
    val bcAll = spark.sparkContext.broadcast(all)

    val hits = spark
      .range(all.length)
      .mapPartitions { idxs =>
        val pool = bcAll.value
        val byRel = pool.groupBy(_.relation)
        val relations = byRel.keys.toSeq.sorted
        val tok = tokenizer.value
        def embed(ex: Example): Array[Float] =
          PairScoring.stubEmbedding(
            tok.convertTokensToIds(
              "[CLS]" +: tok.tokenize(insertMarkers(ex).mkString(" ")) :+ "[SEP]"),
            dim)
        idxs.map { iL =>
          val i = iL.toInt
          val query = pool(i)
          val others = relations.filterNot(_ == query.relation)
          val sampledRels = (0 until nWay - 1)
            .map(s => others(math.floorMod(mix(seed + i * 31L + s), others.length).toInt))
            .distinct ++ Seq(query.relation)
          val supports = sampledRels.flatMap { r =>
            val candidates = byRel(r).filterNot(_ == query)
            if (candidates.isEmpty) Seq.empty
            else (0 until kShot).map(k =>
              candidates(math.floorMod(mix(seed + i * 131L + k), candidates.length).toInt))
          }
          if (supports.isEmpty || !supports.exists(_.relation == query.relation)) 0L
          else {
            val qv = embed(query)
            val scores = supports.map { s =>
              val sv = embed(s)
              var d = 0.0; var j = 0
              while (j < dim) { d += sv(j) * qv(j); j += 1 }
              d
            }
            if (supports(scores.indexOf(scores.max)).relation == query.relation) 1L
            else 0L
          }
        }
      }
      .reduce(_ + _)
    hits.toDouble / all.length
  }
}
