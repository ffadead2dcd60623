package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subject/verb/object pair generation — the engine's deterministic
  * stand-in for the reference's dependency-parse pair source
  * (`src/tasks/infer.py:135-170`, duplicated at `src/misc.py:26-55`),
  * which takes the sentence root's `nsubj`/`nsubjpass` child as subject
  * and its `dobj`/`attr`/`prep`/`ccomp` children as objects, then emits
  * ordered permutations of [subject] + objects.
  *
  * No dependency parser ships in this environment (SURVEY.md §7.5 — same
  * rationale as the gazetteer annotator replacing spaCy NER), so the root
  * verb and its arguments are approximated with a closed public verb
  * lexicon and linear word order:
  *
  *   - root  := first token in the verb lexicon
  *   - subject := LAST alphabetic non-stopword token before the root
  *     (mirrors the reference's `[a-z]+` subject filter)
  *   - objects := first `maxObjs` non-stopword non-verb tokens after the
  *     root
  *   - pairs := ordered permutations of [subject] + objects, exactly the
  *     reference's `permutations(..., 2)` enumeration order
  *
  * The heuristic is deliberately expressible in ANSI SQL so the operator
  * stays oracle-checkable; swap the lexicon step for a real parser UDF to
  * recover full dep-parse semantics with the identical pair plumbing.
  */
object SvoPairs {

  /** Small public English verb lexicon: common finite forms plus the
    * verb-like words of the synthetic documents vocabulary (merge, join,
    * sort, ... — imperative data-operation verbs). */
  val Verbs: Seq[String] = Seq(
    "is", "was", "are", "were", "has", "have", "had", "makes", "made",
    "uses", "used", "builds", "built", "runs", "ran", "sends", "sent",
    "founded", "acquired", "visited", "met", "created", "designed",
    "developed", "launched", "produced", "powers", "drives", "controls",
    "connects", "merge", "join", "sort", "filter", "scan", "group",
    "hash", "stream", "order")

  def pairs(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxObjs: Int = 3): DataFrame = {
    import spark.implicits._
    val verbSet = Verbs.toSet
    val stopSet = TextStats.Stopwords.toSet
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = graft.textnorm.PyText.pySplit(text)
        val vi = toks.indexWhere(verbSet.contains)
        if (vi < 0) Iterator.empty
        else {
          val subj = toks.take(vi).lastIndexWhere(t =>
            !stopSet.contains(t) && t.exists(c => c >= 'a' && c <= 'z'))
          if (subj < 0) Iterator.empty
          else {
            val objs = (vi + 1 until toks.length).iterator
              .filter(i => !stopSet.contains(toks(i)) && !verbSet.contains(toks(i)))
              .take(maxObjs)
              .toArray
            val nodes = subj +: objs
            // permutations(nodes, 2) in the reference's enumeration order
            for {
              ai <- nodes.indices.iterator
              bi <- nodes.indices.iterator
              if ai != bi
            } yield (id, ai, bi, toks(nodes(ai)), toks(nodes(bi)))
          }
        }
      }
      .toDF(idCol, "a_idx", "b_idx", "a_tok", "b_tok")
  }
}
