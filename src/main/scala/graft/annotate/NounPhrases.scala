package graft.annotate

import scala.collection.mutable.ArrayBuffer

/** Rule-based noun-phrase mention detector — the open-web-recall stand-in
  * for the reference's spaCy `noun_chunks` (`mtb_data_loader.py:514-522`)
  * and `infer.py:123-133` NER: a page whose entities are outside the
  * gazetteer still yields mentions.
  *
  * Two deterministic rules (SURVEY.md §7.5 divergence note: spaCy chunks
  * come from a statistical parser; these are position/regex rules chosen to
  * be exactly ANSI-SQL-mirrorable so the operator is oracle-checkable):
  *
  *  1. capitalized-sequence: maximal runs of tokens matching
  *     `[A-Z][A-Za-z0-9]*` — proper-noun chains ("New York Times");
  *  2. determiner-phrase: after `the|a|an`, the run (length 1..maxLen) of
  *     lowercase word-like tokens that are neither stopwords nor
  *     determiners — common-noun heads ("the execution engine").
  *
  * Candidates are deduped per document by surface text, first occurrence
  * (by position, 'cap' before 'det' on ties) wins — the same
  * first-appearance discipline as Annotator.annotate. */
object NounPhrases {

  val Determiners: Set[String] = Set("the", "a", "an")

  private def isCap(t: String): Boolean =
    t.nonEmpty && t.head >= 'A' && t.head <= 'Z' &&
      t.forall(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))

  private def isLowerWord(t: String): Boolean =
    t.nonEmpty &&
      t.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))

  /** All candidates with 0-based positions, deduped first-occurrence per
    * surface: (mention, pos, rule). */
  def candidates(toksIn: Seq[String], maxLen: Int = 3): Seq[(String, Int, String)] = {
    val toks = toksIn.toIndexedSeq
    val stops = graft.ops.TextStats.Stopwords.toSet
    val out = ArrayBuffer.empty[(String, Int, String)]

    var i = 0
    while (i < toks.length) {
      if (isCap(toks(i)) && (i == 0 || !isCap(toks(i - 1)))) {
        var j = i
        while (j < toks.length && isCap(toks(j))) j += 1
        out += ((toks.slice(i, j).mkString(" "), i, "cap"))
        i = j
      } else i += 1
    }

    var p = 0
    while (p < toks.length) {
      if (Determiners(toks(p))) {
        var j = p + 1
        while (j < toks.length && j <= p + maxLen &&
          isLowerWord(toks(j)) && !stops.contains(toks(j)) && !Determiners(toks(j))) j += 1
        if (j > p + 1) out += ((toks.slice(p + 1, j).mkString(" "), p + 1, "det"))
      }
      p += 1
    }

    // first occurrence per surface wins: order by (pos, rule) — 'cap'
    // sorts before 'det', matching the SQL mirror's row_number tiebreak
    val seen = scala.collection.mutable.HashSet.empty[String]
    out.sortBy(c => (c._2, c._3)).filter(c => seen.add(c._1)).toSeq
  }
}
