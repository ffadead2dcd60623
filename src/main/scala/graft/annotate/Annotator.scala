package graft.annotate

import scala.collection.mutable.ArrayBuffer

import graft.schema.{AnnotatedDoc, Mention}

/** Deterministic sentence segmentation + mention detection — the engine's
  * replacement for the reference's spaCy pipe (`mtb_data_loader.py:189-192`,
  * `:514-522`). SURVEY.md §7.5: exact NER parity is neither possible nor
  * required; downstream consumers only need token texts, is_punct,
  * is_sent_end and mention spans, so we produce exactly those columns from
  * two deterministic sources:
  *
  *   - a broadcast gazetteer (greedy longest match, like spaCy's
  *     filter_spans keeping longest non-overlapping spans), standing in for
  *     NER entities, and
  *   - matched spans are merged into single tokens, mirroring the
  *     reference's `retokenizer.merge(span)` so downstream token-window
  *     arithmetic (`_resolve_entities`) sees the same geometry.
  */
final class Gazetteer(
    surfaces: Seq[String],
    kindFn: String => String = graft.fixtures.FixtureVocab.kindOf)
  extends Serializable {
  /** entries tokenized with the same tokenizer the annotator uses;
    * first-token index for O(1) candidate lookup, longest first. */
  val byFirst: Map[String, Seq[Array[String]]] = {
    val tokenized = surfaces.distinct.map(Annotator.tokenizeWords)
    tokenized
      .filter(_.nonEmpty)
      .groupBy(_.head)
      .map { case (k, vs) => k -> vs.sortBy(-_.length) }
  }
  val kinds: Map[String, String] = surfaces.map(s => s -> kindFn(s)).toMap
}

object Annotator {

  private def isPunctChar(c: Char): Boolean = {
    val cp = c.toInt
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
    (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
      val t = Character.getType(c)
      t == Character.DASH_PUNCTUATION || t == Character.START_PUNCTUATION ||
      t == Character.END_PUNCTUATION || t == Character.CONNECTOR_PUNCTUATION ||
      t == Character.OTHER_PUNCTUATION || t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION
    }
  }

  def isPunctToken(t: String): Boolean = t.nonEmpty && t.forall(isPunctChar)

  /** Whitespace split + punctuation chars as singleton tokens (BERT
    * basic-tokenizer style, deterministic, no model). */
  def tokenizeWords(text: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    val sb = new java.lang.StringBuilder
    def flush(): Unit = if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
    while (i < n) {
      val c = text.charAt(i)
      if (graft.textnorm.PyText.isPySpace(c)) flush()
      else if (isPunctChar(c)) { flush(); out += c.toString }
      else sb.append(c)
      i += 1
    }
    flush()
    out.toArray
  }

  private val SentEnders = Set(".", "!", "?")

  /** Annotate one normalized document: tokenize, match gazetteer spans
    * greedily left-to-right (longest first), merge each span to ONE token,
    * emit per-token flags + mention list (deduped by surface text, first
    * occurrence wins — reference `mtb_data_loader.py:438-444`). */
  def annotate(url: String, textNorm: String, gaz: Gazetteer): AnnotatedDoc = {
    val raw = tokenizeWords(textNorm)
    val tokens = ArrayBuffer.empty[String]
    val mentionsAt = ArrayBuffer.empty[(Int, String)] // merged idx -> surface
    var i = 0
    while (i < raw.length) {
      val cands = gaz.byFirst.getOrElse(raw(i), Nil)
      var matched: Array[String] = null
      var ci = 0
      while (matched == null && ci < cands.length) {
        val cand = cands(ci)
        if (i + cand.length <= raw.length) {
          var k = 0
          var ok = true
          while (ok && k < cand.length) {
            if (raw(i + k) != cand(k)) ok = false
            k += 1
          }
          if (ok) matched = cand
        }
        ci += 1
      }
      if (matched != null) {
        mentionsAt += ((tokens.length, matched.mkString(" ")))
        tokens += matched.mkString(" ")
        i += matched.length
      } else {
        tokens += raw(i)
        i += 1
      }
    }
    val n = tokens.length
    val isPunct = new Array[Boolean](n)
    val isSentEnd = new Array[Boolean](n)
    var j = 0
    while (j < n) {
      isPunct(j) = isPunctToken(tokens(j))
      isSentEnd(j) = SentEnders.contains(tokens(j))
      j += 1
    }
    if (n > 0) isSentEnd(n - 1) = true

    // dedupe mentions by surface, first occurrence wins
    val seen = scala.collection.mutable.HashSet.empty[String]
    val mentions = mentionsAt.iterator.collect {
      case (idx, text) if seen.add(text) =>
        Mention(idx, idx, text, gaz.kinds.getOrElse(text, "ENT"))
    }.toVector

    AnnotatedDoc(url, tokens.toVector, isPunct.toVector, isSentEnd.toVector, mentions)
  }
}
