package graft.statements

import scala.collection.mutable.ArrayBuffer

import graft.schema.Span
import graft.tokenize.{BertTokenizer, BertVocab}

/** Entity-marker insertion + WordPiece re-encoding + span fixup —
  * exact ports of `mtb_data_loader.py:319-335` (_add_special_tokens) and
  * `:222-242` (marker index recovery; spans point INSIDE the markers). */
object Markers {

  /** `_add_special_tokens`: rebuild the window token list with [CLS],
    * [E1]/[/E1], [E2]/[/E2], [SEP]. Insertion order per the reference:
    * openers before the token (E1 first), closers after it (E1 first). */
  def addSpecialTokens(
      tokens: Seq[String],
      e1: Span,
      e2: Span): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    out += BertVocab.Cls
    var i = 0
    val n = tokens.length
    while (i < n) {
      if (i == e1.start) out += BertVocab.E1
      if (i == e2.start) out += BertVocab.E2
      out += tokens(i)
      if (i == e1.end) out += BertVocab.E1End
      if (i == e2.end) out += BertVocab.E2End
      i += 1
    }
    out += BertVocab.Sep
    out.toSeq
  }

  /** Inference-side marker insertion by STRING matching — port of the
    * reference's `annotate_sent` (`src/tasks/infer.py:172-210`), the
    * variant its ad-hoc inference entry point uses. Quirks preserved:
    * only the FIRST token textually equal to the entity (or to its
    * first/last token for multi-token entities) is marked, e1 is tried
    * before e2 for every token, and the assembled string is
    * whitespace-collapsed and stripped at the end. */
  def annotateSent(tokens: Seq[String], e1: Seq[String], e2: Seq[String]): String = {
    val sb = new java.lang.StringBuilder
    var e1start = 0; var e1end = 0
    var e2start = 0; var e2end = 0
    tokens.foreach { t =>
      var consumed = false
      if (e1.length == 1) {
        if (t == e1.head && e1start == 0 && e1end == 0) {
          sb.append(" [E1]").append(t).append("[/E1] ")
          e1start = 1; e1end = 1; consumed = true
        }
      } else {
        if (t == e1.head && e1start == 0) {
          sb.append(" [E1]").append(t).append(" ")
          e1start += 1; consumed = true
        } else if (t == e1.last && e1end == 0) {
          sb.append(t).append("[/E1] ")
          e1end += 1; consumed = true
        }
      }
      if (!consumed) {
        if (e2.length == 1) {
          if (t == e2.head && e2start == 0 && e2end == 0) {
            sb.append(" [E2]").append(t).append("[/E2] ")
            e2start = 1; e2end = 1; consumed = true
          }
        } else {
          if (t == e2.head && e2start == 0) {
            sb.append(" [E2]").append(t).append(" ")
            e2start += 1; consumed = true
          } else if (t == e2.last && e2end == 0) {
            sb.append(t).append("[/E2] ")
            e2end += 1; consumed = true
          }
        }
      }
      if (!consumed) sb.append(" ").append(t).append(" ")
    }
    sb.toString.trim.replaceAll(" +", " ")
  }

  /** tokenIds as a primitive array: the encode→score path materializes one
    * per statement; Seq[Int] would box every id. */
  final case class Encoded(tokenIds: Array[Int], e1Span: Span, e2Span: Span)

  /** Tokenize the marker-bearing string and relocate spans to wordpiece
    * coordinates, inside the marker pairs: (e1_s+1, e1_e-1). Rows whose
    * markers vanish in tokenization are dropped (the reference counts and
    * drops them via the ValueError path, `mtb_data_loader.py:239-242`). */
  def encode(tokenizer: BertTokenizer)(
      tokens: Seq[String],
      e1: Span,
      e2: Span): Option[Encoded] =
    encodeCached(tokenizer, null)(tokens, e1, e2)

  /** encode with per-partition memoization: tokenize(" ".join(ts)) equals
    * the concatenation of tokenize(t) per element (tokens contain no
    * whitespace, and atomic markers cannot span a joined boundary), so each
    * distinct surface tokenizes once per partition instead of once per
    * statement — the statement stage re-tokenizes a near-closed vocabulary. */
  def encodeCached(
      tokenizer: BertTokenizer,
      cache: java.util.HashMap[String, Seq[String]])(
      tokens: Seq[String],
      e1: Span,
      e2: Span): Option[Encoded] = {
    val withMarkers = addSpecialTokens(tokens, e1, e2)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    withMarkers.foreach { t =>
      val pcs =
        if (cache == null) tokenizer.tokenize(t)
        else {
          var c = cache.get(t)
          if (c == null) { c = tokenizer.tokenize(t); cache.put(t, c) }
          c
        }
      buf ++= pcs
    }
    val e1s = buf.indexOf(BertVocab.E1)
    val e1e = buf.indexOf(BertVocab.E1End)
    val e2s = buf.indexOf(BertVocab.E2)
    val e2e = buf.indexOf(BertVocab.E2End)
    if (e1s < 0 || e1e < 0 || e2s < 0 || e2e < 0) None
    else {
      val ids = new Array[Int](buf.length)
      var i = 0
      while (i < buf.length) {
        ids(i) = tokenizer.convertTokenToId(buf(i))
        i += 1
      }
      Some(Encoded(ids, Span(e1s + 1, e1e - 1), Span(e2s + 1, e2e - 1)))
    }
  }
}
