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
      tokens: scala.collection.Seq[String],
      e1: Span,
      e2: Span): scala.collection.Seq[String] = {
    val out = new ArrayBuffer[String](tokens.length + 6)
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
    out
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

  /** Memoized wordpieces + their vocab ids for one surface token — the
    * per-partition cache value. Caching the ID array too means the vocab
    * HashMap is consulted once per DISTINCT token, not once per emitted
    * wordpiece per statement (the tokenize stage re-encodes a near-closed
    * vocabulary; this is the hot allocation path of the wide chain). */
  final case class TokPieces(pieces: Array[String], ids: Array[Int])

  /** Tokenize the marker-bearing string and relocate spans to wordpiece
    * coordinates, inside the marker pairs: (e1_s+1, e1_e-1). Rows whose
    * markers vanish in tokenization are dropped (the reference counts and
    * drops them via the ValueError path, `mtb_data_loader.py:239-242`). */
  def encode(tokenizer: BertTokenizer)(
      tokens: scala.collection.Seq[String],
      e1: Span,
      e2: Span): Option[Encoded] =
    encodeCached(tokenizer, null)(tokens, e1, e2)

  /** encode with per-partition memoization: tokenize(" ".join(ts)) equals
    * the concatenation of tokenize(t) per element (tokens contain no
    * whitespace, and atomic markers cannot span a joined boundary), so each
    * distinct surface tokenizes (and id-converts) once per partition
    * instead of once per statement. Marker positions are found during the
    * single append scan — first value-equal occurrence, exactly
    * `buf.indexOf` semantics — instead of four post-hoc list scans. */
  def encodeCached(
      tokenizer: BertTokenizer,
      cache: java.util.HashMap[String, TokPieces])(
      tokens: scala.collection.Seq[String],
      e1: Span,
      e2: Span): Option[Encoded] = {
    val withMarkers = addSpecialTokens(tokens, e1, e2)
    var e1s = -1; var e1e = -1; var e2s = -1; var e2e = -1
    val ids = new scala.collection.mutable.ArrayBuilder.ofInt
    ids.sizeHint(withMarkers.length + 8)
    var n = 0
    withMarkers.foreach { t =>
      var tp = if (cache == null) null else cache.get(t)
      if (tp == null) {
        val pcs = tokenizer.tokenize(t).toArray
        val idArr = new Array[Int](pcs.length)
        var i = 0
        while (i < pcs.length) { idArr(i) = tokenizer.convertTokenToId(pcs(i)); i += 1 }
        tp = TokPieces(pcs, idArr)
        if (cache != null) cache.put(t, tp)
      }
      val pcs = tp.pieces
      var i = 0
      while (i < pcs.length) {
        val p = pcs(i)
        // the four marker strings are pairwise distinct, so at most one
        // branch can match; "first occurrence wins" == indexOf semantics
        if (e1s < 0 && p == BertVocab.E1) e1s = n
        else if (e1e < 0 && p == BertVocab.E1End) e1e = n
        else if (e2s < 0 && p == BertVocab.E2) e2s = n
        else if (e2e < 0 && p == BertVocab.E2End) e2e = n
        i += 1; n += 1
      }
      ids.addAll(tp.ids)
    }
    if (e1s < 0 || e1e < 0 || e2s < 0 || e2e < 0) None
    else Some(Encoded(ids.result(), Span(e1s + 1, e1e - 1), Span(e2s + 1, e2e - 1)))
  }
}
