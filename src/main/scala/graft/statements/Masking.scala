package graft.statements

import graft.schema.Span
import graft.tokenize.BertTokenizer

/** Training-path data augmentation — deterministic re-expressions of the
  * reference's samplers (SURVEY.md §2.20-2.21). The reference draws from
  * process-global RNG state; our engine derives every random decision from
  * a seeded hash of (relationId, epoch, position) so any partition can
  * recompute its rows independently (resume/retry safe, no RNG state).
  */
object Masking {

  // PortableRng draws (tags 6 = blank branches, 7 = mask selection) so the
  // augmentation is bit-exactly replayable by the DuckDB oracle (q55);
  // a `draw < (alpha * M).toLong` integer compare stands in for the
  // reference's `np.random.random() < alpha`.
  private def key(relationId: Long, epoch: Int): Long =
    PortableRng.mix(relationId, epoch.toLong)

  private def threshold(alpha: Double): Long =
    (alpha * PortableRng.M).toLong

  /** Blank substitution (`mtb_data_generator.py:68-96`): with prob alpha
    * per entity, replace the entity span tokens with a single [BLANK] id
    * and shift the downstream span. Spans inclusive, inside-markers. */
  def putBlanks(
      tokenIds: Seq[Int],
      e1: Span,
      e2: Span,
      blankId: Int,
      relationId: Long,
      epoch: Int,
      alpha: Double = 0.7): (Seq[Int], Span, Span) = {
    var ids = tokenIds
    var s1 = e1
    var s2 = e2
    val k = key(relationId, epoch)
    val blankE1 = PortableRng.draw(k, 6L, 1L) < threshold(alpha)
    val blankE2 = PortableRng.draw(k, 6L, 2L) < threshold(alpha)
    if (blankE1) {
      val len1 = s1.end - s1.start + 1
      ids = ids.take(s1.start) ++ Seq(blankId) ++ ids.drop(s1.end + 1)
      val shift = len1 - 1
      s1 = Span(s1.start, s1.start)
      if (s2.start > s1.start) s2 = Span(s2.start - shift, s2.end - shift)
    }
    if (blankE2) {
      val len2 = s2.end - s2.start + 1
      ids = ids.take(s2.start) ++ Seq(blankId) ++ ids.drop(s2.end + 1)
      val shift = len2 - 1
      s2 = Span(s2.start, s2.start)
      if (s1.start > s2.start) s1 = Span(s1.start - shift, s1.end - shift)
    }
    (ids, s1, s2)
  }

  /** MLM masking (`mtb_data_generator.py:98-126`): mask ~maskProb of the
    * positions outside the entity spans ±1; emit (masked sequence, masked
    * positions, original labels, marker starts). entity_starts are the
    * positions of the [E1]/[E2] marker tokens = span.start - 1. */
  def maskSequence(
      tokenIds: Seq[Int],
      e1: Span,
      e2: Span,
      maskId: Int,
      relationId: Long,
      epoch: Int,
      maskProb: Double = 0.15): (Seq[Int], Seq[Int], Seq[Int], (Int, Int)) = {
    val forbidden = ((e1.start - 1) to (e1.end + 1)).toSet ++
      ((e2.start - 1) to (e2.end + 1)).toSet
    val candidates = tokenIds.indices.filterNot(forbidden.contains)
    val nMask = math.max(1, math.round(maskProb * candidates.size).toInt)
    val k = key(relationId, epoch)
    val picked = candidates
      .sortBy(i => (PortableRng.draw(k, 7L, i.toLong), i))
      .take(nMask)
      .sorted
    val pickedSet = picked.toSet
    val masked = tokenIds.zipWithIndex.map {
      case (t, i) if pickedSet(i) => maskId
      case (t, _) => t
    }
    val labels = picked.map(tokenIds)
    (masked, picked, labels, (e1.start - 1, e2.start - 1))
  }

  /** Training-batch length cutoff (`mtb_model.py:233-234`). */
  def lengthOk(tokenIds: Seq[Int], maxLen: Int = 70): Boolean =
    tokenIds.length <= maxLen

  /** Convenience: blank + mask in one call, mirroring the generator's
    * __getitem__ composition. */
  def augment(
      tok: BertTokenizer,
      tokenIds: Seq[Int],
      e1: Span,
      e2: Span,
      relationId: Long,
      epoch: Int): (Seq[Int], Seq[Int], Seq[Int], (Int, Int)) = {
    val (blanked, b1, b2) =
      putBlanks(tokenIds, e1, e2, tok.blankId, relationId, epoch)
    maskSequence(blanked, b1, b2, tok.maskId, relationId, epoch)
  }
}
