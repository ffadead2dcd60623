package graft.kernel

/** Pluggable relation scorer behind the broadcast-model mapPartitions
  * inference stage (SURVEY.md §2.23-2.24). The engine is model-agnostic:
  * tests and benchmarks run the deterministic [[StubKernel]]; a real
  * BERT-weights kernel is an artifact-loading drop-in with the same trait.
  *
  * Contract mirrors the reference's forward pass inputs
  * (`model/bert.py:257-266`): padded token-id rows plus the positions of
  * the [E1]/[E2] marker tokens; output = one logit per relation class.
  */
trait ScoringKernel extends Serializable {
  def nClasses: Int

  /** Score one batch; rows are (tokenIds padded to batch max, e1Start,
    * e2Start). Returns per-row logits, length nClasses. */
  def scoreBatch(batch: Array[(Array[Int], Int, Int)]): Array[Array[Float]]
}

/** Deterministic multinomial Naive-Bayes scorer over the token-id bag —
  * the "seeded feature-hash logistic scorer" of SURVEY.md §7.5. Trained
  * once, driver-side, on the small SemEval-format fixture; broadcast to
  * executors as a plain serializable object (the stand-in for broadcasting
  * real model weights).
  *
  * Padding id contributes nothing, so batch padding cannot change scores —
  * mirroring attention masking in the reference (`mtb_model.py:355`).
  */
final class StubKernel(
    val nClasses: Int,
    padId: Int,
    logPrior: Array[Float],
    logLik: Map[Int, Array[Float]], // tokenId -> per-class log likelihood
    unseen: Array[Float])
    extends ScoringKernel {

  // dense token->weights table: the scoring loop is the innermost hot path
  // of the fused pipeline; a boxed Map lookup per token costs more than the
  // 19 adds it guards. Rebuilt lazily per executor after broadcast.
  @transient private lazy val dense: Array[Array[Float]] = {
    val maxId = if (logLik.isEmpty) 0 else logLik.keys.max
    val arr = Array.fill(maxId + 1)(unseen)
    logLik.foreach { case (t, w) => arr(t) = w }
    arr
  }

  def scoreOne(tokenIds: Array[Int]): Array[Float] = {
    val d = dense
    val s = new Array[Float](nClasses)
    System.arraycopy(logPrior, 0, s, 0, nClasses)
    var i = 0
    while (i < tokenIds.length) {
      val t = tokenIds(i)
      if (t != padId) {
        val w = if (t >= 0 && t < d.length) d(t) else unseen
        var c = 0
        while (c < nClasses) { s(c) += w(c); c += 1 }
      }
      i += 1
    }
    s
  }

  override def scoreBatch(batch: Array[(Array[Int], Int, Int)]): Array[Array[Float]] =
    batch.map { case (ids, _, _) => scoreOne(ids) }
}

object StubKernel {

  /** Add-one-smoothed multinomial NB. Deterministic: iteration order is by
    * sorted token id / class id; no RNG anywhere. */
  def train(
      examples: Seq[(Seq[Int], Int)],
      nClasses: Int,
      padId: Int): StubKernel = {
    val classCounts = new Array[Long](nClasses)
    val tokenCounts = scala.collection.mutable.HashMap.empty[Int, Array[Long]]
    val classTokenTotals = new Array[Long](nClasses)
    examples.foreach { case (ids, c) =>
      classCounts(c) += 1
      ids.foreach { t =>
        if (t != padId) {
          val arr = tokenCounts.getOrElseUpdate(t, new Array[Long](nClasses))
          arr(c) += 1
          classTokenTotals(c) += 1
        }
      }
    }
    val vocabSeen = tokenCounts.size + 1
    val total = classCounts.sum.toDouble.max(1.0)
    val logPrior = classCounts.map(n => math.log((n + 1).toDouble / (total + nClasses)).toFloat)
    val logLik = tokenCounts.map { case (t, arr) =>
      t -> Array.tabulate(nClasses) { c =>
        math.log((arr(c) + 1).toDouble / (classTokenTotals(c) + vocabSeen)).toFloat
      }
    }.toMap
    val unseen = Array.tabulate(nClasses) { c =>
      math.log(1.0 / (classTokenTotals(c) + vocabSeen)).toFloat
    }
    new StubKernel(nClasses, padId, logPrior, logLik, unseen)
  }

  def argmax(logits: Array[Float]): Int = {
    var best = 0
    var i = 1
    while (i < logits.length) {
      if (logits(i) > logits(best)) best = i
      i += 1
    }
    best
  }
}
