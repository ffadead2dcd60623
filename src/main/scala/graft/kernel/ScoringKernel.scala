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

  /** per-token class weights (pad → zero vector) — for marker-aware
    * composition. */
  private[kernel] def weightsFor(t: Int): Array[Float] = {
    val d = dense
    if (t == padId) StubKernel.zeros(nClasses)
    else if (t >= 0 && t < d.length) d(t)
    else unseen
  }
}

/** Marker-position-aware kernel — the NB-land analogue of the reference's
  * gather-at-marker head (`bert.py:257-266`: hidden states at the [E1] and
  * [E2] positions are gathered and concatenated into the classifier
  * input). Here the tokens AT the carried e1Start/e2Start positions vote
  * with `entityWeight` extra multiplicity, in training and scoring alike,
  * so the classifier attends to the marked pair rather than the bag alone.
  * Wraps [[StubKernel]]; same trait, still a broadcastable plain object. */
final class MarkerAwareKernel(
    private[kernel] val inner: StubKernel,
    entityWeight: Int)
    extends ScoringKernel {

  def nClasses: Int = inner.nClasses

  override def scoreBatch(batch: Array[(Array[Int], Int, Int)]): Array[Array[Float]] =
    batch.map { case (ids, e1s, e2s) =>
      val s = inner.scoreOne(ids)
      def gather(pos: Int): Unit =
        if (pos >= 0 && pos < ids.length) {
          val w = inner.weightsFor(ids(pos))
          var c = 0
          while (c < nClasses) { s(c) += entityWeight * w(c); c += 1 }
        }
      gather(e1s)
      gather(e2s)
      s
    }
}

object MarkerAwareKernel {

  /** Train with the same feature map the scorer applies: marker-position
    * tokens contribute `entityWeight` extra counts per example. */
  def train(
      examples: Seq[(Seq[Int], Int, Int, Int)], // (ids, e1Start, e2Start, label)
      nClasses: Int,
      padId: Int,
      entityWeight: Int = 3): MarkerAwareKernel = {
    val augmented = examples.map { case (ids, e1s, e2s, c) =>
      val extra = Seq(e1s, e2s)
        .filter(p => p >= 0 && p < ids.length)
        .flatMap(p => Seq.fill(entityWeight)(ids(p)))
      (ids ++ extra, c)
    }
    new MarkerAwareKernel(
      StubKernel.train(augmented, nClasses, padId), entityWeight)
  }
}

object StubKernel {

  private val zeroCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Float]]()
  /** Process-wide SHARED zero vector — read-only by contract. Callers
    * (weightsFor's pad path) must never mutate the returned array; a
    * kernel composition that scales weights in place must copy first. */
  private[kernel] def zeros(n: Int): Array[Float] =
    zeroCache.computeIfAbsent(n, k => new Array[Float](k))

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
