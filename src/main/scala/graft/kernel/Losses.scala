package graft.kernel

/** Training losses — §2.27, semantics of the reference's `MTBLoss`
  * (`model/mtb_loss.py:15-82`): a masked-LM cross-entropy (ignore-index,
  * reduction=sum) plus the matching-the-blanks BCE-with-logits over dot
  * products of blank embeddings — positive pairs are all combinations of
  * positive rows, negatives are positive x negative products.
  *
  * Pure functions over primitive arrays: they run inside a mapPartitions
  * training kernel (per-batch, driver-free) and are trivially unit-tested.
  * Out of the P/R gate (training-only) but part of the operator surface.
  */
object Losses {

  /** CrossEntropyLoss(ignore_index, reduction="sum"): for each position
    * whose label != ignoreIndex, -log softmax(logits)(label), summed.
    * Numerically stable log-sum-exp. */
  def crossEntropySum(
      logits: Array[Array[Double]],
      labels: Array[Int],
      ignoreIndex: Int): Double = {
    require(logits.length == labels.length, "logits/labels length mismatch")
    var loss = 0.0
    var i = 0
    while (i < labels.length) {
      val y = labels(i)
      if (y != ignoreIndex) {
        val row = logits(i)
        var m = Double.NegativeInfinity
        var j = 0
        while (j < row.length) { if (row(j) > m) m = row(j); j += 1 }
        var s = 0.0
        j = 0
        while (j < row.length) { s += math.exp(row(j) - m); j += 1 }
        loss += (m + math.log(s)) - row(y)
      }
      i += 1
    }
    loss
  }

  /** BCEWithLogitsLoss(reduction="sum"), stable formulation:
    * max(x,0) - x*y + log1p(exp(-|x|)). */
  def bceWithLogitsSum(logits: Array[Double], labels: Array[Double]): Double = {
    require(logits.length == labels.length, "logits/labels length mismatch")
    var loss = 0.0
    var i = 0
    while (i < logits.length) {
      val x = logits(i)
      val y = labels(i)
      loss += math.max(x, 0.0) - x * y + math.log1p(math.exp(-math.abs(x)))
      i += 1
    }
    loss
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The blank-relation half of MTBLoss: BCE over pos-pos (label 1) and
    * pos-neg (label 0) embedding dot products, in the reference's
    * enumeration order (combinations of positives, then pos x neg). */
  def blankLoss(
      blankEmbeddings: Array[Array[Double]],
      blankLabels: Array[Int]): Double = {
    val pos = blankLabels.indices.filter(blankLabels(_) == 1)
    val neg = blankLabels.indices.filter(blankLabels(_) == 0)
    val logits = scala.collection.mutable.ArrayBuffer.empty[Double]
    val labels = scala.collection.mutable.ArrayBuffer.empty[Double]
    if (pos.length > 1) {
      var i = 0
      while (i < pos.length) {
        var j = i + 1
        while (j < pos.length) {
          logits += dot(blankEmbeddings(pos(i)), blankEmbeddings(pos(j)))
          labels += 1.0
          j += 1
        }
        i += 1
      }
    }
    pos.foreach { p =>
      neg.foreach { n =>
        logits += dot(blankEmbeddings(p), blankEmbeddings(n))
        labels += 0.0
      }
    }
    bceWithLogitsSum(logits.toArray, labels.toArray)
  }

  /** total = LM cross-entropy + blank BCE (`mtb_loss.py:75-82`). */
  def mtbLoss(
      lmLogits: Array[Array[Double]],
      lmLabels: Array[Int],
      lmIgnoreIndex: Int,
      blankEmbeddings: Array[Array[Double]],
      blankLabels: Array[Int]): Double =
    crossEntropySum(lmLogits, lmLabels, lmIgnoreIndex) +
      blankLoss(blankEmbeddings, blankLabels)
}
