package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** Artifact-loading scoring kernel — closes SURVEY.md §7.5's "a real
  * BERT-weights kernel is an artifact-loading drop-in" promise with actual
  * code: weights come from a binary dump on disk, not from in-process
  * training, and the forward pass has the reference head's SHAPE
  * (`model/bert.py:257-266`): per-token embeddings, the hidden states at
  * the [E1]/[E2] marker positions gathered and concatenated with a mean
  * pool, then a linear head over the concatenation.
  *
  * Forward: feat = [meanpool(E[ids]); E[ids[e1Start]]; E[ids[e2Start]]]
  * (3*dim), logits(c) = b(c) + w(c)·feat. Pad tokens are excluded from the
  * pool (attention-mask analogue), so batch padding cannot change scores.
  *
  * The artifact format is a versioned little-endian flat dump (magic,
  * dims, embedding table, head weights, bias) — the same loading path a
  * real exported checkpoint would use, fixture-sized here. */
final class ArtifactKernel(
    val nClasses: Int,
    val dim: Int,
    padId: Int,
    emb: Array[Array[Float]], // vocab x dim
    w: Array[Array[Float]],   // nClasses x 3*dim
    b: Array[Float])
    extends ScoringKernel {

  private def embOf(t: Int): Array[Float] =
    if (t >= 0 && t < emb.length) emb(t) else ArtifactKernel.zeroVec(dim)

  private[kernel] def features(ids: Array[Int], e1s: Int, e2s: Int): Array[Float] = {
    val feat = new Array[Float](3 * dim)
    var n = 0
    var i = 0
    while (i < ids.length) {
      val t = ids(i)
      if (t != padId) {
        val e = embOf(t)
        var j = 0
        while (j < dim) { feat(j) += e(j); j += 1 }
        n += 1
      }
      i += 1
    }
    if (n > 0) { var j = 0; while (j < dim) { feat(j) /= n; j += 1 } }
    def gather(pos: Int, off: Int): Unit =
      if (pos >= 0 && pos < ids.length && ids(pos) != padId) {
        val e = embOf(ids(pos))
        var j = 0
        while (j < dim) { feat(off + j) = e(j); j += 1 }
      }
    gather(e1s, dim)
    gather(e2s, 2 * dim)
    feat
  }

  override def scoreBatch(batch: Array[(Array[Int], Int, Int)]): Array[Array[Float]] =
    batch.map { case (ids, e1s, e2s) =>
      val feat = features(ids, e1s, e2s)
      Array.tabulate(nClasses) { c =>
        var s = b(c)
        val wc = w(c)
        var j = 0
        while (j < feat.length) { s += wc(j) * feat(j); j += 1 }
        s
      }
    }

  private[kernel] def weights: (Array[Array[Float]], Array[Array[Float]], Array[Float], Int) =
    (emb, w, b, padId)
}

object ArtifactKernel {

  private val Magic = 0x4752464bL // "GRFK"
  private val Version = 1

  private val zeroCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Float]]()
  // shared read-only zero vector — do not mutate
  private def zeroVec(n: Int): Array[Float] =
    zeroCache.computeIfAbsent(n, k => new Array[Float](k))

  /** Serialize to the flat little-endian artifact format. */
  def write(k: ArtifactKernel, path: Path): Unit = {
    val (emb, w, b, padId) = k.weights
    val vocab = emb.length
    val dim = k.dim
    val nc = k.nClasses
    val bytes = 4 * (8 + vocab * dim + nc * 3 * dim + nc)
    val buf = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt((Magic >> 16).toInt).putInt((Magic & 0xffff).toInt)
    buf.putInt(Version).putInt(nc).putInt(vocab).putInt(dim).putInt(padId).putInt(0)
    emb.foreach(row => row.foreach(buf.putFloat))
    w.foreach(row => row.foreach(buf.putFloat))
    b.foreach(buf.putFloat)
    Files.write(path, buf.array())
  }

  /** Load an artifact dump — the executor-side path: the driver loads
    * once and broadcasts the kernel like any other. */
  def load(path: Path): ArtifactKernel = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(path)).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == (Magic >> 16).toInt && buf.getInt() == (Magic & 0xffff).toInt,
      s"not a graft kernel artifact: $path")
    require(buf.getInt() == Version, "unsupported artifact version")
    val nc = buf.getInt()
    val vocab = buf.getInt()
    val dim = buf.getInt()
    val padId = buf.getInt()
    buf.getInt() // reserved
    def mat(rows: Int, cols: Int): Array[Array[Float]] =
      Array.fill(rows)(Array.fill(cols)(buf.getFloat()))
    val emb = mat(vocab, dim)
    val w = mat(nc, 3 * dim)
    val b = Array.fill(nc)(buf.getFloat())
    new ArtifactKernel(nc, dim, padId, emb, w, b)
  }

  /** Deterministic per-(token, dim) embedding component in [-1, 1) — the
    * fixture-scale stand-in for trained token embeddings. */
  private def embComponent(t: Int, j: Int): Float = {
    var z = t.toLong * 0x9e3779b97f4a7c15L + j.toLong * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    ((z >>> 11).toDouble / (1L << 53) * 2.0 - 1.0).toFloat
  }

  /** Fit a nearest-centroid linear head over the deterministic embedding
    * features (w(c) = class centroid, b(c) = -||centroid||²/2, the exact
    * linear form of nearest-centroid under the dot product). Callers dump
    * with [[write]] and serve via [[load]] — the artifact path is the
    * product surface; fit exists to produce fixture-sized artifacts. */
  def fit(
      examples: Seq[(Seq[Int], Int, Int, Int)], // (ids, e1Start, e2Start, label)
      nClasses: Int,
      padId: Int,
      dim: Int = 128): ArtifactKernel = {
    val vocab = math.max(examples.iterator.flatMap(_._1).max + 1, padId + 1)
    val emb = Array.tabulate(vocab, dim)(embComponent)
    // feature extraction via a weight-free kernel instance
    val probe = new ArtifactKernel(1, dim, padId, emb,
      Array(Array.fill(3 * dim)(0f)), Array(0f))
    val sums = Array.fill(nClasses)(new Array[Double](3 * dim))
    val counts = new Array[Long](nClasses)
    examples.foreach { case (ids, e1s, e2s, c) =>
      val feat = probe.features(ids.toArray, e1s, e2s)
      var j = 0
      while (j < feat.length) { sums(c)(j) += feat(j); j += 1 }
      counts(c) += 1
    }
    val w = Array.tabulate(nClasses) { c =>
      val n = math.max(counts(c), 1L).toDouble
      Array.tabulate(3 * dim)(j => (sums(c)(j) / n).toFloat)
    }
    val b = w.map(row => (-0.5 * row.map(x => x.toDouble * x).sum).toFloat)
    new ArtifactKernel(nClasses, dim, padId, emb, w, b)
  }
}
