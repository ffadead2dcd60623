package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * - [[cosineCol]]: pure Column cosine (zip_with + aggregate → whole-stage
  *   codegen, no UDF)
  * - [[bruteForceTopK]]: exact baseline — broadcast the (small) query side
  *   against the corpus, rank per query. The corpus side streams; only the
  *   query side is materialized, so this scales to any corpus size as long
  *   as queries fit in a broadcast.
  * - [[lshTopK]]: the scale path — random-hyperplane LSH buckets shrink the
  *   candidate set from |corpus| to bucket-local before exact re-ranking;
  *   multi-probe via several independent tables keeps recall high.
  */
object Similarity extends Serializable {

  def dotCol(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def normCol(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Codegen'd primitive-loop cosine (see CosineSimExpr) — the HOF
    * formulation (dotCol/normCol) is kept for reference/oracles but is
    * interpreted and ~1000x slower per row on the ANN hot path. */
  def cosineCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Exact top-k neighbors for each query vector.
    * @param queries (id, embedding) — must be broadcastable
    * @param corpus  (id, embedding) — arbitrarily large
    * @return (query_id, neighbor_id, rank) rank 1..k by cosine desc,
    *         neighbor_id asc on exact ties (deterministic) */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineCol(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  private[ops] def localCos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Trained coarse quantizer for [[ivfTopK]]: spherical k-means over a
    * bounded deterministic sample (xxhash64 order — no RNG, identical
    * under any partitioning), Lloyd-iterated on the driver.
    *
    * Scale shape: this is the k-means|| recipe a 100-TB corpus uses — the
    * quantizer is always trained on a driver-sized sample (`sampleCap`
    * rows regardless of corpus size); only ASSIGNMENT is distributed.
    * Assignment is max-cosine (matching the probe metric); empty lists
    * deterministically keep their previous centroid; means are accumulated
    * in sample order, so the result is bit-stable. */
  def trainCentroids(
      corpus: DataFrame,
      nLists: Int,
      idCol: String,
      vecCol: String,
      sampleCap: Int = 4096,
      iters: Int = 8): Array[(Int, Array[Float])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("h", xxhash64(col("id")))
      .orderBy(col("h"), col("id"))
      .limit(sampleCap)
      .select(col("v"))
      .as[Array[Float]]
      .collect()
    if (sample.isEmpty) return Array.empty
    val k = math.min(nLists, sample.length)
    val dim = sample(0).length
    var cents: Array[Array[Float]] = Array.tabulate(k)(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestS = Double.MinValue; var c = 0
        while (c < k) {
          val s = localCos(v, cents(c))
          if (s > bestS) { best = c; bestS = s }
          c += 1
        }
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // deterministic empty-list fallback
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }
      it += 1
    }
    cents.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** IVF-flat ANN — the inverted-list scale path promised in SURVEY.md's
    * similarity-search section, complementing [[lshTopK]]:
    *
    *  - coarse quantizer: `nLists` centroids TRAINED by [[trainCentroids]]
    *    (bounded-sample spherical k-means; `trainIters = 0` falls back to
    *    the round-2/3 behavior of raw hash-ordered sample vectors);
    *    broadcast to executors
    *  - corpus vectors are assigned to their nearest centroid in one
    *    narrow map (this is the bucketBy(list_id) layout a 100-TB corpus
    *    would be written with — the scan then prunes to probed lists)
    *  - each (broadcast) query probes its `nProbe` nearest centroids; the
    *    list join is map-side against the broadcast probe table, so the
    *    corpus never shuffles
    *  - exact codegen'd cosine re-rank inside the probed lists
    */
  /** The `nProbe` centroid ids nearest to `v` by cosine (ties by id). */
  def nearestLists(
      centroids: Array[(Int, Array[Float])],
      v: Array[Float],
      n: Int): Seq[Int] =
    centroids.map { case (i, cv) => (i, localCos(v, cv)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(n).map(_._1).toSeq

  /** Assign every corpus vector to its nearest centroid in one narrow
    * map: (list_id, neighbor_id, c_vec). This IS the index layout — a
    * 100-TB corpus persists it partitioned by list_id ([[IvfIndex]]), so
    * serving scans only the probed lists. */
  def assignLists(
      spark: SparkSession,
      c: DataFrame, // (neighbor_id: long, c_vec)
      centroids: Array[(Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(centroids)
    c.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cents = cb.value
        it.map { case (id, v) =>
          var best = 0; var bestS = Double.MinValue
          cents.foreach { case (i, cv) =>
            val s = localCos(v, cv)
            if (s > bestS || (s == bestS && i < best)) { best = i; bestS = s }
          }
          (best, id, v)
        }
      }
      .toDF("list_id", "neighbor_id", "c_vec")
  }

  /** Broadcastable probe table: each query replicated to its `nProbe`
    * nearest lists — (list_id, query_id, q_vec). */
  def probeTable(
      spark: SparkSession,
      queries: DataFrame, // (query_id: long, q_vec)
      centroids: Array[(Int, Array[Float])],
      nProbe: Int): DataFrame = {
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(centroids)
    queries.as[(Long, Array[Float])]
      .flatMap { case (id, v) => nearestLists(cb.value, v, nProbe).map(l => (l, id, v)) }
      .toDF("list_id", "query_id", "q_vec")
  }

  /** Exact codegen'd cosine re-rank of (…, query_id, neighbor_id, q_vec,
    * c_vec) candidates to top-k per query. */
  def rerankTopK(cand: DataFrame, k: Int): DataFrame = {
    val scored = cand
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineCol(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  def ivfTopK(
      spark: SparkSession,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nLists: Int = 64,
      nProbe: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trainIters: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("c_vec"))
    val centroids: Array[(Int, Array[Float])] =
      trainCentroids(c, nLists, "neighbor_id", "c_vec", iters = trainIters)
    val assigned = assignLists(spark, c, centroids)
    val probes = broadcast(probeTable(
      spark,
      queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("q_vec")),
      centroids, nProbe))
    rerankTopK(assigned.join(probes, Seq("list_id")), k)
  }

  /** All signatures within hamming distance `dist` of `sig` (dist <= 2). */
  def probeSigs(sig: Int, nBits: Int, dist: Int): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer(sig)
    if (dist >= 1)
      for (b <- 0 until nBits) out += sig ^ (1 << b)
    if (dist >= 2)
      for (a <- 0 until nBits; b <- a + 1 until nBits)
        out += sig ^ (1 << a) ^ (1 << b)
    out.toSeq
  }

  /** Random-hyperplane signature (nBits) of a float vector — pure function
    * of (vector, seed); the hyperplanes are derived from splitmix so every
    * executor regenerates them identically with no driver state. */
  def hyperplaneSig(vec: Array[Float], nBits: Int, seed: Long): Int = {
    var sig = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) {
        // deterministic pseudo-gaussian component for (bit, dim)
        var h = seed ^ (b * 0x9e3779b97f4a7c15L) ^ (i * 0xbf58476d1ce4e5b9L)
        h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
        h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
        h ^= h >>> 31
        val comp = (h.toDouble / Long.MaxValue)
        dot += comp * vec(i)
        i += 1
      }
      if (dot >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** LSH-bucketed ANN: candidates share a signature in at least one of
    * `tables` independent hyperplane tables; exact cosine re-rank inside
    * the candidate set. Returns same schema as bruteForceTopK (approximate
    * contents).
    *
    * Recall design: the corpus emits ONE row per table (linear blow-up
    * only); the small broadcast query side multi-probes — it also emits
    * every signature at hamming distance 1, so a near-neighbor whose
    * signature differs by a single hyperplane is still a candidate. With
    * the 8-bit/8-table defaults, pair-collision probability at cosine 0.8
    * is ~0.99 (vs ~0.5 for the single-probe 12-bit/4-table setting). */
  def lshTopK(
      spark: SparkSession,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nBits: Int = 8,
      tables: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      probeDist: Int = 2): DataFrame = {
    import spark.implicits._

    def withSigs(df: DataFrame, side: String, probe: Boolean): DataFrame =
      df.select(col(idCol).cast("long").as(s"${side}_id"), col(vecCol).as(s"${side}_vec"))
        .as[(Long, Array[Float])]
        .flatMap { case (id, vec) =>
          (0 until tables).flatMap { t =>
            val sig = hyperplaneSig(vec, nBits, 0x5eed + t * 7919L)
            // multi-probe up to hamming distance `probeDist` — the probe
            // blow-up rides the SMALL broadcast query side only (1+8+28
            // sigs per table at the 8-bit default), which is what buys
            // recall in the weak-similarity regime (neighbor cosine ~0.3)
            // without touching the corpus layout
            val sigs =
              if (probe) probeSigs(sig, nBits, probeDist)
              else Seq(sig)
            sigs.map(s => (id, vec, t, s))
          }
        }
        .toDF(s"${side}_id", s"${side}_vec", "table", "sig")

    val qs = broadcast(withSigs(queries, "query", probe = true))
    val cs = withSigs(corpus, "neighbor", probe = false)
    val cand = cs
      .join(qs, Seq("table", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // score in the narrow stage, THEN dedup across tables/probes — the
      // dedup shuffle carries (ids, cos), never the vectors
      .withColumn("cos", cosineCol(col("query_vec"), col("neighbor_vec")))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
