package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic clustered embedding fixture for the driver-visible IVF
  * recall gate (q28): `nClusters` centers with splitmix-derived uniform
  * [-1, 1] components, each vector its center plus small jitter — the
  * regime ANN indexes exist for (real embedding corpora are clustered;
  * the `embeddings` test table is near-isotropic, where any probed-subset
  * method is honestly bounded by the probed fraction). Pure function of
  * the row index: identical under any partitioning. */
object ClusteredVecs {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Uniform in [-1, 1], deterministic per key. */
  private def u(key: Long): Double = mix(key).toDouble / Long.MaxValue

  def generate(
      spark: SparkSession,
      n: Int,
      dim: Int,
      nClusters: Int,
      jitter: Double = 0.15): DataFrame = {
    import spark.implicits._
    spark
      .range(n)
      .map { i =>
        val c = i % nClusters
        val v = Array.tabulate(dim) { d =>
          (u(0xc11e5 + c * 1009L + d) + jitter * u(0x9e1 + i * 7919L + d)).toFloat
        }
        (i, v)
      }
      .toDF("vec_id", "embedding")
  }
}
