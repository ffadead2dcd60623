package graft.statements

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Counter-based seeded RNG whose every intermediate stays below 2^47, so
  * identical integer arithmetic can be evaluated by Spark Column
  * expressions (codegen'd), plain Scala Longs, and the DuckDB oracle
  * (BIGINT) with bit-exact agreement — the same portability trick that
  * made the SimHash signature oracle-checkable (Dedup.tokenHash60).
  *
  * The reference draws from Python's global sequential `random` /
  * `np.random` streams (mtb_data_generator.py:136-192). A distributed
  * engine cannot reproduce a shared sequential stream (draw order would
  * depend on partitioning), so every draw is a pure function of
  * (seed, e1, e2, epoch) + a stream tag + a counter: deterministic under
  * any partitioning, retry, or execution order (SURVEY.md §7.5), and O(1)
  * to locate — which is what lets the whole sampling battery be mirrored
  * in ANSI SQL.
  *
  * Construction: three multiplicative-congruential rounds modulo
  * M = 2^31 - 1 (prime), Lehmer multipliers 48271 (MINSTD) and 69621.
  * Not cryptographic; spectral quality is MINSTD-grade, which is the same
  * contract the reference's `random.random()` fulfils for sampling.
  */
object PortableRng {
  val M: Long = 2147483647L // 2^31 - 1
  val A: Long = 48271L
  val B: Long = 69621L

  /** h > Half  <=>  h/M > 0.5 for h in [0, M) — integer comparison so the
    * reference's `np.random.uniform() > 0.5` branch needs no float parity. */
  val Half: Long = 1073741823L

  /** Mix two 64-bit inputs into [0, M). Max intermediate: M*48271 < 2^47. */
  def mix(x: Long, y: Long): Long = {
    val x0 = ((x % M) + M) % M
    val y0 = ((y % M) + M) % M
    var h = (x0 * A + y0 + 1L) % M
    h = (h * B + 11L) % M
    h = (h * A + 7L) % M
    h
  }

  /** Per-pool sampling key — replaces the reference's shared RNG state. */
  def key(seed: Long, e1: Long, e2: Long, epoch: Long): Long =
    mix(mix(mix(seed, e1), e2), epoch)

  /** j-th draw of stream `tag` under `key`, uniform in [0, M). */
  def draw(key: Long, tag: Long, j: Long): Long = mix(mix(key, tag), j)

  /** floor(n * draw / M): uniform int in [0, n). Exact while n < 2^16. */
  def drawInt(key: Long, tag: Long, j: Long, n: Long): Long =
    n * draw(key, tag, j) / M

  // ---- Spark Column mirror (pure integer arithmetic => whole-stage
  //      codegen; no UDF) ----
  def mixCol(x: Column, y: Column): Column = {
    val x0 = ((x % M) + M) % M
    val y0 = ((y % M) + M) % M
    val h1 = (x0 * A + y0 + lit(1L)) % M
    val h2 = (h1 * B + lit(11L)) % M
    (h2 * A + lit(7L)) % M
  }

  def keyCol(seed: Column, e1: Column, e2: Column, epoch: Column): Column =
    mixCol(mixCol(mixCol(seed, e1), e2), epoch)

  def drawCol(key: Column, tag: Column, j: Column): Column =
    mixCol(mixCol(key, tag), j)

  // ---- ANSI-SQL mirror (string builders for the DuckDB oracle; the
  //      emitted expression is plain +,*,% over BIGINT) ----
  def sqlMix(x: String, y: String): String = {
    // CAST: bare integer literals parse as INT32 in DuckDB and overflow
    val x0 = s"((CAST($x AS BIGINT) % $M + $M) % $M)"
    val y0 = s"((CAST($y AS BIGINT) % $M + $M) % $M)"
    val h1 = s"(($x0 * $A + $y0 + 1) % $M)"
    val h2 = s"(($h1 * $B + 11) % $M)"
    s"(($h2 * $A + 7) % $M)"
  }

  def sqlKey(seed: String, e1: String, e2: String, epoch: String): String =
    sqlMix(sqlMix(sqlMix(seed, e1), e2), epoch)

  def sqlDraw(key: String, tag: String, j: String): String =
    sqlMix(sqlMix(key, tag), j)
}
