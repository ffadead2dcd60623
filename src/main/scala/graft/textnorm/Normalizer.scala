package graft.textnorm

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalizer — byte-identical Scala re-expression of the reference's
  * `helpers.py:12-74` (Normalizer): ordered method list
  * (lowercase → strip html tags → strip URLs), then collapse multiple spaces
  * and strip. This is THE `text → text_norm` per-url byte-identity invariant
  * from BASELINE.json.
  *
  * Two surfaces, same semantics:
  *   - [[normalize]]: plain Scala function (golden tests, typed maps)
  *   - [[normalizeCol]]: Catalyst Column expression chain (the pipeline path;
  *     stays inside whole-stage codegen — regexp_replace is codegen'd)
  *
  * Regex parity notes (SURVEY.md §7.5): Python `re` on str is Unicode-aware
  * for \s and \d; Java needs the inline (?U) flag (UNICODE_CHARACTER_CLASS)
  * for the same meaning. Patterns below carry (?U) so the Column version and
  * the Scala version agree with CPython on non-ASCII whitespace.
  */
object Normalizer {

  /** `<.*?>` — reference `helpers.py:63-65` (_remove_html). */
  val HtmlTagPattern = "<.*?>"

  /** URL regex — reference `helpers.py:67-74` (_remove_urls), translated
    * character-for-character to Java syntax; (?U) makes \s/\d Unicode-wide
    * like Python's. Matches http(s)://…, www.…, and bare domain/path forms. */
  val UrlPattern: String =
    "(?U)((https?:\\/\\/|www\\d{0,3}[.]|[a-z0-9.\\-]+[.][a-z]{2,4}\\/)" +
      "(?:[^\\s()<>]+|\\(([^\\s()<>]+|(\\([^\\s()<>]+\\)))*\\))+" +
      "(?:\\(([^\\s()<>]+|(\\([^\\s()<>]+\\)))*\\)|" +
      "[^\\s`!()\\[\\]{};:'\".,<>?«»“”‘’]))"

  private val htmlRe = Pattern.compile(HtmlTagPattern)
  private val urlRe = Pattern.compile(UrlPattern)
  private val multiSpaceRe = Pattern.compile(" +")

  final val DefaultMethods: Seq[String] = Seq("lowercase", "html", "urls")

  /** Reference `helpers.py:42-56` Normalizer.normalize. */
  def normalize(text: String, methods: Seq[String] = DefaultMethods): String = {
    var t = text
    methods.foreach {
      case "lowercase" => t = PyText.pyLower(t)
      case "html"      => t = htmlRe.matcher(t).replaceAll("")
      case "urls"      => t = urlRe.matcher(t).replaceAll("")
      case m           => throw new IllegalArgumentException(s"unknown method $m")
    }
    t = multiSpaceRe.matcher(t).replaceAll(" ")
    PyText.pyStrip(t)
  }

  /** Column form of [[normalize]] — identical output, Catalyst-native.
    * lower() matches Locale.ROOT lowercasing; trim must strip the Python
    * whitespace set, hence the regexp-based pyTrim. */
  def normalizeCol(c: Column, methods: Seq[String] = DefaultMethods): Column = {
    var col = c
    methods.foreach {
      case "lowercase" => col = lower(col)
      case "html"      => col = regexp_replace(col, HtmlTagPattern, "")
      case "urls"      => col = regexp_replace(col, UrlPattern, "")
      case m           => throw new IllegalArgumentException(s"unknown method $m")
    }
    pyTrimCol(regexp_replace(col, " +", " "))
  }

  /** CPython str.strip() as a Column: strip the Python whitespace set. */
  def pyTrimCol(c: Column): Column = {
    val cls = "(?U)(?:^[\\s\\x1c-\\x1f]+|[\\s\\x1c-\\x1f]+$)"
    regexp_replace(c, cls, "")
  }
}
