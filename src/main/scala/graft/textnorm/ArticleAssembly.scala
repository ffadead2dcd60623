package graft.textnorm

/** CNN/DailyMail-style article assembly — byte-identical re-expression of
  * the reference's `preprocess.py:7-68` (END_TOKENS, fix_missing_period,
  * get_art_abs).
  *
  * Quirk preserved on purpose (part of byte-identity, SURVEY.md §2.3): in
  * get_art_abs the `next_is_highlight = False` reset is unreachable (dead
  * code after `continue`), so once the first `@highlight` line is seen ALL
  * remaining lines are dropped — the "article" is everything before the
  * first highlight.
  */
object ArticleAssembly {

  /** Acceptable single-char sentence endings (`preprocess.py:7-18`).
    * The reference list also contains "..." which can never equal a single
    * trailing char — it is dead by construction and omitted here. */
  private val EndTokens: Set[Char] =
    Set('.', '!', '?', '\'', '`', '"', '’', '”', ')')

  /** `fix_missing_period` (`preprocess.py:29-40`). */
  def fixMissingPeriod(line: String): String =
    if (line.contains("@highlight")) line
    else if (line.isEmpty) line
    else if (EndTokens(line.charAt(line.length - 1))) line
    else line + " ."

  /** `get_art_abs` minus the file read (`preprocess.py:43-68`); input lines
    * are expected pre-stripped like read_text_file's `line.strip()`. */
  def assembleArticle(rawLines: Seq[String]): String = {
    val lines = rawLines.map(l => fixMissingPeriod(PyText.pyStrip(l)))
    val article = Seq.newBuilder[String]
    var seenHighlight = false
    lines.foreach { line =>
      if (line.isEmpty) ()
      else if (line.startsWith("@highlight")) seenHighlight = true
      else if (seenHighlight) () // unreachable-reset quirk: drop forever
      else {
        val idx = line.indexOf("(CNN) -- ")
        val l = if (idx > -1) line.substring(idx + "(CNN) -- ".length) else line
        article += l
      }
    }
    article.result().mkString(" ")
  }
}
