package graft.tokenize

/** Vocabulary construction/loading (FIXTURES.md F3).
  *
  * `load_vocab` semantics from the reference (`bert_tokenizer.py:99-109`):
  * one token per line, line number = id. [[forWords]] builds a deterministic
  * fixture vocab: the classic specials, every printable ASCII char both as a
  * word-initial piece and a `##` continuation (so no in-domain word can ever
  * be [UNK]), then the supplied whole words sorted. */
object Vocab {

  def fromLines(lines: Seq[String]): Map[String, Int] =
    BertVocab.fromLines(lines)

  def forWords(words: Iterable[String]): Map[String, Int] = {
    val chars: Seq[String] =
      (33 to 126).map(_.toChar.toString) // printable ASCII sans space
    val pieces =
      BertVocab.SpecialTokens ++
        chars ++ chars.map("##" + _) ++
        words.toSeq.distinct.sorted
    // keep first occurrence if a single-char word collides with the char list
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    pieces.foreach(seen += _)
    seen.toSeq.zipWithIndex.toMap
  }

  /** Every word the fixtures can emit, post-normalization. */
  def fixtureWords: Seq[String] = {
    import graft.fixtures.FixtureVocab._
    val entityWords = AllEntities.flatMap(_.split(' '))
    val connectorWords = Templates.flatMap(_._2.split(' '))
    val gluWords = Seq(
      "the", "a", "this", "see", "www", "example", "com", "ref", "cnn",
      "b", "highlight", "trailing", "summary", "is", "dropped", "by",
      "article", "assembly")
    entityWords ++ connectorWords ++ gluWords
  }

  def fixtureVocab: Map[String, Int] = forWords(fixtureWords)

  def fixtureTokenizer: BertTokenizer = new BertTokenizer(fixtureVocab)
}
