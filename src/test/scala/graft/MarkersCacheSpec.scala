package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Span
import graft.statements.Markers
import graft.tokenize.Vocab

/** Equivalence of the memoized per-token encode with the reference-shaped
  * joined-string tokenize across randomized statements. */
class MarkersCacheSpec extends AnyFunSuite {

  private val tok = Vocab.fixtureTokenizer

  test("encodeCached == joined-string tokenize semantics") {
    val r = new scala.util.Random(11)
    val vocabWords = graft.tokenize.Vocab.fixtureWords.toVector
    val cache = new java.util.HashMap[String, Markers.TokPieces]()
    (1 to 300).foreach { _ =>
      val n = 3 + r.nextInt(20)
      val words = Vector.fill(n)(
        if (r.nextDouble() < 0.8) vocabWords(r.nextInt(vocabWords.length))
        else (1 to 1 + r.nextInt(6)).map(_ => ('a' + r.nextInt(26)).toChar).mkString)
      val i1 = r.nextInt(n - 1)
      val i2 = i1 + 1 + r.nextInt(n - i1 - 1)
      // reference-shaped: tokenize the joined marker-bearing string
      val joined = Markers.addSpecialTokens(words, Span(i1, i1), Span(i2, i2)).mkString(" ")
      val viaJoined = tok.tokenize(joined)
      val viaCache = Markers.encodeCached(tok, cache)(words, Span(i1, i1), Span(i2, i2))
      val viaPlain = Markers.encode(tok)(words, Span(i1, i1), Span(i2, i2))
      assert(viaCache.map(_.tokenIds.toSeq) == viaPlain.map(_.tokenIds.toSeq))
      viaCache.foreach { enc =>
        assert(enc.tokenIds.toSeq == tok.convertTokensToIds(viaJoined))
      }
    }
  }

  test("embedded marker substrings inside words stay atomic both ways") {
    val words = Seq("pre[E1]post", "normal")
    val cache = new java.util.HashMap[String, Markers.TokPieces]()
    val a = Markers.encode(tok)(words, Span(0, 0), Span(1, 1))
    val b = Markers.encodeCached(tok, cache)(words, Span(0, 0), Span(1, 1))
    assert(a.map(_.tokenIds.toSeq) == b.map(_.tokenIds.toSeq))
  }
}
