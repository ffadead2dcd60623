package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Corpus
import graft.textnorm.{ArticleAssembly, CleanSent, Normalizer, PyText}

/** Byte-identity golden tests for SURVEY.md §2.3-2.5: the goldens were
  * produced by executing the reference's Python pipeline semantics
  * (tools/make_goldens.py) over the same fixture pages. */
class TextNormSpec extends AnyFunSuite {

  private lazy val goldens = GoldenUtil.lines("text_norm.golden.jsonl")

  test("article assembly matches reference get_art_abs byte-for-byte") {
    goldens.foreach { g =>
      val id = GoldenUtil.long(g, "id")
      val raw = Corpus.rawText(id)
      val article = ArticleAssembly.assembleArticle(raw.split("\n", -1).toSeq)
      assert(article == GoldenUtil.str(g, "article"), s"page $id")
    }
  }

  test("_process_textlines + _clean_sent match reference byte-for-byte") {
    goldens.foreach { g =>
      val article = GoldenUtil.str(g, "article")
      val cleaned = CleanSent.processTextlines(Seq(article))
      assert(cleaned == GoldenUtil.str(g, "clean"), s"page ${GoldenUtil.long(g, "id")}")
    }
  }

  test("Normalizer.normalize matches reference byte-for-byte") {
    goldens.foreach { g =>
      val norm = Normalizer.normalize(GoldenUtil.str(g, "clean"))
      assert(norm == GoldenUtil.str(g, "norm"), s"page ${GoldenUtil.long(g, "id")}")
    }
  }

  test("clean_sent skips the reference's degenerate sentinels") {
    assert(CleanSent.cleanSent(" ").isEmpty)
    assert(CleanSent.cleanSent("\n").isEmpty)
    assert(CleanSent.cleanSent("").isEmpty)
    assert(CleanSent.cleanSent("  ").nonEmpty) // two spaces are NOT skipped
  }

  test("clean_sent unit semantics") {
    // uppercase special tokens removed; lowercase tags survive
    assert(CleanSent.cleanSent("a <FIL/> b <S> c").get == "a b c")
    // lowercase tags survive the uppercase-tag removal, but the '/' char is
    // in the punctuation class and becomes a space (reference behavior)
    assert(CleanSent.cleanSent("a <b>x</b> c").get == "a <b>x< b> c")
    // punctuation class to space + whitespace collapse
    assert(CleanSent.cleanSent("a *\"(b)\" c").get == "a b c")
    // repeated sentence punctuation collapses to the LAST char of the run
    assert(CleanSent.cleanSent("wait!!").get == "wait!")
    assert(CleanSent.cleanSent("wait!?").get == "wait?")
    assert(CleanSent.cleanSent("wait.,").get == "wait,")
    // ALLCAPS (>=2) to Capitalize; single capitals untouched
    assert(CleanSent.cleanSent("NASA and A Cat SAYS").get == "Nasa and A Cat Says")
    assert(CleanSent.cleanSent("ABCdef").get == "Abcdef")
  }

  test("normalize unit semantics") {
    assert(Normalizer.normalize("A <b>Bold</b> Move") == "a bold move")
    assert(Normalizer.normalize("go to http://x.test/a now") == "go to now")
    assert(Normalizer.normalize("go to www.x.test/a now") == "go to now")
    assert(Normalizer.normalize("  a   b  ") == "a b")
  }

  test("fix_missing_period quirks preserved") {
    assert(ArticleAssembly.fixMissingPeriod("has @highlight inside") == "has @highlight inside")
    assert(ArticleAssembly.fixMissingPeriod("") == "")
    assert(ArticleAssembly.fixMissingPeriod("ends well.") == "ends well.")
    assert(ArticleAssembly.fixMissingPeriod("no end") == "no end .")
    assert(ArticleAssembly.fixMissingPeriod("quote”") == "quote”")
  }

  test("article assembly drops everything after first @highlight (dead-reset quirk)") {
    val lines = Seq("first.", "@highlight", "summary one.", "second.", "third.")
    assert(ArticleAssembly.assembleArticle(lines) == "first.")
  }

  test("python whitespace semantics") {
    assert(PyText.pyStrip(" x ") == "x")
    assert(PyText.pySplit("a b  c").toSeq == Seq("a", "b", "c"))
    assert(PyText.pyCapitalize("HELLO") == "Hello")
    assert(PyText.pyCapitalize("") == "")
  }
}
