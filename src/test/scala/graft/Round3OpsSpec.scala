package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.annotate.{Annotator, Gazetteer, NounPhrases}
import graft.triples.TriplePipeline

/** Round-3 operators: rule-based noun-phrase mentions (open-web recall). */
class Round3OpsSpec extends AnyFunSuite {

  test("NounPhrases finds capitalized chains and determiner phrases") {
    val toks =
      "Yesterday The New York Times reported that the execution engine beat a slow baseline"
        .split(" ").toSeq
    val got = NounPhrases.candidates(toks)
    // adjacent capitalized tokens form ONE maximal run
    assert(got.contains(("Yesterday The New York Times", 0, "cap")))
    // determiner phrase takes up to 3 word-like non-stopword tokens
    assert(got.contains(("execution engine beat", 8, "det")))
    assert(got.contains(("slow baseline", 12, "det")))
    assert(!got.exists(_._1 == "that"), "stopword leaked into candidates")
  }

  test("NounPhrases dedupes by surface, first occurrence wins") {
    val toks = "the spark engine and the spark engine again".split(" ").toSeq
    val got = NounPhrases.candidates(toks)
    assert(got.count(_._1 == "spark engine") == 1)
    assert(got.find(_._1 == "spark engine").get._2 == 1)
  }

  test("npMentions gives an out-of-gazetteer page a mention set") {
    val gaz = new Gazetteer(Seq("completely-absent-surface"))
    val doc = Annotator.annotate(
      "u1", "the probe station measured a cold plasma", gaz)
    assert(doc.mentions.isEmpty, "gazetteer should not match")
    val cfgOff = TriplePipeline.Config()
    val cfgOn = TriplePipeline.Config(npMentions = true)
    assert(TriplePipeline.filterMentions(doc, cfgOff).mentions.isEmpty)
    val np = TriplePipeline.filterMentions(doc, cfgOn).mentions
    assert(np.nonEmpty, "np source should supply mentions")
    assert(np.forall(_.kind == "NP"))
    assert(np.exists(_.text == "probe station measured") ||
      np.exists(_.text == "probe station"))
  }

  test("npMentions never overlaps existing gazetteer mentions") {
    val gaz = new Gazetteer(Seq("probe station"))
    val doc = Annotator.annotate(
      "u1", "the probe station measured a cold plasma", gaz)
    assert(doc.mentions.exists(_.text == "probe station"))
    val merged = TriplePipeline.filterMentions(
      doc, TriplePipeline.Config(npMentions = true)).mentions
    val covered = merged.flatMap(m => m.start to m.end)
    assert(covered.distinct.length == covered.length, s"overlap in $merged")
  }
}
