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

  test("decodeHeader parses PNG/JPEG/GIF/WAV containers and rejects noise") {
    import graft.ops.Multimodal._
    val body = "payload-bytes".getBytes("UTF-8")
    val png = decodeHeader(pngPayload(1920, 1080, body))
    assert((png.kind, png.width, png.height) == ("png", 1920, 1080))
    assert(png.byteLen == 33L + body.length)
    val jpg = decodeHeader(jpegPayload(640, 480, body))
    assert((jpg.kind, jpg.width, jpg.height) == ("jpeg", 640, 480))
    val gif = decodeHeader(gifPayload(320, 200, body))
    assert((gif.kind, gif.width, gif.height) == ("gif", 320, 200))
    val wav = decodeHeader(wavPayload(44100, 2, body))
    assert((wav.kind, wav.width, wav.height) == ("wav", 44100, 2))
    val blob = decodeHeader("not a media file at all..............".getBytes)
    assert((blob.kind, blob.width, blob.height) == ("blob", 0, 0))
  }

  test("decodeHeader JPEG marker scan skips APP segments before SOF") {
    import graft.ops.Multimodal._
    // SOI + APP0 (JFIF, 16 bytes) + SOF0 — dims sit behind a skipped segment
    val app0 = Array[Int](0xff, 0xe0, 0x00, 0x10,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0).map(_.toByte)
    val sof = jpegPayload(800, 600, Array.emptyByteArray).drop(2) // strip SOI
    val payload = Array[Int](0xff, 0xd8).map(_.toByte) ++ app0 ++ sof
    val m = decodeHeader(payload)
    assert((m.kind, m.width, m.height) == ("jpeg", 800, 600))
    // truncated mid-scan stays total
    assert(decodeHeader(payload.take(6)).kind == "blob")
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
