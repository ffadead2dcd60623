package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.annotate.{Annotator, Gazetteer, NounPhrases}
import graft.triples.TriplePipeline

/** Round-3 operators: rule-based noun-phrase mentions (open-web recall),
  * real container-header decode, artifact-loading scoring kernel. */
class Round3OpsSpec extends AnyFunSuite {

  private lazy val spark =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("round3-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

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

  test("ArtifactKernel round-trips through the binary dump bit-exactly") {
    import graft.kernel.ArtifactKernel
    val examples = Seq(
      (Seq(1, 5, 7, 2), 1, 2, 0),
      (Seq(1, 6, 8, 2), 1, 2, 1),
      (Seq(1, 5, 8, 2), 1, 2, 0))
    val fitted = ArtifactKernel.fit(examples, nClasses = 2, padId = 0, dim = 8)
    val path = java.nio.file.Files.createTempFile("graft_kernel", ".bin")
    ArtifactKernel.write(fitted, path)
    val loaded = ArtifactKernel.load(path)
    val batch = examples.map(e => (e._1.toArray, e._2, e._3)).toArray
    val a = fitted.scoreBatch(batch)
    val b = loaded.scoreBatch(batch)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("artifact kernel P/R >= 0.95 on SemEval via the distributed path") {
    import spark.implicits._
    import graft.eval.SemEval
    import graft.fixtures.SemEvalFixture
    import graft.kernel.{ArtifactKernel, Inference, ScoringKernel}
    import graft.tokenize.{BertVocab, Vocab}
    val tok = Vocab.fixtureTokenizer
    def enc(s: String) =
      tok.convertTokensToIds(BertVocab.Cls +: tok.tokenize(s) :+ BertVocab.Sep)
    val train = SemEval.parseLines(SemEvalFixture.trainLines.toIndexedSeq)
    val test = SemEval.parseLines(SemEvalFixture.testLines.toIndexedSeq, idOffset = 8000)
    val (rel2idx, _) = SemEval.labelEncode(train.map(_.relation))
    // the gather slots stay empty (pos = -1) on this fixture: its relation
    // labels are determined by the CONNECTOR word, so under STATIC token
    // embeddings the entity gathers only inject noise (measured: 0.08 acc
    // with gathers vs 0.99 without). A contextual-weights artifact would
    // flip that; the head shape itself is exercised by the round-trip test.
    val fitted = ArtifactKernel.fit(
      train.map(ex => (enc(ex.sentence), -1, -1, rel2idx(ex.relation))),
      rel2idx.size, tok.padId)
    // serve from the ARTIFACT, not the fitted object — the load path is
    // the surface under test
    val path = java.nio.file.Files.createTempFile("graft_kernel_semeval", ".bin")
    ArtifactKernel.write(fitted, path)
    val served = ArtifactKernel.load(path)
    val kB = spark.sparkContext.broadcast(served: ScoringKernel)
    val inputs = spark.createDataset(test.map { ex =>
      Inference.ScoreInput(ex.exampleId, enc(ex.sentence), -1, -1)
    })
    val preds = Inference.classify(spark, inputs, kB, tok.padId).toDF("id", "pred")
    val gold = spark.createDataset(test.map(ex => (ex.exampleId, rel2idx(ex.relation))))
      .toDF("id", "gold")
    val prf = graft.eval.Metrics.microPRF(preds, gold)
    assert(prf.precision >= 0.95 && prf.recall >= 0.95, prf.toString)
  }

  test("GradAccum assigns reference accumulation boundaries deterministically") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rel = (0L until 100L).toDF("relation_id")
    // batch 10, mini 4 -> optimizer fires every ceil(10/4) = 3 micro-batches
    def run(parts: Int) = graft.statements.GradAccum
      .assign(rel.repartition(parts), "relation_id", batchSize = 10, miniBatchSize = 4, epoch = 1)
      .orderBy("relation_id")
      .collect()
      .map(r => (r.getAs[Long]("relation_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("micro_batch"), r.getAs[Long]("accum_step")))
      .toList
    val a = run(2)
    assert(a == run(7), "assignment depends on partitioning")
    assert(a.map(_._2).sorted == (0L until 100L).toList, "rank is a permutation")
    a.foreach { case (_, rank, micro, step) =>
      assert(micro == rank / 4)
      assert(step == micro / 3)
    }
    // epoch changes the shuffle order
    val b = graft.statements.GradAccum
      .assign(rel, "relation_id", 10, 4, epoch = 2)
      .orderBy("relation_id").collect().map(_.getAs[Long]("rank")).toList
    assert(b != a.map(_._2), "epoch did not reshuffle")
    val scale = graft.statements.GradAccum.assign(rel, "relation_id", 10, 4, 1)
      .select(col("loss_scale")).distinct().collect()
    assert(scale.map(_.getDouble(0)).toList == List(0.1))
  }

  test("KernelCheckpoint saves per-epoch artifacts and resumes the latest") {
    import graft.kernel.{ArtifactKernel, KernelCheckpoint}
    val dir = java.nio.file.Files.createTempDirectory("graft_kernel_ckpt")
    assert(KernelCheckpoint.loadLatest(dir).isEmpty)
    val examples = Seq((Seq(1, 5, 7, 2), 1, 2, 0), (Seq(1, 6, 8, 2), 1, 2, 1))
    val kernels = (0 to 2).map { e =>
      val k = ArtifactKernel.fit(examples.take(e + 1) ++ examples, 2, padId = 0, dim = 8)
      KernelCheckpoint.save(k, dir, e)
      k
    }
    val Some((epoch, resumed)) = KernelCheckpoint.loadLatest(dir)
    assert(epoch == 2)
    val batch = examples.map(e => (e._1.toArray, e._2, e._3)).toArray
    assert(resumed.scoreBatch(batch).zip(kernels(2).scoreBatch(batch))
      .forall { case (x, y) => x.sameElements(y) })
    // all three epoch artifacts exist on disk
    (0 to 2).foreach { e =>
      assert(java.nio.file.Files.exists(dir.resolve(f"kernel_epoch_$e%05d.bin")))
    }
  }

  test("salted pool collection handles a Zipf-hot key and matches unsalted semantics") {
    import spark.implicits._
    // one pair owns 97% of the facts — the skew shape salting exists for
    val hot = (0L until 30000L).map(i => (1L, 2L, i)) ++
      (0L until 1000L).map(i => (3L, 4L, 30000L + i))
    val df = hot.toDF("e1_id", "e2_id", "relation_id")
    val pools = graft.statements.Encode.pools(df.repartition(8))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Long](2))).toMap
    assert(pools((1L, 2L)) == (0L until 30000L))
    assert(pools((3L, 4L)) == (30000L until 31000L))
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
