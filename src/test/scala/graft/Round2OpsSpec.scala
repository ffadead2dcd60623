package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity}
import graft.statements.{Markers, MtbDataset, SplitmixRng}

/** Round-2 operator coverage: annotate_sent port, full negative-sampling
  * semantics, simhash hamming clustering (pigeonhole exactness), ANN LSH
  * recall. */
class Round2OpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("round2-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()


  // ---- annotate_sent (infer.py:172-210 port) ----

  test("annotateSent marks single-token entities with [E1]/[E2] once") {
    val s = Markers.annotateSent(
      Seq("alice", "met", "bob", "in", "berlin", "with", "bob"),
      Seq("alice"), Seq("bob"))
    assert(s == "[E1]alice[/E1] met [E2]bob[/E2] in berlin with bob")
  }

  test("annotateSent multi-token entities mark first and last tokens") {
    val s = Markers.annotateSent(
      Seq("the", "acme", "corp", "hired", "jane", "doe"),
      Seq("acme", "corp"), Seq("jane", "doe"))
    assert(s == "the [E1]acme corp[/E1] hired [E2]jane doe[/E2]")
  }

  test("annotateSent reference quirk: e1 match is tried before e2") {
    // when both entities share a token text, e1 wins the first occurrence
    val s = Markers.annotateSent(
      Seq("spark", "and", "spark"), Seq("spark"), Seq("spark"))
    assert(s == "[E1]spark[/E1] and [E2]spark[/E2]")
  }

  // ---- negative sampling (mtb_data_generator.py:161-193 semantics) ----

  private def tinyPools = {
    import spark.implicits._
    val pools = Seq(
      (1L, 2L, Seq(0L, 1L), "train"),
      (1L, 3L, Seq(2L, 3L), "train"),
      (4L, 5L, Seq(4L), "train"))
      .toDF("e1_id", "e2_id", "relation_ids", "set")
    val e1Pool = Seq(
      (1L, Seq(0L, 1L, 2L, 3L)), (4L, Seq(4L)))
      .toDF("e1_id", "relation_ids")
    val e2Pool = Seq(
      (2L, Seq(0L, 1L)), (3L, Seq(2L, 3L)), (5L, Seq(4L)))
      .toDF("e2_id", "relation_ids")
    (pools, e1Pool, e2Pool)
  }

  test("sampleNegatives avoids the SAMPLED positives and bounds size") {
    val (pools, e1Pool, e2Pool) = tinyPools
    val out = MtbDataset
      .sampleNegatives(pools, e1Pool, e2Pool, nRelations = 5, maxSize = 2, epoch = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](3)))
    assert(out.length == 3)
    // the reference collides fallback draws against pos_idxs — the
    // SAMPLED positives (mtb_data_generator.py:139,192), not the pool's
    // full positive list; mirror that exactly here
    val sampled = MtbDataset.samplePositives(pools, maxSize = 2, epoch = 0)
      .collect()
      .map(r => ((r.getAs[Long]("e1_id"), r.getAs[Long]("e2_id")), r.getAs[Long]("rid")))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    out.foreach { case (e1, e2, negs) =>
      assert(negs.nonEmpty, s"pool ($e1,$e2) got no negatives")
      assert(negs.size <= 2)
      assert(negs.toSet.intersect(sampled((e1, e2))).isEmpty,
        s"pool ($e1,$e2) drew its own sampled positives: $negs")
    }
  }

  test("sampleNegatives is deterministic under repartitioning") {
    val (pools, e1Pool, e2Pool) = tinyPools
    def run(parts: Int) = MtbDataset
      .sampleNegatives(
        pools.repartition(parts), e1Pool, e2Pool, nRelations = 5, maxSize = 2, epoch = 1)
      .orderBy("e1_id", "e2_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](3).toList))
      .toList
    assert(run(1) == run(7))
  }

  test("sampleNegatives epoch changes the draw") {
    val (pools, e1Pool, e2Pool) = tinyPools
    def run(epoch: Int) = MtbDataset
      .sampleNegatives(pools, e1Pool, e2Pool, nRelations = 5, maxSize = 2, epoch = epoch)
      .orderBy("e1_id", "e2_id")
      .collect()
      .map(r => r.getSeq[Long](3).toList)
      .toList
    assert((0 to 4).map(run).distinct.size > 1, "all epochs drew identically")
  }

  test("PortableRng Column mirror agrees with the Scala mirror bit-exactly") {
    import spark.implicits._
    import graft.statements.PortableRng
    val rows = for (e1 <- 0L to 12L; e2 <- 0L to 12L) yield (e1, e2)
    val df = rows.toDF("e1_id", "e2_id")
    val got = df.select(
      col("e1_id"), col("e2_id"),
      PortableRng.drawCol(
        PortableRng.keyCol(lit(42L), col("e1_id"), col("e2_id"), lit(0L)),
        lit(3L), col("e2_id")).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (e1, e2) =>
      val want = PortableRng.draw(PortableRng.key(42L, e1, e2, 0L), 3L, e2)
      assert(got((e1, e2)) == want, s"mismatch at ($e1,$e2)")
      assert(want >= 0 && want < PortableRng.M)
    }
  }

  test("PortableRng branch draw splits pools roughly in half") {
    import graft.statements.PortableRng
    val taken = (0 until 1000).count { i =>
      PortableRng.draw(PortableRng.key(42L, i.toLong, i.toLong + 7, 0L), 0L, 0L) > PortableRng.Half
    }
    assert(taken > 400 && taken < 600, s"branch bias: $taken/1000")
  }

  // ---- simhash hamming clustering ----

  test("simhashClusters equals brute-force hamming components (pigeonhole)") {
    import spark.implicits._
    val texts = Seq(
      (0L, "spark table join merge window stream vector customer query batch"),
      (1L, "spark table join merge window stream vector customer query batch"),
      (2L, "spark table join merge window stream vector customer query batches"),
      (3L, "an utterly different sentence about engines and turbines here"),
      (4L, "an utterly different sentence about engines and turbines there"),
      (5L, "completely unrelated text with nothing shared at all whatsoever"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashClusters(spark, texts, "doc_id", "text", maxDist = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))

    // brute force: all-pairs hamming <= 3 + union-find
    val sigs = texts.as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.simhash(graft.textnorm.PyText.pySplit(t).toSeq) }
    val parent = scala.collection.mutable.HashMap.empty[Long, Long] ++ sigs.map(s => s._1 -> s._1)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val want = sigs.map(s => (s._1, find(s._1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  // ---- losses (mtb_loss.py semantics) ----

  test("crossEntropySum matches hand computation and honors ignore_index") {
    import graft.kernel.Losses
    val logits = Array(Array(1.0, 2.0, 3.0), Array(0.5, 0.5, 0.5), Array(9.0, 1.0, 1.0))
    val labels = Array(2, -100, 0)
    // row0: logsumexp([1,2,3]) - 3 ; row1 ignored ; row2: logsumexp - 9
    def lse(a: Array[Double]) = { val m = a.max; m + math.log(a.map(x => math.exp(x - m)).sum) }
    val want = (lse(logits(0)) - 3.0) + (lse(logits(2)) - 9.0)
    assert(math.abs(Losses.crossEntropySum(logits, labels, -100) - want) < 1e-12)
  }

  test("bceWithLogitsSum matches the naive formula away from overflow") {
    import graft.kernel.Losses
    val x = Array(-1.5, 0.0, 2.0)
    val y = Array(0.0, 1.0, 1.0)
    def sig(v: Double) = 1.0 / (1.0 + math.exp(-v))
    val want = x.indices.map { i =>
      -(y(i) * math.log(sig(x(i))) + (1 - y(i)) * math.log(1 - sig(x(i))))
    }.sum
    assert(math.abs(Losses.bceWithLogitsSum(x, y) - want) < 1e-12)
  }

  test("blankLoss enumerates pos-pos then pos-neg dot products") {
    import graft.kernel.Losses
    val emb = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val labels = Array(1, 1, 0)
    // pos-pos: dot(e0,e1)=1 label 1 ; pos-neg: dot(e0,e2)=0, dot(e1,e2)=0 label 0
    val want = Losses.bceWithLogitsSum(Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0))
    assert(math.abs(Losses.blankLoss(emb, labels) - want) < 1e-12)
  }

  // ---- DenseId rank semantics (replaces the global ranking window) ----

  test("relation ids are the exact (docOrd, pairOrd) rank, contiguous from 0") {
    val sc = spark.sparkContext
    val ds = MtbDataset.build(
      spark, graft.fixtures.Corpus.generate(spark, 96),
      sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities)),
      sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer),
      minCount = 2, minPoolSize = 2)
    val rows = ds.tokenizedRelations
      .select("relation_id", "docOrd", "pairOrd")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = rows.sortBy(r => (r._2, r._3)).zipWithIndex
      .map { case ((_, d, p), i) => (i.toLong, d, p) }
    assert(rows.sortBy(_._1).toSeq == expected.toSeq)
  }

  test("DenseId output is invariant to input partitioning") {
    import spark.implicits._
    val base = (0 until 500).map(i => (i * 37 % 500, s"k$i"))
    def ids(parts: Int) = graft.ops.DenseId
      .withDenseId(base.toDF("ord", "key").repartition(parts), "id", col("ord"))
      .collect().map(r => (r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(ids(1) == ids(13))
  }

  // ---- marker-aware kernel (bert.py:257-266 gather analogue) ----

  test("MarkerAwareKernel separates classes a bag-of-tokens kernel cannot") {
    import graft.kernel.{MarkerAwareKernel, StubKernel}
    val pad = 0
    // identical token bags; only the marked positions differ by class
    val train = Seq(
      (Seq(5, 6, 7), 0, 1, 0), (Seq(5, 6, 7), 0, 1, 0),
      (Seq(5, 6, 7), 1, 2, 1), (Seq(5, 6, 7), 1, 2, 1))
    val bag = StubKernel.train(train.map(e => (e._1, e._4)), 2, pad)
    val aware = MarkerAwareKernel.train(train, 2, pad)
    val rows = Array((Array(5, 6, 7), 0, 1), (Array(5, 6, 7), 1, 2))
    val bagScores = bag.scoreBatch(rows)
    assert(bagScores(0).sameElements(bagScores(1)), "bag kernel should tie")
    val awareScores = aware.scoreBatch(rows)
    assert(StubKernel.argmax(awareScores(0)) == 0)
    assert(StubKernel.argmax(awareScores(1)) == 1)
  }

  test("MarkerAwareKernel is padding-invariant like the attention mask") {
    import graft.kernel.MarkerAwareKernel
    val train = Seq((Seq(5, 6, 7), 0, 2, 0), (Seq(7, 8, 9), 0, 2, 1))
    val k = MarkerAwareKernel.train(train, 2, padId = 0)
    val a = k.scoreBatch(Array((Array(5, 6, 7), 0, 2)))(0)
    val b = k.scoreBatch(Array((Array(5, 6, 7, 0, 0, 0), 0, 2)))(0)
    assert(a.sameElements(b))
  }

  // ---- directory-walk lineage + pool shuffle ----

  test("SemEval readWithLineage carries the source file per record") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semeval")
    java.nio.file.Files.writeString(
      dir.resolve("part1.txt"),
      "1\t\"the [E1]a[/E1] near [E2]b[/E2] .\"\nrel-a\nComment:\n\n" +
        "2\t\"the [E1]c[/E1] near [E2]d[/E2] .\"\nrel-b\nComment:\n\n")
    val rows = graft.eval.SemEval.readWithLineage(spark, dir.toString)
      .collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(0).endsWith("part1.txt")))
  }

  test("shuffledPools is a deterministic epoch-keyed permutation") {
    val (pools, _, _) = tinyPools
    def order(epoch: Int) = MtbDataset.shuffledPools(pools, epoch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(order(0) == order(0))
    assert(order(0).toSet == order(1).toSet)
  }

  // ---- graph materialization ----

  test("KgGraph nodes/edges are consistent with the triple multiset") {
    import spark.implicits._
    val triples = Seq(
      ("a", "likes", "b", "u1"), ("a", "likes", "b", "u2"),
      ("b", "sees", "c", "u1"), ("c", "sees", "a", "u3"))
      .toDF("subj", "pred", "obj", "url")
    val m = graft.triples.KgGraph.materialize(triples)
    val edges = m.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(edges.length == 3)
    assert(edges.map(_._4).sum == 4) // weights preserve the multiset
    val nodes = m.nodes.collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(nodes("a") == ((2L, 1L, 3L)))
    assert(nodes("b") == ((1L, 2L, 3L)))
    assert(nodes("c") == ((1L, 1L, 2L)))
    // edge endpoints resolve to node ids
    val ids = m.nodes.select("e_id").as[Long].collect().toSet
    assert(edges.forall(e => ids(e._1) && ids(e._2)))
  }

  // ---- interactive inference entry points (infer.py:232-275) ----

  test("inferOneSentence classifies a marker-bearing sentence") {
    val (kernel, _, idx2rel) = SparkEntry.trainedKernel
    val tok = graft.tokenize.Vocab.fixtureTokenizer
    val pred = graft.kernel.Infer.inferOneSentence(tok, kernel, idx2rel)(
      "the [E1]turbine[/E1] drives the [E2]valve[/E2] .")
    assert(pred.isDefined)
    assert(idx2rel.values.toSet.contains(pred.get))
    // markers vanished -> None, not a crash
    assert(graft.kernel.Infer.inferOneSentence(tok, kernel, idx2rel)(
      "no markers here .").isEmpty)
  }

  test("inferSentence enumerates mention pairs and labels each") {
    val (kernel, _, idx2rel) = SparkEntry.trainedKernel
    val tok = graft.tokenize.Vocab.fixtureTokenizer
    val gaz = new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities)
    val out = graft.kernel.Infer.inferSentence(tok, kernel, idx2rel, gaz)(
      "John Smith visited Berlin with a microphone.")
    val pairs = out.map(t => (t._1, t._3)).toSet
    // 3 mentions -> 6 ordered pairs
    assert(out.length == 6)
    assert(pairs.contains(("john smith", "berlin")))
    assert(out.forall(t => idx2rel.values.toSet.contains(t._2)))
  }

  // ---- per-epoch KPI series (2.29) ----

  test("CheckpointManager records a queryable per-epoch KPI series") {
    val root = java.nio.file.Files.createTempDirectory("graft_kpi").toString
    val cm = new graft.io.CheckpointManager(spark, root, "run-1")
    cm.logKpi(0, "loss", 2.5)
    cm.logKpi(1, "loss", 1.75)
    cm.logKpi(1, "f1", 0.5)
    val rows = cm.kpiSeries.collect()
      .map(r => (r.getString(2), r.getInt(1), r.getDouble(3)))
    assert(rows.toSeq == Seq(("f1", 1, 0.5), ("loss", 0, 2.5), ("loss", 1, 1.75)))
  }

  // ---- SVO fallback mention source in the pipeline ----

  test("svoMentions config yields statements on gazetteer-less pages") {
    import graft.triples.TriplePipeline
    val gaz = new graft.annotate.Gazetteer(Seq("zzz-not-present"))
    val doc = graft.annotate.Annotator.annotate(
      "u", "the turbine controls a valve near the membrane .", gaz)
    assert(doc.mentions.isEmpty)
    val off = TriplePipeline.filterMentions(doc, TriplePipeline.Config())
    assert(off.mentions.isEmpty)
    val on = TriplePipeline.filterMentions(
      doc, TriplePipeline.Config(svoMentions = true))
    // subject "turbine" (before verb "controls"), objects "valve",
    // "membrane", "." — non-stopword non-verb tokens after the verb
    assert(on.mentions.map(_.text).contains("turbine"))
    assert(on.mentions.map(_.text).contains("valve"))
    assert(on.mentions.forall(_.kind == "SVO"))
    val stmts = graft.statements.Windowing.statements(on, 0L, 40)
    assert(stmts.nonEmpty, "SVO mentions produced no statements")
  }

  test("svoMentions never duplicates gazetteer mentions") {
    import graft.triples.TriplePipeline
    val gaz = new graft.annotate.Gazetteer(Seq("turbine", "valve"))
    val doc = graft.annotate.Annotator.annotate(
      "u", "the turbine controls a valve near the membrane .", gaz)
    val on = TriplePipeline.filterMentions(
      doc, TriplePipeline.Config(svoMentions = true))
    val texts = on.mentions.map(_.text)
    assert(texts.distinct == texts)
    assert(on.mentions.filter(_.kind != "SVO").map(_.text) == Seq("turbine", "valve"))
  }

  // ---- streaming triple ingest ----

  test("TripleStream incremental ingest equals the batch pipeline") {
    import spark.implicits._
    val sc = spark.sparkContext
    val (kernel, _, idx2rel) = SparkEntry.trainedKernel
    val gaz = sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities))
    val tok = sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer)
    val kb = sc.broadcast(kernel: graft.kernel.ScoringKernel)
    val rb = sc.broadcast(idx2rel)

    val tmp = java.nio.file.Files.createTempDirectory("graft_tstream").toString
    val pages = graft.fixtures.Corpus.generate(spark, 64).collect()

    def runStream(): Unit = graft.streaming.TripleStream.run(
      spark, s"$tmp/pages", s"$tmp/triples", s"$tmp/ckpt", gaz, tok, kb, rb)

    // first dump: half the corpus
    pages.take(32).toSeq.toDS().write.mode("append").parquet(s"$tmp/pages")
    runStream()
    val afterFirst = graft.streaming.TripleStream.readTriples(spark, s"$tmp/triples").count()

    // second dump lands later; same checkpoint resumes incrementally
    pages.drop(32).toSeq.toDS().write.mode("append").parquet(s"$tmp/pages")
    runStream()

    val streamed = graft.streaming.TripleStream.readTriples(spark, s"$tmp/triples")
      .collect().map(_.toSeq).toSet
    val batch = graft.triples.TriplePipeline.run(
      spark, graft.fixtures.Corpus.generate(spark, 64), gaz, tok, kb, rb)
      .toDF().collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(afterFirst > 0 && afterFirst < streamed.size)
  }

  // ---- streaming file sink parity ----

  test("hourlyAggToPath file sink compacts to the memory-sink result") {
    val events = "/root/testdata/sf0.001/events.parquet"
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    graft.streaming.EventStream.hourlyAggToPath(
      spark, events, s"$tmp/out", s"$tmp/ckpt")
    val fromFiles = graft.streaming.EventStream.readHourlySink(spark, s"$tmp/out")
      .orderBy("hour", "event_type")
      .collect().map(_.toSeq).toSeq
    val fromMemory = graft.streaming.EventStream.hourlyAgg(spark, events)
      .orderBy("hour", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(fromFiles == fromMemory)
  }

  // ---- ANN LSH recall ----

  test("sessionizeToPath file sink equals the memory-sink sessions") {
    val events = "/root/testdata/sf0.001/events.parquet"
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess_sink").toString
    graft.streaming.EventStream.sessionizeToPath(
      spark, events, s"$tmp/out", s"$tmp/ckpt")
    val fromFiles = spark.read.parquet(s"$tmp/out")
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    val fromMemory = graft.streaming.EventStream.sessionize(spark, events)
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    assert(fromFiles == fromMemory)
    assert(fromFiles.nonEmpty)
  }

  test("ivfTopK recall >= 0.9 vs brute force on fixture vectors") {
    import spark.implicits._
    val rng = new SplitmixRng(11L)
    val vecs = (0 until 120).map { i =>
      val c = i % 8
      val v = Array.tabulate(16) { d =>
        val base = if (d % 8 == c) 1.0f else 0.1f
        base + (rng.nextDouble().toFloat - 0.5f) * 0.1f
      }
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 16)
    val exact = Similarity.bruteForceTopK(queries, df, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(spark, queries, df, 5, nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("embeddingClusters equals brute-force cosine components") {
    import spark.implicits._
    val rng = new SplitmixRng(23L)
    val vecs = (0 until 80).map { i =>
      val c = i % 4
      val v = Array.tabulate(16) { d =>
        val base = if (d % 4 == c) 1.0f else 0.05f
        base + (rng.nextDouble().toFloat - 0.5f) * 0.02f
      }
      (i.toLong, v)
    }
    val got = Dedup.embeddingClusters(spark, vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.95)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val parent = scala.collection.mutable.HashMap.empty[Long, Long] ++ vecs.map(v => v._1 -> v._1)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (a, va) <- vecs; (b, vb) <- vecs if a < b; if cos(va, vb) >= 0.95 } {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = vecs.map(v => (v._1, find(v._1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("bpeTokenCount matches a hand count") {
    import spark.implicits._
    val df = Seq((0L, "Spark 4.1 rocks!!"), (1L, "a b2c")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), graft.ops.TextStats.bpeTokenCount(col("text")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // "spark 4.1 rocks!!" -> [spark][ 4][.][1][ rocks][!!] = 6
    // "a b2c" -> [a][ b][2][c] = 4
    assert(got == Map(0L -> 6, 1L -> 4))
  }

  test("lshTopK multi-probe recall >= 0.9 vs brute force on fixture vectors") {
    import spark.implicits._
    val rng = new SplitmixRng(3L)
    // clustered vectors: 8 centroids + jitter so near-neighbors exist
    val vecs = (0 until 120).map { i =>
      val c = i % 8
      val v = Array.tabulate(16) { d =>
        val base = if (d % 8 == c) 1.0f else 0.1f
        base + (rng.nextDouble().toFloat - 0.5f) * 0.1f
      }
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 16)
    val exact = Similarity.bruteForceTopK(queries, df, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(spark, queries, df, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }
}
