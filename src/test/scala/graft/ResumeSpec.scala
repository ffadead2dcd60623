package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.annotate.Gazetteer
import graft.eval.SemEval
import graft.fixtures.{Corpus, FixtureVocab, SemEvalFixture}
import graft.kernel.ScoringKernel
import graft.tokenize.Vocab
import graft.triples.Checkpointed

/** North-rule resumability: kill-after-stage-k — a restarted run over the
  * same checkpoint root must reuse completed stages and produce IDENTICAL
  * triples. */
class ResumeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("resume-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("checkpointed pipeline resumes mid-pipeline with identical triples") {
    val sc = spark.sparkContext
    val (kernel, _, idx2rel) = SparkEntry.trainedKernel
    val root = Files.createTempDirectory("graft_resume").toString
    def run(runId: String) = Checkpointed.run(
      spark, Corpus.generate(spark, 48),
      sc.broadcast(new Gazetteer(FixtureVocab.AllEntities)),
      sc.broadcast(Vocab.fixtureTokenizer),
      sc.broadcast(kernel: ScoringKernel),
      sc.broadcast(idx2rel),
      root, runId)

    val first = run("run1").collect().toSet
    assert(first.nonEmpty)

    // "crash" after stage 2: drop only the final stage, keep the others
    val mgr = new graft.io.CheckpointManager(spark, root, "x")
    assert(mgr.isComplete("statements") && mgr.isComplete("scored"))
    mgr.invalidate("triples")

    val resumed = run("run2").collect().toSet
    assert(resumed == first, "resume must reproduce identical triples")

    // lineage metrics exist for every stage
    val stages = mgr.metrics.select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("statements", "scored", "triples"))
  }

  test("SemEval file source parses distributed (wholetext)") {
    val dir = Files.createTempDirectory("graft_semeval")
    Files.write(dir.resolve("train.txt"),
      (SemEvalFixture.trainLines.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val parsed = SemEval.read(spark, dir.toString + "/train.txt").collect()
    assert(parsed.length == SemEvalFixture.trainExamples.length)
    assert(parsed.map(_.exampleId).min == 1)
  }
}
