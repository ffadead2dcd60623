package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.SemEval
import graft.fixtures.SemEvalFixture
import graft.kernel.StubKernel
import graft.tokenize.{BertVocab, Vocab}

/** SemEval parser + label encoding + the StubKernel P/R gate, all against
  * goldens produced by the reference's Python semantics. */
class SemEvalSpec extends AnyFunSuite {

  private lazy val tok = Vocab.fixtureTokenizer
  private lazy val trainGold = GoldenUtil.lines("semeval_train.golden.jsonl")
  private lazy val testGold = GoldenUtil.lines("semeval_test.golden.jsonl")

  private def encodeSentence(sent: String): Seq[Int] =
    tok.convertTokensToIds(BertVocab.Cls +: tok.tokenize(sent) :+ BertVocab.Sep)

  test("parser output matches reference-processed sentences byte-for-byte") {
    val parsed = SemEval.parseLines(SemEvalFixture.trainLines.toIndexedSeq)
    assert(parsed.length == trainGold.length)
    parsed.zip(trainGold).foreach { case (ex, g) =>
      assert(ex.exampleId == GoldenUtil.long(g, "id"))
      assert(ex.sentence == GoldenUtil.str(g, "sent"), s"example ${ex.exampleId}")
      assert(ex.relation == GoldenUtil.str(g, "relation"))
    }
  }

  test("test-split parser honors the id-8000 sequence rule") {
    val parsed = SemEval.parseLines(SemEvalFixture.testLines.toIndexedSeq, idOffset = 8000)
    assert(parsed.nonEmpty && parsed.head.exampleId == 8001)
  }

  test("CLS + tokenize + SEP ids match reference tokenizer goldens") {
    SemEval.parseLines(SemEvalFixture.trainLines.toIndexedSeq)
      .zip(trainGold)
      .foreach { case (ex, g) =>
        assert(encodeSentence(ex.sentence) == GoldenUtil.intArray(g, "ids"),
          s"example ${ex.exampleId}")
      }
  }

  test("label encoding is first-appearance dense") {
    val (rel2idx, idx2rel) = SemEval.labelEncode(Seq("b", "a", "b", "c", "a"))
    assert(rel2idx == Map("b" -> 0, "a" -> 1, "c" -> 2))
    assert(idx2rel(0) == "b")
  }

  test("StubKernel trained on train split achieves P/R >= 0.95 on test split") {
    val train = SemEval.parseLines(SemEvalFixture.trainLines.toIndexedSeq)
    val test = SemEval.parseLines(SemEvalFixture.testLines.toIndexedSeq, idOffset = 8000)
    val (rel2idx, _) = SemEval.labelEncode(train.map(_.relation))
    val kernel = StubKernel.train(
      train.map(ex => (encodeSentence(ex.sentence), rel2idx(ex.relation))),
      rel2idx.size,
      tok.padId)
    val correct = test.count { ex =>
      val pred = StubKernel.argmax(kernel.scoreOne(encodeSentence(ex.sentence).toArray))
      pred == rel2idx(ex.relation)
    }
    val acc = correct.toDouble / test.length
    assert(acc >= 0.95, s"accuracy $acc (= micro P/R on full prediction set)")
  }
}
