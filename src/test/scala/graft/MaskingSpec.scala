package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Span
import graft.statements.Masking
import graft.tokenize.Vocab

class MaskingSpec extends AnyFunSuite {

  private val tok = Vocab.fixtureTokenizer

  test("putBlanks replaces a span with one [BLANK] and shifts downstream span") {
    // ids: [CLS] a [E1] X Y [/E1] b [E2] Z [/E2] [SEP] -> spans inside markers
    val ids = Seq(1, 10, 2, 30, 31, 3, 11, 4, 40, 5, 6)
    val e1 = Span(3, 4) // X Y
    val e2 = Span(8, 8) // Z
    // alpha=1.0 forces both substitutions regardless of hash
    val (out, s1, s2) = Masking.putBlanks(ids, e1, e2, tok.blankId, 7L, 0, alpha = 1.0)
    assert(out.length == ids.length - 1) // two tokens -> one blank
    assert(out(s1.start) == tok.blankId)
    assert(out(s2.start) == tok.blankId)
    assert(s1 == Span(3, 3))
    assert(s2 == Span(7, 7)) // shifted left by 1
  }

  test("putBlanks with alpha=0 is identity") {
    val ids = Seq(1, 2, 3, 4, 5)
    val (out, s1, s2) = Masking.putBlanks(ids, Span(1, 1), Span(3, 3), tok.blankId, 7L, 0, alpha = 0.0)
    assert(out == ids && s1 == Span(1, 1) && s2 == Span(3, 3))
  }

  test("maskSequence never masks entity spans or their markers, is deterministic") {
    val ids = (100 until 140).toSeq
    val e1 = Span(5, 6)
    val e2 = Span(20, 21)
    val (masked, pos, labels, starts) =
      Masking.maskSequence(ids, e1, e2, tok.maskId, 42L, 1)
    val forbidden = (4 to 7) ++ (19 to 22)
    assert(pos.forall(p => !forbidden.contains(p)))
    assert(pos.nonEmpty)
    assert(labels == pos.map(ids))
    assert(starts == (4, 19))
    pos.foreach(p => assert(masked(p) == tok.maskId))
    // deterministic: same key -> same picks
    val again = Masking.maskSequence(ids, e1, e2, tok.maskId, 42L, 1)
    assert(again._2 == pos)
    // different epoch -> (almost surely) different picks
    val other = Masking.maskSequence(ids, e1, e2, tok.maskId, 42L, 2)
    assert(other._2 != pos)
  }

  test("length filter mirrors the reference 70-token cutoff") {
    assert(Masking.lengthOk(Seq.fill(70)(1)))
    assert(!Masking.lengthOk(Seq.fill(71)(1)))
  }
}
