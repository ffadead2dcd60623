package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tokenize.{BertVocab, Vocab}

/** WordPiece tokenizer goldens: produced by exec'ing the REFERENCE's own
  * BasicTokenizer/WordpieceTokenizer classes (tools/make_goldens.py) over
  * edge-case probes and fixture pages. */
class TokenizerSpec extends AnyFunSuite {

  private lazy val tok = Vocab.fixtureTokenizer

  test("tokenize matches reference tokens and ids on all goldens") {
    GoldenUtil.lines("tokenize.golden.jsonl").foreach { g =>
      val text = GoldenUtil.str(g, "text")
      val expTokens = GoldenUtil.strArray(g, "tokens")
      val expIds = GoldenUtil.intArray(g, "ids")
      val got = tok.tokenize(text)
      assert(got == expTokens, s"tokens for <$text>")
      assert(tok.convertTokensToIds(got) == expIds, s"ids for <$text>")
    }
  }

  test("added tokens are atomic and ids follow base vocab") {
    val n = tok.vocabSize
    assert(tok.convertTokenToId(BertVocab.E1) == n)
    assert(tok.convertTokenToId(BertVocab.E1End) == n + 1)
    assert(tok.convertTokenToId(BertVocab.E2) == n + 2)
    assert(tok.convertTokenToId(BertVocab.E2End) == n + 3)
    assert(tok.convertTokenToId(BertVocab.Blank) == n + 4)
    assert(tok.tokenize("[E1]acme[/E1]").take(1) == Seq("[E1]"))
  }

  test("e1/e2 marker ids differ (reference invariant mtb_data_loader.py:78-79)") {
    assert(tok.e1Id != tok.e2Id)
  }

  test("greedy longest-match with ## continuations") {
    val pieces = tok.wordpiece("acme")
    assert(pieces.nonEmpty)
    assert(pieces == Seq("acme")) // whole fixture word resolves as one piece
    val unseen = tok.wordpiece("zzqy")
    assert(unseen == Seq("z", "##z", "##q", "##y"))
  }

  test(">100 char token becomes [UNK]") {
    assert(tok.wordpiece("x" * 101) == Seq(BertVocab.Unk))
  }

  test("convert_tokens_to_string inverse modulo ## (bert_tokenizer.py:241-246)") {
    val s = "the acme corp holds the battery ."
    assert(tok.tokensToString(tok.tokenize(s)) == s)
  }
}
