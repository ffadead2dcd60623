package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Span
import graft.statements.Markers
import graft.tokenize.Vocab

/** Property tests (SURVEY.md §5) — seeded generator loops (the
  * scalatest/scalacheck bridge artifact is not in the offline cache, so
  * properties are driven by an explicit deterministic generator). */
class PropertySpec extends AnyFunSuite {

  private val tok = Vocab.fixtureTokenizer
  private val Iters = 200

  private def rng(seed: Int) = new scala.util.Random(seed)

  private def word(r: scala.util.Random): String =
    (1 to (1 + r.nextInt(10))).map(_ => ('a' + r.nextInt(26)).toChar).mkString

  private def sentence(r: scala.util.Random): Vector[String] =
    (0 to r.nextInt(28)).map(_ => word(r)).toVector

  test("tokensToString inverts tokenize modulo ## for space-joined words") {
    val r = rng(1)
    (1 to Iters).foreach { _ =>
      val s = sentence(r).mkString(" ")
      assert(tok.tokensToString(tok.tokenize(s)) == s)
    }
  }

  test("token ids round-trip through convertIdToToken") {
    val r = rng(2)
    (1 to Iters).foreach { _ =>
      val toks = tok.tokenize(sentence(r).mkString(" "))
      assert(tok.convertTokensToIds(toks).map(tok.convertIdToToken) == toks)
    }
  }

  test("marker insertion adds exactly 6 tokens and preserves window tokens") {
    val r = rng(3)
    (1 to Iters).foreach { _ =>
      val words = sentence(r)
      val n = words.length
      if (n >= 2) {
        val i1 = r.nextInt(n)
        var i2 = r.nextInt(n)
        if (i2 == i1) i2 = (i1 + 1) % n
        val out = Markers.addSpecialTokens(words, Span(i1, i1), Span(i2, i2))
        assert(out.length == n + 6)
        assert(out.filterNot(
          Set("[CLS]", "[SEP]", "[E1]", "[/E1]", "[E2]", "[/E2]")) == words)
      }
    }
  }

  test("encoded spans always point inside their markers and in bounds") {
    val r = rng(4)
    (1 to Iters).foreach { _ =>
      val words = sentence(r)
      val n = words.length
      if (n >= 3) {
        val i1 = r.nextInt(n - 1)
        val i2 = i1 + 1 + r.nextInt(n - i1 - 1)
        Markers.encode(tok)(words, Span(i1, i1), Span(i2, i2)).foreach { enc =>
          val pieces = enc.tokenIds.toSeq.map(tok.convertIdToToken)
          assert(enc.e1Span.start > 0 && enc.e2Span.end < pieces.length - 1)
          assert(pieces(enc.e1Span.start - 1) == "[E1]")
          assert(pieces(enc.e1Span.end + 1) == "[/E1]")
          assert(pieces(enc.e2Span.start - 1) == "[E2]")
          assert(pieces(enc.e2Span.end + 1) == "[/E2]")
        }
      }
    }
  }

  test("fingerprint is stable and within modulus") {
    val r = rng(5)
    (1 to Iters).foreach { _ =>
      val s = org.apache.spark.unsafe.types.UTF8String
        .fromString(sentence(r).mkString(" "))
      val h = graft.ops.FingerprintExpr.hash(s)
      assert(h >= 0 && h < graft.ops.FingerprintExpr.Mod)
      assert(h == graft.ops.FingerprintExpr.hash(s))
    }
  }

  test("minhash similarity estimate tracks exact jaccard within 0.25") {
    import graft.link.MinHashLSH
    val r = rng(6)
    (1 to 100).foreach { _ =>
      val base = sentence(r) ++ sentence(r)
      val mutated = base.map(w => if (r.nextDouble() < 0.2) word(r) else w)
      val a = MinHashLSH.wordShingles(base.mkString(" "), 2)
      val b = MinHashLSH.wordShingles(mutated.mkString(" "), 2)
      val est = MinHashLSH.estJaccard(
        MinHashLSH.signature(a, 128), MinHashLSH.signature(b, 128))
      val exact = MinHashLSH.exactJaccard(a, b)
      assert(math.abs(est - exact) <= 0.25, s"est=$est exact=$exact")
    }
  }

  test("windowing gap invariant: emitted pairs always satisfy 1<=gap<=window") {
    import graft.schema.{AnnotatedDoc, Mention}
    import graft.statements.Windowing
    val r = rng(7)
    (1 to 100).foreach { _ =>
      val toks = sentence(r) :+ "."
      val n = toks.length
      val mentionIdx = (0 until n).filter(_ => r.nextDouble() < 0.3)
      val doc = AnnotatedDoc(
        "u", toks,
        toks.map(t => t == "."),
        toks.zipWithIndex.map { case (t, i) => t == "." || i == n - 1 },
        mentionIdx.map(i => Mention(i, i, toks(i), "T")))
      Windowing.statements(doc, 0L, 40).foreach { st =>
        val gap = st.e2s - st.e1e
        val m1 = doc.tokens(mentionIdx.find(i => doc.tokens(i) == st.e1).get)
        assert(st.tokens.length <= 40)
        assert(st.e1s >= 0 && st.e2e < st.tokens.length)
        assert(st.tokens(st.e1s) == st.e1 && st.tokens(st.e2s) == st.e2)
        val _ = (gap, m1)
      }
    }
  }
}
