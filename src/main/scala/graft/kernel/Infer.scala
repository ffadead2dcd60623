package graft.kernel

import graft.annotate.{Annotator, Gazetteer}
import graft.statements.Markers
import graft.tokenize.{BertTokenizer, BertVocab}

/** The reference's interactive inference entry points, re-expressed over
  * the engine's kernel trait (`src/tasks/infer.py:232-275`):
  *
  *  - [[inferOneSentence]]: the sentence already carries [E1]/[E2]
  *    markers — encode, locate the first marker positions
  *    (`get_e1e2_start`, `:225-230`), score one batch row, argmax label.
  *  - [[inferSentence]]: detect_entities=True — enumerate mention pairs
  *    (gazetteer hits, optionally + SVO heuristic pairs, mirroring
  *    `get_annotated_sents`, `:212-223`), insert markers with the
  *    string-matching `annotate_sent` port, classify each pair.
  *
  * These are driver-side conveniences over broadcastable parts; the
  * distributed path is `triples.TriplePipeline`.
  */
object Infer {

  /** `infer_one_sentence` — returns None when a marker vanishes (the
    * reference would throw IndexError on its `[0]`). */
  def inferOneSentence(
      tok: BertTokenizer,
      kernel: ScoringKernel,
      idx2rel: Map[Int, String])(sentence: String): Option[String] = {
    val ids = tok
      .convertTokensToIds(BertVocab.Cls +: tok.tokenize(sentence) :+ BertVocab.Sep)
      .toArray
    val e1Id = tok.convertTokenToId(BertVocab.E1)
    val e2Id = tok.convertTokenToId(BertVocab.E2)
    val e1 = ids.indexOf(e1Id)
    val e2 = ids.indexOf(e2Id)
    if (e1 < 0 || e2 < 0) None
    else {
      val logits = kernel.scoreBatch(Array((ids, e1, e2)))(0)
      Some(idx2rel(StubKernel.argmax(logits)))
    }
  }

  /** `infer_sentence(detect_entities=True)`: (subj, pred, obj) per
    * mention pair, pairs enumerated in permutation order like
    * `get_all_ent_pairs` (`infer.py:123-133`). */
  def inferSentence(
      tok: BertTokenizer,
      kernel: ScoringKernel,
      idx2rel: Map[Int, String],
      gaz: Gazetteer,
      svoMentions: Boolean = false)(sentence: String): Seq[(String, String, String)] = {
    val norm = graft.textnorm.Normalizer.normalize(sentence)
    val doc0 = Annotator.annotate("", norm, gaz)
    val doc =
      if (svoMentions) graft.triples.TriplePipeline.withSvoMentions(doc0) else doc0
    val ms = doc.mentions
    if (ms.length < 2) return Seq.empty
    for {
      a <- ms
      b <- ms
      if a.start != b.start
      annotated = Markers.annotateSent(doc.tokens, Seq(a.text), Seq(b.text))
      pred <- inferOneSentence(tok, kernel, idx2rel)(annotated)
    } yield (a.text, pred, b.text)
  }
}
