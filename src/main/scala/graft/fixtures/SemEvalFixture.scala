package graft.fixtures

/** SemEval-2010 Task 8 format fixture (FIXTURES.md F2): 4 physical lines per
  * example, exactly the reference's format (`preprocessing_funcs.py:32-56`,
  * `semeval_dataloader.py:145-162`). Train ids start at 1 and are
  * consecutive; test ids start at 8001. Deterministic: pure function of the
  * example index. */
object SemEvalFixture {
  import FixtureVocab._

  val Seed = 4242L
  val TrainPerLabel = 12
  val TestPerLabel = 4

  /** Entity pools the templates draw from (all Things — matches the
    * original task's nominal style). */
  private def entityPair(h: Long): (String, String) = {
    val e1 = pick(Things, h >> 5)
    var e2 = pick(Things, h >> 11)
    if (e2 == e1) e2 = pick(Things, (h >> 11) + 1)
    (e1, e2)
  }

  /** One raw sentence with <e1>/<e2> markup for (labelIdx, variant). */
  def sentence(labelIdx: Int, variant: Int): String = {
    val (_, connector) = Templates(labelIdx)
    val h = mix(Seed + labelIdx * 1009L + variant * 31L)
    val (e1, e2) = entityPair(h)
    val lead = Math.floorMod(h >> 17, 3L) match {
      case 0 => "The"
      case 1 => "A"
      case _ => "This"
    }
    s"$lead <e1>$e1</e1> $connector the <e2>$e2</e2>."
  }

  case class Example(id: Int, sentence: String, relation: String)

  def trainExamples: Vector[Example] = {
    val out = Vector.newBuilder[Example]
    var id = 1
    var v = 0
    while (v < TrainPerLabel) {
      var l = 0
      while (l < Labels.length) {
        out += Example(id, sentence(l, v), Labels(l))
        id += 1
        l += 1
      }
      v += 1
    }
    out.result()
  }

  def testExamples: Vector[Example] = {
    val out = Vector.newBuilder[Example]
    var id = 8001
    var v = TrainPerLabel
    while (v < TrainPerLabel + TestPerLabel) {
      var l = 0
      while (l < Labels.length) {
        out += Example(id, sentence(l, v), Labels(l))
        id += 1
        l += 1
      }
      v += 1
    }
    out.result()
  }

  /** Render the reference's 4-line physical format. */
  def toLines(examples: Seq[Example]): Seq[String] =
    examples.flatMap { ex =>
      Seq(s"""${ex.id}\t"${ex.sentence}"""", ex.relation, "Comment:", "")
    }

  def trainLines: Seq[String] = toLines(trainExamples)
  def testLines: Seq[String] = toLines(testExamples)
}
