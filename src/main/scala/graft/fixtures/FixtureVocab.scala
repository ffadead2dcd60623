package graft.fixtures

/** Closed vocabulary shared by the synthetic page corpus (F1) and the
  * SemEval-format fixture (F2) — see FIXTURES.md. Everything is a pure
  * constant: fixtures must be reproducible from seed alone. */
object FixtureVocab {

  // Entity surface forms, stored lowercase (the pipeline normalizer
  // lowercases before mention detection). Raw pages render them Title Case.
  val People: Vector[String] = Vector(
    "john smith", "jane doe", "maria garcia", "wei chen", "amir khan",
    "lena fischer", "omar hassan", "eva novak")

  val Orgs: Vector[String] = Vector(
    "acme corp", "globex inc", "initech", "umbrella group",
    "stark industries", "wayne enterprises", "tyrell labs", "soylent co")

  val Places: Vector[String] = Vector(
    "berlin", "tokyo", "nairobi", "lima", "oslo", "denver", "quito", "perth")

  val Things: Vector[String] = Vector(
    "microphone", "signal", "engine", "turbine", "battery", "circuit",
    "novel", "melody", "sensor", "antenna", "valve", "piston", "lens",
    "crystal", "membrane", "filament")

  /** Entity with a digit — exercises the digit-reject rule
    * (`mtb_data_loader.py:572-574`). */
  val DigitEntity = "area 51"

  def kindOf(surface: String): String =
    if (People.contains(surface)) "PERSON"
    else if (Orgs.contains(surface)) "ORG"
    else if (Places.contains(surface)) "LOC"
    else "THING"

  /** All gazetteer entries (mention-detector dictionary). */
  val AllEntities: Vector[String] =
    People ++ Orgs ++ Places ++ Things :+ DigitEntity

  /** Directed relation templates: label → connector phrase. Connectors are
    * pairwise-distinct word sequences so a bag-of-words kernel can separate
    * the 19 classes deterministically (SURVEY.md §7.5 StubKernel). */
  val Templates: Vector[(String, String)] = Vector(
    "Cause-Effect(e1,e2)" -> "caused",
    "Cause-Effect(e2,e1)" -> "resulted from",
    "Instrument-Agency(e1,e2)" -> "is used by",
    "Instrument-Agency(e2,e1)" -> "operates the tool",
    "Product-Producer(e1,e2)" -> "was built by",
    "Product-Producer(e2,e1)" -> "manufactures",
    "Content-Container(e1,e2)" -> "was hidden inside",
    "Content-Container(e2,e1)" -> "holds",
    "Entity-Origin(e1,e2)" -> "departed from",
    "Entity-Origin(e2,e1)" -> "is the source of",
    "Entity-Destination(e1,e2)" -> "was moved into",
    "Entity-Destination(e2,e1)" -> "welcomed",
    "Component-Whole(e1,e2)" -> "is part of",
    "Component-Whole(e2,e1)" -> "comprises",
    "Member-Collection(e1,e2)" -> "joined",
    "Member-Collection(e2,e1)" -> "recruited",
    "Message-Topic(e1,e2)" -> "describes",
    "Message-Topic(e2,e1)" -> "inspired",
    "Other" -> "met yesterday near")

  val Labels: Vector[String] = Templates.map(_._1)

  /** splitmix64 — the deterministic per-row PRNG used by all fixtures. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def pick[T](xs: IndexedSeq[T], h: Long): T =
    xs(((h % xs.length + xs.length) % xs.length).toInt)

  def titleCase(surface: String): String =
    surface.split(' ').map(w => w.head.toUpper.toString + w.tail).mkString(" ")
}
