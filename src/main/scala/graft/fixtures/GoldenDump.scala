package graft.fixtures

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dumps fixture inputs for the golden generator (tools/make_goldens.py),
  * which executes the REFERENCE's Python semantics over them and writes the
  * byte-identity goldens into src/test/resources/golden/. Run:
  *   sbt "runMain graft.fixtures.GoldenDump"
  *   python3 tools/make_goldens.py
  */
object GoldenDump {

  def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("target/golden_in")
    Files.createDirectories(dir)

    // 64 fixture pages (tiny size per FIXTURES.md)
    val pages = (0L until 64L).map { id =>
      s"""{"id":$id,"text":${jsonStr(Corpus.rawText(id))}}"""
    }
    Files.write(dir.resolve("pages.jsonl"), pages.mkString("\n").getBytes(StandardCharsets.UTF_8))

    // vocab in id order
    val vocab = graft.tokenize.Vocab.fixtureVocab.toSeq.sortBy(_._2).map(_._1)
    Files.write(dir.resolve("vocab.txt"), vocab.mkString("\n").getBytes(StandardCharsets.UTF_8))

    // SemEval fixture files
    Files.write(dir.resolve("semeval_train.txt"),
      (SemEvalFixture.trainLines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("semeval_test.txt"),
      (SemEvalFixture.testLines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))

    // tokenizer edge-case probes
    val probes = Seq(
      "the microphone caused the signal.",
      "naïve café jalapeño décor",
      "hello,world!!!don't stop",
      "中文字符 test 漢字",
      "x" * 150,
      "[CLS] the [E1] acme corp [/E1] was built by [E2] john smith [/E2] . [SEP]",
      "UPPER Case MiXeD",
      "a+b=c (parens) [brackets] {braces}",
      "multi  spaces\tand\ttabs",
      "trailing dots... and!! marks??",
      "the [E1]acme corp[/E1] holds the [E2]battery[/E2].",
      "")
    val probeJson = probes.map(p => s"""{"text":${jsonStr(p)}}""")
    Files.write(dir.resolve("tokenize_probes.jsonl"),
      probeJson.mkString("\n").getBytes(StandardCharsets.UTF_8))

    println(s"golden inputs written to $dir")
  }
}
