package graft.eval

import java.util.regex.Pattern

import graft.schema.SemEvalExample
import graft.textnorm.Normalizer

/** SemEval-2010 Task 8 record parser + label encoding — re-expression of
  * `src/tasks/preprocessing_funcs.py:32-56` (process_text, with its id
  * asserts as validations) and `dataloaders/semeval_dataloader.py:145-162`
  * (_preprocess_string: quoted-sentence extract, marker rewrite, normalize
  * — which lowercases the markers — then the [e1]→[E1] re-fix). */
object SemEval {

  private val quoted = Pattern.compile("\"(.+)\"")
  private val leadingId = Pattern.compile("^\\d+")

  /** Extract the quoted sentence (greedy, first match — re.findall[0]). */
  def extractQuoted(line: String): String = {
    val m = quoted.matcher(line)
    require(m.find(), s"no quoted sentence in: $line")
    m.group(1)
  }

  /** Marker rewrite + normalize + marker case re-fix. */
  def processSentence(raw: String): String = {
    var s = raw
    s = s.replace("<e1>", "[E1]").replace("</e1>", "[/E1]")
    s = s.replace("<e2>", "[E2]").replace("</e2>", "[/E2]")
    s = Normalizer.normalize(s)
    s = s.replace("[e1]", "[E1]").replace("[/e1]", "[/E1]")
    s = s.replace("[e2]", "[E2]").replace("[/e2]", "[/E2]")
    s
  }

  /** Parse the 4-line physical format. `firstIdBase` replicates the
    * reference's id-sequence asserts: train => ids are i+1, test =>
    * ids-8000 are i+1 (`preprocessing_funcs.py:42-46`); violations throw. */
  def parseLines(lines: IndexedSeq[String], idOffset: Int = 0): Seq[SemEvalExample] = {
    val n = lines.length / 4
    (0 until n).map { i =>
      val sentLine = lines(4 * i)
      val relation = lines(4 * i + 1).trim
      val comment = lines(4 * i + 2)
      val m = leadingId.matcher(sentLine)
      require(m.find(), s"record $i: no leading id")
      val id = m.group().toInt
      require(id - idOffset == i + 1, s"record $i: id $id out of sequence")
      require(comment.startsWith("Comment"), s"record $i: bad comment line")
      SemEvalExample(id, processSentence(extractQuoted(sentLine)), relation)
    }
  }

  /** File-based source (§2.1/2.2): wholetext read keeps the 4-line record
    * structure intact per file; directories/globs are handled by Spark's
    * parallel file listing. Records parse per-file, distributed. */
  def read(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idOffset: Int = 0): org.apache.spark.sql.Dataset[SemEvalExample] = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .textFile(path)
      .flatMap(content => parseLines(content.split("\n", -1).toIndexedSeq, idOffset))
  }

  /** Directory-walk source WITH per-record lineage (§2.2): the same
    * wholetext glob read plus `input_file_name`, so every parsed example
    * carries its source file into the checkpoint/metrics tables (the
    * per-partition lineage the north rule requires). */
  def readWithLineage(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idOffset: Int = 0): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .textFile(path)
      .select(
        org.apache.spark.sql.functions.input_file_name().as("src_file"),
        org.apache.spark.sql.functions.col("value"))
      .as[(String, String)]
      .flatMap { case (file, content) =>
        parseLines(content.split("\n", -1).toIndexedSeq, idOffset)
          .map(ex => (file, ex.exampleId, ex.sentence, ex.relation))
      }
      .toDF("src_file", "example_id", "sentence", "relation")
  }

  /** First-appearance label encoding (`semeval_dataloader.py:89-99`):
    * pandas .unique() preserves encounter order. */
  def labelEncode(relations: Seq[String]): (Map[String, Int], Map[Int, String]) = {
    val rel2idx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    relations.foreach { r =>
      if (!rel2idx.contains(r)) rel2idx(r) = rel2idx.size
    }
    (rel2idx.toMap, rel2idx.map(_.swap).toMap)
  }
}
