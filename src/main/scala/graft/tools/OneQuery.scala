package graft.tools
import java.nio.file.{Files, Paths}
/** Run a single SparkEntry query + write parquet (for targeted re-checks). */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = graft.GraftSession.get(8, "onequery")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val q = graft.SparkEntry.oracleSql.get(name)
    q.foreach { sql =>
      val esc = sql.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\t' => "\\t"; case '\r' => "\\r"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), s"""{"$name": "$esc"}""")
    }
    spark.stop()
  }
}
