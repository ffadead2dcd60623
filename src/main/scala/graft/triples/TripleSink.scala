package graft.triples

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._

import graft.schema.Triple

/** Partitioned triple materialization (north_star: "(subj, pred, obj)
  * triples into partitioned Iceberg output").
  *
  * Physical layout (SURVEY.md §4): hive-partitioned by predicate (19-way,
  * the natural query axis for KG consumers) with an explicit repartition so
  * file counts are controlled — without it every task writes every
  * partition and a 1000-executor run emits millions of small files. Iceberg
  * swap-in: replace write.parquet with writeTo(table).append — call sites
  * unchanged (sandbox has no Iceberg jar, SURVEY.md §7.6). */
object TripleSink {

  def write(
      triples: Dataset[Triple],
      path: String,
      filesPerPred: Int = 4,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    triples
      .withColumn("pred_part", regexp_replace(col("pred"), "[^A-Za-z0-9]+", "_"))
      .repartition(filesPerPred * 19, col("pred_part"), pmod(xxhash64(col("subj")), lit(filesPerPred)))
      .write
      .mode(mode)
      .partitionBy("pred_part")
      .parquet(path)
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): Dataset[Triple] = {
    import spark.implicits._
    spark.read.parquet(path).select("subj", "pred", "obj", "url").as[Triple]
  }
}
