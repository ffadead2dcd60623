package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing probe for the canonical-triples path (q41) — finds
  * where the wall-clock goes without the (disabled) Spark UI. */
object ProbeCanonical {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(32, "probe-canonical")
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val sc = spark.sparkContext
    val (kernel, _, idx2rel) = graft.SparkEntry.trainedKernel
    val triples = graft.triples.TriplePipeline.run(
      spark,
      graft.fixtures.Corpus.generate(spark, 512),
      sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities)),
      sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer),
      sc.broadcast(kernel: graft.kernel.ScoringKernel),
      sc.broadcast(idx2rel)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    t("triples materialize")(triples.count())

    val eDim = triples.select(col("subj").as("e_text"))
      .unionAll(triples.select(col("obj").as("e_text")))
      .distinct()
      .withColumn("e_id", xxhash64(col("e_text")))
    t("eDim distinct")(eDim.count())

    val eCached = eDim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("eDim persist count")(eCached.count())

    val edges = graft.link.MinHashLSH.similarPairs(
      spark, eCached, "e_id", "e_text", threshold = 0.7)
    t("similarPairs edges")(edges.count())

    val comps = t("connected components")(
      graft.link.ConnectedComponents.run(spark, edges
        .select(col("id_a").as("src"), col("id_b").as("dst"))))
    t("components count")(comps.count())

    val linked = graft.link.EntityLinker.canonicalize(spark, eCached, threshold = 0.7)
    t("canonicalize full")(linked.count())

    val out = graft.link.EntityLinker.canonicalizeTriples(triples, linked)
    t("canonicalizeTriples")(out.count())

    t("q41 end-to-end (query fn)")(
      graft.SparkEntry.queries("q41_kg_triples_canonical")(spark, "/root/testdata/sf0.1").count())

    // mirror of the q41 body, each action timed (finds where the fn's
    // wall-clock goes — the stages above are the probe's own direct calls,
    // NOT the query path, which routes through the regime-probed linker)
    {
      import org.apache.spark.storage.StorageLevel
      spark.catalog.clearCache()
      val raw = t("b:kgTriples raw persist") {
        val r = graft.SparkEntry.kgTriples(spark, 512, canonical = false)
          .persist(StorageLevel.MEMORY_AND_DISK)
        r.count(); r
      }
      val canon = t("b:canonicalizeKg persist") {
        val c = graft.SparkEntry.canonicalizeKg(spark, raw).persist(StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val rawSurf = raw.select(col("subj").as("sf"))
        .union(raw.select(col("obj").as("sf"))).distinct()
      val canonSurf = canon.select(col("subj").as("sf"))
        .union(canon.select(col("obj").as("sf"))).distinct()
      t("b:invented anti-join")(canonSurf.join(rawSurf, Seq("sf"), "left_anti").count())
      t("b:countDelta")(canon.count() - raw.count())
      t("b:digest collect")(canon.agg(count(lit(1))).head())
      val variantDim = rawSurf.select(col("sf").as("e_text"))
        .union(rawSurf.select(concat(col("sf"), lit(" co")).as("e_text")))
        .distinct()
        .withColumn("e_id", xxhash64(col("e_text")))
      val linkedV = t("b:variant canonicalize")(
        graft.link.EntityLinker.canonicalize(spark, variantDim, threshold = 0.7))
      val canonV = graft.link.EntityLinker.canonicalizeTriples(raw, linkedV)
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("b:variant exceptAll")(canonV.exceptAll(raw).count())
      t("b:variant digest")(canonV.agg(count(lit(1))).head())
    }

    spark.stop()
  }
}
