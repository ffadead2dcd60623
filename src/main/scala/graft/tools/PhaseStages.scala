package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Per-stage timing/spill breakdown of the MTB wide chain's
  * filter_tokenize_encode phase at one parallelism level — which stage
  * doesn't scale 4→16 cores? Usage: PhaseStages <cores> [pages] */
object PhaseStages {

  final case class StageRow(
      id: Int, name: String, tasks: Int, wallMs: Long, runMs: Long,
      shufWriteMB: Double, shufReadMB: Double, spillMB: Double)

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(16)
    val s = graft.GraftSession.builder(cores, s"phase-stages-$cores")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val stages = ArrayBuffer.empty[StageRow]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        stages.synchronized {
          stages += StageRow(
            i.stageId, i.name.takeWhile(_ != '\n').take(60), i.numTasks, wall,
            m.executorRunTime,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
        }
      }
    })

    def corpus(limit: Long) = {
      import s.implicits._
      val df = s.read.parquet(
        s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-1000000.parquet")
      (if (limit > 0) df.limit(limit.toInt) else df).as[graft.schema.WebPage]
    }
    val sc = s.sparkContext
    def build(pages: org.apache.spark.sql.Dataset[graft.schema.WebPage]) =
      graft.statements.MtbDataset.build(
        s, pages,
        sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities)),
        sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer),
        minCount = 2, minPoolSize = 2)

    // warmup (JIT all stages)
    build(corpus(2000)).pools.count()
    s.catalog.clearCache()

    // phased run: force statements + dicts untimed, then capture stages
    // from filter_tokenize_encode onward, with a marker line per phase
    var capture = false
    val res = graft.statements.MtbDataset.build(
      s, corpus(0),
      sc.broadcast(new graft.annotate.Gazetteer(graft.fixtures.FixtureVocab.AllEntities)),
      sc.broadcast(graft.tokenize.Vocab.fixtureTokenizer),
      minCount = 2, minPoolSize = 2,
      probe = (name, thunk) => {
        if (name == "filter_tokenize_encode") {
          stages.synchronized(stages.clear())
          capture = true
        }
        val t0 = System.nanoTime()
        thunk().count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (capture) {
          val upTo = stages.synchronized(stages.map(_.id).maxOption.getOrElse(-1))
          println(f"PHASE $name cores=$cores wall=$sec%.2f s (stages <= $upTo)")
        }
      })
    println(f"${"id"}%4s ${"tasks"}%5s ${"wall_ms"}%8s ${"run_ms"}%8s ${"shW_MB"}%8s ${"shR_MB"}%8s ${"spill"}%8s  name")
    stages.sortBy(_.id).foreach { r =>
      println(f"${r.id}%4d ${r.tasks}%5d ${r.wallMs}%8d ${r.runMs}%8d ${r.shufWriteMB}%8.1f ${r.shufReadMB}%8.1f ${r.spillMB}%8.1f  ${r.name}")
    }
    s.stop()
  }
}
