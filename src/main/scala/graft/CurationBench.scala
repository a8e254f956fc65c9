package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.CurationPipeline

/** End-to-end curation throughput: documents at the given SF through the
  * full fluent chain to a shardpack corpus, per-stage rows and rows/sec
  * (BASELINE.md records the numbers — the north-star "curate a corpus"
  * demo, VERDICT r4 ask #7).
  *
  * Methodology: each stage is timed by materializing ITS OWN count after
  * the previous stage was cached — so a stage's number is its marginal
  * cost, not the whole prefix's. The final toShardpack timing includes the
  * write. Rows/sec is input-rows / stage-seconds (what a capacity planner
  * multiplies corpus size by).
  *
  * Usage: runMain graft.CurationBench [sfDir]
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    val benchmark = docs.filter(col("doc_id") % 100 === 0) // eval-suite stand-in

    println(s"[curation] corpus=$sfDir")
    var cur: DataFrame = docs.localCheckpoint()
    var rowsIn = cur.count()
    val t0 = System.nanoTime()

    def stage(name: String)(f: CurationPipeline => CurationPipeline): Unit = {
      // timer starts BEFORE f(): steps that eagerly run Spark jobs during
      // pipeline construction (rebalanceByLang's budget aggregation) must
      // be charged to their own stage, or the marginal-cost table lies
      val t = System.nanoTime()
      val stepped = f(CurationPipeline(cur)).result
      // localCheckpoint (eager): materializes AND truncates the logical
      // plan, so each stage is timed against materialized input and later
      // stages don't pay re-analysis of the whole prefix tree
      val next = stepped.localCheckpoint()
      val rowsOut = next.count()
      val sec = (System.nanoTime() - t) / 1e9
      cur = next
      println(f"[curation] $name%-22s in=$rowsIn%7d out=$rowsOut%7d " +
        f"time=$sec%6.2fs rate=${rowsIn / math.max(sec, 1e-9)}%,.0f rows/s")
      rowsIn = rowsOut
    }

    stage("filterLangs(en,de)")(_.filterLangs("en", "de"))
    stage("dedupExact")(_.dedupExact())
    stage("dropBoilerplate")(_.dropBoilerplate())
    stage("dedupNear")(_.dedupNear())
    stage("filterGopher")(_.filterGopher())
    stage("filterRepetition")(_.filterRepetition())
    // DSIR selection against the src0 stratum as the quality-corpus
    // stand-in; keep half — a selection gate, not a decimation, so the
    // later stages still see a meaningful corpus
    stage("selectDsir")(_.selectDsir(
      docs.filter(col("source") === "src0"), num = 1, den = 2))
    stage("rebalanceByLang")(_.rebalanceByLang())
    stage("decontaminate")(_.decontaminate(benchmark))
    stage("maskPii")(_.maskPii())
    stage("normalize")(_.normalize())
    stage("splitTrainTest")(_.splitTrainTest(90))

    // corpus write happens at DOCUMENT grain (shardpack keys per doc_id) —
    // timed before the chunk stage explodes the grain
    val outDir = Files.createTempDirectory("curation-out").toString
    val nDocs = rowsIn
    val tw = System.nanoTime()
    CurationPipeline(cur).toShardpack(outDir)
    val wSec = (System.nanoTime() - tw) / 1e9
    val written = spark.read.format("shardpack").load(outDir).count()
    println(f"[curation] toShardpack            out=$written%7d time=$wSec%6.2fs " +
      f"rate=${nDocs / math.max(wSec, 1e-9)}%,.0f rows/s")

    stage("chunk+packSequences")(_.chunk().packSequences(2048, shardDocs = 1000L))
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[curation] TOTAL time=$total%6.2fs")
    spark.stop()
  }
}
