package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{CrossHash => H}
import graft.llm.VectorIndex

/** Design-point probe for the frame-held centroid branch (VERDICT r11
  * #7): the registered corpora never push the derived cell count past
  * [[VectorIndex.CellAssignJoinCutover]] (K = 100 at sf10), so the
  * >64k-centroid pruned-join path — the 1e9+-embedding story — was
  * spec-pinned at K = 200 with a forced cutover but never executed at its
  * actual design point. This main synthesizes a deterministic index,
  * takes K PAST the real 65,536 cutover, and runs the whole branch
  * end-to-end: distributed cold-start frame → one fully-distributed Lloyd
  * round → [[VectorIndex.assignCellsJoin]] through the
  * [[graft.functions.CoarseProbe]] codegen expression under GENUINE
  * pruning (probe ≪ K1 groups), recording wall time, task count, peak
  * task memory, and shuffle — and asserting the executed plan carries the
  * broadcast-handle expression, not a K-sized literal.
  *
  * Usage: runMain graft.CoarseProbeScale [nVectors] [K] [dim]
  * (defaults 100000 / 70000 / 16)
  */
object CoarseProbeScale {

  def main(args: Array[String]): Unit = {
    val nVec = if (args.length > 0) args(0).toLong else 100000L
    val k = if (args.length > 1) args(1).toInt else 70000
    val dim = if (args.length > 2) args(2).toInt else 16
    require(k > VectorIndex.CellAssignJoinCutover,
      s"design point demands K past the cutover (${VectorIndex.CellAssignJoinCutover})")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var tasks = 0L
    var maxPeak = 0L
    var shuffleRead = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) synchronized {
          tasks += 1
          maxPeak = math.max(maxPeak, m.peakExecutionMemory)
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
        }
      }
    })

    // deterministic synthetic index: v_j = affine_j(vec_id) mod 2001 −
    // 1000 (fixed-point longs, the embeddings table's representation)
    val eq = spark.range(nVec).toDF("vec_id")
      .withColumn("v", array((0 until dim).map(j =>
        H.affine(j, col("vec_id")) % 2001L - 1000L): _*))
      .withColumn("n2", graft.functions.VectorFns.qnorm2(col("v")))
      .persist()
    eq.count()

    val t0 = System.nanoTime()
    val init = VectorIndex.coldStartFrame(eq, k)
    val refined = VectorIndex.trainCentroidsFrame(eq, init, k, rounds = 1)
    val asn = VectorIndex.assignCellsJoin(
      eq.select(col("vec_id"), col("v"), col("n2")), refined, k)
    val planStr = asn.queryExecution.executedPlan.toString
    require(planStr.contains("coarse_probe"),
      "executed plan does not use the CoarseProbe codegen expression")
    val nAssigned = asn.count()
    val nCells = asn.select(countDistinct(col("cell"))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)

    println(f"[coarseprobe] nVec=$nVec K=$k dim=$dim K1=${math.min(4096,
      math.ceil(math.sqrt(k.toDouble)).toLong)} probe=${VectorIndex.DefaultAssignProbe} " +
      f"time=$secs%.1fs assigned=$nAssigned cellsUsed=$nCells tasks=$tasks " +
      f"maxTaskPeakMB=${maxPeak / 1024 / 1024} shuffleMB=${shuffleRead / 1024 / 1024} " +
      "plan=coarse_probe(broadcast handle), no K-sized literal")
    spark.stop()
  }
}
