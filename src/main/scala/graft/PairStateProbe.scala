package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Fourth-decade evidence probe for the two irreducible-pair-volume
  * entries (`build:inter_counts`, `basket_pairs`) — VERDICT r9 #7: run
  * them at a given scale dir and record, per entry, the per-task
  * partial-aggregation state metrics a listener can see (peak execution
  * memory, memory/disk spill) alongside time, shuffle volume, and the
  * derived pair-stage width. The [[graft.llm.LlmQueries.pairBuildPartitions]]
  * prediction says per-task candidate volume — and therefore per-task
  * partial-agg state — stays ~FLAT as the corpus grows, because task
  * count scales with the profile's Σdf²; this probe turns that arithmetic
  * into a measurement: flat max-task peak memory and zero spill across
  * decades = the prediction holds.
  *
  * Usage: runMain graft.PairStateProbe <sfDir> [<sfDir> ...]
  * With SPARK_GRAFT_REGEN_BUDGET=1 the measured shuffle MB also arm the
  * scale's SHUFFLE_BUDGET.json section for exactly these entries.
  */
object PairStateProbe {

  private final case class TaskAgg(
      var tasks: Long = 0, var maxPeakMem: Long = 0, var sumPeakMem: Long = 0,
      var memSpill: Long = 0, var diskSpill: Long = 0,
      var shuffleRead: Long = 0, var shuffleWrite: Long = 0)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PairStateProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // scan-split sizing for local[32] over single-file tables: the split
      // is min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism)),
      // so the 4 MiB default open cost leaves a <128 MiB single-file scan
      // in 1-2 partitions and every map-only kernel (the image/video codec
      // round-trips especially) nearly serial. 128 KiB reflects local-FS
      // open cost and spreads any >4 MiB file across the cores; on a real
      // cluster the input arrives as many files and this knob is moot.
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.ui.enabled", "false")
      .config(GraftSession.RecursionRowLimitKey, GraftSession.RecursionRowLimit)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val agg = new java.util.concurrent.atomic.AtomicReference(new TaskAgg)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val a = agg.get()
          a.synchronized {
            a.tasks += 1
            a.maxPeakMem = math.max(a.maxPeakMem, m.peakExecutionMemory)
            a.sumPeakMem += m.peakExecutionMemory
            a.memSpill += m.memoryBytesSpilled
            a.diskSpill += m.diskBytesSpilled
            a.shuffleRead += m.shuffleReadMetrics.totalBytesRead
            a.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    })
    def window[T](f: => T): (T, TaskAgg) = {
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      agg.set(new TaskAgg)
      val r = f
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (r, agg.get())
    }
    spark.range(1000).selectExpr("sum(id)").collect() // absorb session init

    for (sfDir <- args) {
      println(s"[pairprobe] === $sfDir ===")
      val measured = scala.collection.mutable.Map.empty[String, Double]
      // the profile build (shingle stats) is the dispatch input, charged
      // separately so inter_counts reports its own marginal cost
      def build(n: String): (String, () => Unit) =
        s"build:$n" -> (() =>
          SparkEntry.builds.find(_._1 == s"build:$n").get._2(spark, sfDir))
      def query(n: String): (String, () => Unit) =
        n -> (() => { SparkEntry.all.find(_.name == n).get.fn(spark, sfDir).count(); () })
      val entries: Seq[(String, () => Unit)] = Seq(
        build("shingle_stats"),
        build("inter_counts"),
        query("basket_pairs"),
        // the media family's pair-shaped stages (VERDICT r11 #4): the
        // anchored band join behind dedup_image/dedup_audio and the
        // frame-set containment join behind dedup_video are the heaviest
        // pair stages in the registry after the dispatch rework — each
        // hash build is charged first so the dedup entry reports the
        // join's own marginal state
        build("image_hash"), query("dedup_image"),
        build("video_hash"), query("dedup_video"),
        build("audio_hash"), query("dedup_audio"))
      for ((name, run) <- entries) {
        val t0 = System.nanoTime()
        val (_, a) = window(run())
        val sec = (System.nanoTime() - t0) / 1e9
        measured(name) = a.shuffleRead / 1e6
        println(f"[pairprobe] $name%-22s time=$sec%8.1fs tasks=${a.tasks}%5d " +
          f"maxTaskPeakMemMB=${a.maxPeakMem / 1e6}%8.1f " +
          f"meanTaskPeakMemMB=${a.sumPeakMem / math.max(1, a.tasks) / 1e6}%8.1f " +
          f"spillMemMB=${a.memSpill / 1e6}%8.1f spillDiskMB=${a.diskSpill / 1e6}%8.1f " +
          f"shufReadMB=${a.shuffleRead / 1e6}%9.1f shufWriteMB=${a.shuffleWrite / 1e6}%9.1f")
      }
      if (sys.env.get("SPARK_GRAFT_REGEN_BUDGET").contains("1")) {
        val scale = new java.io.File(sfDir).getName
        ShuffleBudget.saveSection(scale, measured.toMap)
        println(s"[pairprobe] armed $scale section of ${ShuffleBudget.DefaultPath}")
      }
    }
    spark.stop()
  }
}
