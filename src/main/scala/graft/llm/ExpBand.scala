package graft.llm

import org.apache.spark.sql.SparkSession

/** r13 dev experiment: the minhash band self-join's strategy A/B
  * (`runMain graft.llm.ExpBand <sfDir> [auto|shj]`) — noop sink per
  * guide §1.4, two runs (warm then measured). `auto` leaves the planner's
  * choice (broadcast at small scale, AQE-demoted at large); `shj` applies
  * the SHUFFLE_HASH hint the [[LlmQueries.minhashPairs]] gate would.
  */
object ExpBand {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val mode = if (args.length > 1) args(1) else "auto"
    val sig = LlmQueries.minhashSigOf(graft.Tables.documents(spark, d))
    sig.persist(); sig.count()
    val frame = LlmQueries.minhashPairsRawFor(sig, shj = mode == "shj")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      frame.write.format("noop").mode("overwrite").save()
      println(s"[expband] $mode run$i: ${(System.nanoTime() - t0) / 1e9}s")
    }
    frame.explain("formatted")
    spark.stop()
  }
}
