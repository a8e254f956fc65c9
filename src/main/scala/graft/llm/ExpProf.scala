package graft.llm

import org.apache.spark.sql.SparkSession

/** r13 dev experiment: the combined-profile-pass A/B
  * (`runMain graft.llm.ExpProf <sfDir> [iters]`) — times, INTERLEAVED in
  * one JVM so host drift cannot confound (guide §1.1), the two reference
  * profile passes ([[LlmQueries.shingleStats]] + the fuzzy block profile)
  * against the merged [[ProfileStats.compute]] pass. Each sample is a full
  * cold computation (no memo); min over iters reported.
  */
object ExpProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // mirror Bench's session exactly — split sizing changes the scan
      // parallelism this A/B is sensitive to
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val docs = graft.Tables.documents(spark, d)
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[expprof] $tag: $s%.2fs"); s
    }
    val combFirst = args.length > 2 && args(2) == "comb-first"
    val (sep, comb) = (Array.fill(iters)(0.0), Array.fill(iters)(0.0))
    (0 until iters).foreach { i =>
      def runSep() = sep(i) = time(s"separate(shingle+fuzzy) run$i") {
        LlmQueries.shingleStats(docs)
        TextRankQueries.fuzzyBlockStats(docs)
      }
      def runComb() = comb(i) = time(s"combined run$i") {
        ProfileStats.compute(docs)
      }
      if (combFirst) { runComb(); runSep() } else { runSep(); runComb() }
    }
    println(f"[expprof] MIN separate=${sep.min}%.2fs combined=${comb.min}%.2fs")
    spark.stop()
  }
}
