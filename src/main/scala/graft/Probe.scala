package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/perf probe used during development: runs one named query,
  * prints timing and the formatted physical plan.
  * Usage: runMain graft.Probe <queryName> [sfDir]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(GraftSession.RecursionRowLimitKey, GraftSession.RecursionRowLimit)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Comma-separated names time each in sequence (repeat a name to see
    // warm-vs-cold); the formatted plan prints only for a single query.
    val names = name.split(",")
    for (n0 <- names) {
      val q = SparkEntry.all.find(_.name == n0).getOrElse(sys.error(s"no query $n0"))
      // time fn() too — iterative queries (dedup_cluster) execute inside it
      val t0 = System.nanoTime()
      val df = q.fn(spark, sfDir)
      if (names.length == 1) df.explain("formatted")
      val n = df.count()
      println(f"[probe] $n0 rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
