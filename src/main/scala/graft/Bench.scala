package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // runs per query; the reported time is the MIN across runs. One warm +
    // one measured pass per query makes the committed number decision-grade:
    // single-shot timings on a shared host showed up to 9× phantom
    // regressions on untouched code (round-4 postmortem), while the min of
    // two runs bounds host-noise outliers and excludes one-time
    // codegen/JIT/cache-fill cost.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session init (context launch, codegen compiler, FS client) so
    // the first timed query measures the query, not the JVM
    spark.range(1000).selectExpr("sum(id)").collect()
    // registry order (not Map hash order): run-to-run and round-to-round
    // timings stay comparable per query
    val results = SparkEntry.all.map { q =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$runs,"agg":"min"}""")
    spark.stop()
  }
}
