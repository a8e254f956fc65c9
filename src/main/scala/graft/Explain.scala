package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    for (name <- args(0).split(",")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).count()
      println(f"TIMING $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
