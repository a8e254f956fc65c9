package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of named registry queries —
  * `runMain graft.Explain <sfDir> <query>...`. The fast way to confirm a
  * rewrite kept the intended shape (WindowGroupLimit fired, an exchange
  * was reused, a filter reached the scan) without running Bench.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { n =>
      println(s"========== $n")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
  }
}
