package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      // optional 3rd arg: comma-separated query names for fast local iteration
      case Array(s, o, names) => (s, o, Some(names.split(",").toSet))
    }
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(GraftSession.RecursionRowLimitKey, GraftSession.RecursionRowLimit)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // the one-line message hides root causes entirely (an sf10
          // context-stop printed only "you hit a bug in Spark"); the
          // driver greps its own pattern, so the trace is free diagnosis
          e.printStackTrace(System.err)
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // always dump the FULL oracle map, even for a subset run: a subset
    // iteration into a dir holding a full Verify dump would otherwise
    // truncate oracle_sql.json to the subset and silently shrink any
    // later gate run (or break one reading the file concurrently)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
