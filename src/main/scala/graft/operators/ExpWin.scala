package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables.{dec, events}

/** r13 dev experiment: the trailing-window rewrite A/B
  * (`runMain graft.operators.ExpWin <sfDir> [iters]`) — times, INTERLEAVED
  * in one JVM so host drift cannot confound (guide §1.1), the r12 rn-band
  * self-join formulations of ts_ewma / win_rolling_median (inlined here
  * verbatim) against the registry's r13 single-window rewrites, row-drive
  * per the bench's semantics. Min over iters reported.
  */
object ExpWin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    spark.range(1000).selectExpr("sum(id)").collect()

    def oldBase(s: SparkSession) = events(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"), col("rn"))
    def oldEwma(s: SparkSession): DataFrame = {
      val base = oldBase(s)
      val w = pow(lit(2), lit(9) - (col("c.rn") - col("p.rn"))).cast(LongType)
      base.as("c").join(base.as("p"),
          col("p.user_id") === col("c.user_id") &&
            col("p.rn").between(col("c.rn") - 9, col("c.rn")))
        .groupBy(col("c.user_id").as("user_id"), col("c.ts").as("ts"),
          col("c.event_id").as("event_id"))
        .agg((sum(dec(col("p.value"), 2) * w).cast(DoubleType) /
          sum(w)).as("ewma"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }
    def oldMedian(s: SparkSession): DataFrame = {
      val base = oldBase(s)
      base.as("c").join(base.as("p"),
          col("p.user_id") === col("c.user_id") &&
            col("p.rn").between(col("c.rn") - 9, col("c.rn")))
        .groupBy(col("c.user_id").as("user_id"), col("c.ts").as("ts"),
          col("c.event_id").as("event_id"))
        .agg(percentile(col("p.value"), lit(0.5)).as("med"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }
    def drive(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it =>
        while (it.hasNext) it.next()
      }
    def time(tag: String)(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      drive(df)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[expwin] $tag: $s%.2fs"); s
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "ewma_old" -> (() => oldEwma(spark)),
      "ewma_new" -> (() => StatQueries.queries.find(_.name == "ts_ewma").get
        .fn(spark, d)),
      "median_old" -> (() => oldMedian(spark)),
      "median_new" -> (() => StatQueries.queries
        .find(_.name == "win_rolling_median").get.fn(spark, d)))
    val mins = variants.map { case (tag, mk) =>
      tag -> (0 until iters).map(i => time(s"$tag run$i")(mk())).min
    }
    println(mins.map { case (t, m) => f"$t=$m%.2fs" }
      .mkString("[expwin] MIN ", " ", ""))
    spark.stop()
  }
}
