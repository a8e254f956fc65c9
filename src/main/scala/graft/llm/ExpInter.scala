package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12 dev experiment: SMJ vs shuffled-hash on the inter_counts
  * self-join (`runMain graft.llm.ExpInter <sfDir> [smj|shj]`).
  */
object ExpInter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val mode = if (args.length > 1) args(1) else "smj"
    val docs = graft.Tables.documents(spark, d)
    val tok0 = LlmQueries.shingleTok(docs)
    val tok = if (mode == "shj") tok0.hint("SHUFFLE_HASH") else tok0
    val cnt = tok0.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val frame = tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(cnt.select(col("doc_id").as("a_id"), col("n").as("na"))), "a_id")
      .join(broadcast(cnt.select(col("doc_id").as("b_id"), col("n").as("nb"))), "b_id")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      frame.write.format("noop").mode("overwrite").save()
      println(s"[exp] $mode run$i: ${(System.nanoTime() - t0) / 1e9}s")
    }
    frame.explain("formatted")
    spark.stop()
  }
}
