package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 dev experiment: the DSIR scorer A/B
  * (`runMain graft.llm.ExpDsir <sfDir> [old|new]`) — noop sink per guide
  * §1.4, two runs (warm then measured), over a persisted token frame like
  * the real `build:dsir_doc` stage (tok is memoized). `old` runs the
  * three-pass reference formulation ([[TextRankQueries.dsirScoredFrame]]),
  * `new` the single-aggregate flagged rewrite
  * ([[TextRankQueries.dsirScoredFlagged]]).
  */
object ExpDsir {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val mode = if (args.length > 1) args(1) else "new"
    val docs = graft.Tables.documents(spark, d)
    val tk = TextRankQueries.wordTok(docs)
    tk.persist(); tk.count()
    val frame =
      if (mode == "old") {
        val tgtIds = docs.filter(col("source") === "src0").select(col("doc_id"))
        TextRankQueries.dsirScoredFrame(tk, tk.join(tgtIds, "doc_id"))
      } else {
        // the rejected "flagged" rewrite (one (doc,w) aggregate carrying a
        // target flag); mode `newp` additionally persists the shared
        // aggregate so the duplicated-subtree cost becomes one
        // materialization. Kept inline: the library path was reverted
        // after this harness measured it slower (see dsirVocFrame's note).
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val flag = docs.select(col("doc_id"),
          (col("source") === "src0").as("tgt"))
        val m0raw = tk.groupBy(col("doc_id"), col("w"))
          .agg(count(lit(1)).as("m")).join(flag, "doc_id")
        val m0 = if (mode == "newp") m0raw.persist() else m0raw
        val voc = m0.groupBy(col("w"))
          .agg(sum(col("m")).as("cr"),
            sum(when(col("tgt"), col("m")).otherwise(0L)).as("ct"))
        val nn = voc.agg(sum(col("cr")).cast(LongType).as("nr"),
          count(lit(1)).cast(LongType).as("v"))
        val nt = voc.agg(coalesce(sum(col("ct")), lit(0L)).cast(LongType).as("nt"))
        val lr = voc.crossJoin(broadcast(nn)).crossJoin(broadcast(nt))
          .select(col("w"),
            (log((col("ct").cast(DoubleType) + 1) / (col("nt") + col("v"))) -
              log((col("cr").cast(DoubleType) + 1) /
                (col("nr") + col("v")))).as("lr"))
        m0.join(lr, "w")
          .select(col("doc_id"), col("m"),
            round(col("m") * col("lr") * 1000000L, 0).cast(LongType).as("g"))
          .groupBy(col("doc_id"))
          .agg(sum(col("m")).cast(LongType).as("n_words"),
            (sum(col("g")).cast(DoubleType) / 1000000L / sum(col("m")))
              .as("logratio"))
      }
    (1 to 3).foreach { i =>
      // newp persists an intermediate: drop it between runs so every run
      // pays the honest one-materialization cost (run1 = JVM warmup)
      spark.sharedState.cacheManager.clearCache()
      tk.persist(); tk.count()
      val t0 = System.nanoTime()
      frame.write.format("noop").mode("overwrite").save()
      println(s"[expdsir] $mode run$i: ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
