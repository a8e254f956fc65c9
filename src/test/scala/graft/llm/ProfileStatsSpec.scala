package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** r13 optimization pins: the two dispatch profiles (shingle df stats and
  * fuzzy skeleton-block stats) moved onto ONE combined corpus pass
  * ([[ProfileStats]]). The reference formulations
  * ([[LlmQueries.shingleStats]], [[TextRankQueries.fuzzyBlockStats]])
  * stay in-tree; this spec diffs them against the combined pass so a
  * drift in either profile — and therefore in any dispatch decision —
  * can never be silent.
  */
class ProfileStatsSpec extends AnyFunSuite with SparkTestBase {

  private def corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  // edge zoo: no-shingle docs (<3 words), skeleton exactly at/below the
  // 16-char bound, identical skeletons (rep collapse), shared boilerplate
  // shingle (df skew), empty text
  private def edgeDocs = {
    val hot = "terms of service apply to all content here"
    val rows = Seq(
      (1L, "short doc"),
      (2L, ""),
      (3L, "alpha beta gamma delta " + hot),
      (4L, "alpha beta gamma delta " + hot),
      (5L, "completely different words everywhere " + hot),
      (6L, "abcdefghabcdefgh"), // skeleton exactly 16
      (7L, "abcdefghabcdefg"), // skeleton 15 — excluded
      (8L, "same same same same same same"),
      (9L, "same same same same same same")
    )
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  test("combined pass == the two reference profiles, per corpus") {
    for (docs <- Seq(edgeDocs, corpus)) {
      val combined = ProfileStats.compute(docs)
      val refSh = LlmQueries.shingleStats(docs)
      val refFz = TextRankQueries.fuzzyBlockStats(docs)
      assert(combined.shingle == refSh,
        s"shingle profile drifted: combined=${combined.shingle} ref=$refSh")
      assert(combined.fuzzy == refFz,
        s"fuzzy profile drifted: combined=${combined.fuzzy} ref=$refFz")
    }
  }
}
