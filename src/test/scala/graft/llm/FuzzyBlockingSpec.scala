package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Planted-mutation recall test for dedup_fuzzy's two-pass blocking.
  * Round 6 blocked on the 16-char normalized prefix only, with a
  * documented miss: pairs mutated inside the first 16 normalized chars
  * never became candidates. The suffix pass closes exactly that hole —
  * this spec plants one pair per escape route and one that legitimately
  * stays missed (edited in BOTH 16-char windows).
  */
class FuzzyBlockingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("fuzzy-docs").toString
    val base = ("the quick brown fox jumps over the lazy dog " * 5).trim
    def mutateAt(s: String, i: Int): String =
      s.substring(0, i) + "zzz" + s.substring(i + 3)
    val rows = Seq(
      // prefix-mutated pair: first 3 normalized chars edited — only the
      // suffix key can block these together (the round-6 miss)
      (100L, base),
      (101L, mutateAt(base, 0)),
      // mid-mutated pair: prefix AND suffix keys both intact
      (200L, base + " extra tail marker alpha"),
      (201L, mutateAt(base, 50) + " extra tail marker alpha"),
      // suffix-mutated pair (within the 200-char verify window): the
      // prefix key blocks these — symmetric coverage
      (300L, base),
      (301L, mutateAt(base, 190)),
      // edited in BOTH windows: legitimately missed by two-pass blocking
      (400L, base + " beta gamma delta"),
      (401L, mutateAt(mutateAt(base, 0), 190) + " beta gamma delta"),
      // unrelated doc: must pair with nothing
      (500L, "completely different content " * 10))
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("two-pass blocking catches prefix-, mid- and suffix-window mutations") {
    val pairs = graft.SparkEntry.queries("dedup_fuzzy")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)),
      s"prefix-mutated pair missed — suffix pass not working: $pairs")
    assert(pairs.contains((200L, 201L)), s"mid-mutated pair missed: $pairs")
    assert(pairs.contains((300L, 301L)), s"suffix-mutated pair missed: $pairs")
    // base-vs-base duplicates across plants (100/300 share text) are fine;
    // what must NOT appear: the unrelated doc, or >20-distance pairs
    assert(!pairs.exists(p => p._1 == 500L || p._2 == 500L),
      s"unrelated doc paired: $pairs")
  }

  /** Hot-block fixture: a planted boilerplate block (one license-header
    * skeleton shared by many docs, the crawl shape that recreates
    * all-pairs cost inside a block) plus near-identical variants and
    * unrelated filler. Pins the three contracts of the collapse path:
    * output identical to the plain path, the dispatch statistic routes
    * the hot corpus to collapse (and a benign corpus to plain), and the
    * DP volume collapses from doc-blocks to distinct-skeleton blocks.
    */
  test("hot boilerplate block: A/B identical, dispatch routes, DP bounded") {
    import spark.implicits._
    val boiler = ("all rights reserved unauthorized reproduction of this " +
      "page is prohibited see the site terms for license details " * 3).trim
    def mutateAt(s: String, i: Int): String =
      s.substring(0, i) + "qqq" + s.substring(i + 3)
    val rows =
      // 60 docs sharing ONE exact skeleton (the hot block) …
      (0 until 60).map(i => (1000L + i, boiler)) ++
      // … 3 near-identical variants (mid-window mutation, dist 3) …
      (0 until 3).map(i => (2000L + i, mutateAt(boiler, 60 + 10 * i))) ++
      // … and unrelated singleton docs (digits are stripped by the a–z
      // normalization, so per-doc identity must be LETTERS, fore and aft,
      // to keep both block keys distinct)
      (0 until 40).map { i =>
        val code = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
        val tag = code.toString * 10
        (3000L + i, s"$tag unique filler content for this document " +
          s"with enough letters to pass the minimum skeleton length $tag")
      }
    val docs = rows.toDF("doc_id", "text")

    val stats = TextRankQueries.fuzzyBlockStats(docs)
    info(s"hot fixture: $stats")
    // doc-level candidate volume is hot-block-quadratic; rep-level is tiny
    assert(stats.blowup > TextRankQueries.FuzzyCollapseCutover *
      math.max(stats.repBlowup, 1.0),
      s"dispatch must route the hot corpus to the collapsed path: $stats")
    // distinct skeletons: 1 hot + 3 variants + 40 fillers
    assert(stats.groups == 44, s"expected 44 skeleton groups: $stats")
    // the DP stage now sees Σg² over 4 blocked reps + singleton fillers
    // instead of Σc² over the 63-doc hot block: bounded by a small
    // constant per GROUP, independent of hot-block membership
    assert(stats.repBlowup * stats.docs <= 4.0 * stats.groups,
      s"rep-level candidate volume not bounded: $stats")

    // A/B: collapsed output is exactly the plain output
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = key(TextRankQueries.fuzzyPairs(docs))
    val collapsed = key(TextRankQueries.fuzzyPairsCollapsed(docs))
    assert(collapsed == plain,
      s"A/B mismatch: only-plain=${plain -- collapsed} only-collapsed=${collapsed -- plain}")
    // the hot block itself contributes C(60,2) dist-0 pairs
    assert(plain.count(p => p._3 == 0) >= 60 * 59 / 2)

    // benign corpus (the mutation fixture) routes to the plain path
    val benign = TextRankQueries.fuzzyBlockStats(
      spark.read.parquet(s"$dir/documents.parquet"))
    info(s"benign fixture: $benign")
    assert(benign.blowup <= TextRankQueries.FuzzyCollapseCutover *
      math.max(benign.repBlowup, 1.0),
      s"benign corpus must stay on the plain path: $benign")
  }
}
