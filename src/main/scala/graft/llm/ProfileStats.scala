package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** ONE corpus pass feeding BOTH dispatch profiles (r13 optimization,
  * guide §2.4/§6 — one read of the corpus instead of two, and the
  * full-text repartition the fuzzy profile inherited from the pair path
  * is gone entirely):
  *
  *  - [[LlmQueries.ShingleStats]] (tokens, Σdf², maxDf) — the
  *    naive-vs-prefix Jaccard dispatch and the SHUFFLE_HASH gates;
  *  - [[TextRankQueries.FuzzyBlockStats]] (docs, groups, blowup,
  *    repBlowup) — the plain-vs-collapsed fuzzy dedup dispatch.
  *
  * Mechanism: each doc emits its distinct 3-gram shingles (kind 0 — the
  * exact [[LlmQueries.shingleTok]] multiset) and, when the 200-char a–z
  * skeleton is ≥ 16 chars, that skeleton (kind 1 — the exact
  * fuzzySkeletons `nrm` column) into one tagged (kind, key) histogram.
  * The shingle stats read the kind-0 rows directly. Every fuzzy statistic
  * is a function of the DISTINCT-SKELETON histogram (kind 1: one (nrm, c)
  * row per distinct skeleton): n = Σc, groups = row count, and because
  * the block keys p/sfx are FUNCTIONS of nrm,
  *   vol(docs, p)  = Σ_p (Σ_{nrm∈p} c)²   (doc-level block volume)
  *   vol(reps, p)  = Σ_p |{nrm ∈ p}|²     (distinct-skeleton block volume)
  * — so the old path's full-text repartition, doc-frame persist and five
  * jobs over it collapse into vocab-sized second-stage aggregates.
  * Counts are exact integers ≪ 2^53, so the double sums equal the
  * reference formulations' bit-for-bit and every dispatch decision is
  * unchanged (ProfileStatsSpec pins both equalities; the reference
  * formulations stay in-tree for ad-hoc frames and the DedupBench
  * calibrations).
  */
object ProfileStats {

  final case class CorpusProfiles(shingle: LlmQueries.ShingleStats,
      fuzzy: TextRankQueries.FuzzyBlockStats)

  private val memo =
    new graft.SessionMemo[(SparkSession, String), CorpusProfiles]()

  /** Memoized per-(session, dir) combined profile of the `documents`
    * table — same contract as the two memos it merges: the dispatch
    * statistics are properties of the immutable input dataset.
    */
  def of(s: SparkSession, d: String): CorpusProfiles =
    memo.computeIfAbsent((s, d), _ =>
      compute(graft.Tables.documents(s, d)))

  private[llm] def compute(docs: DataFrame): CorpusProfiles = {
    val sh = array_distinct(
      graft.functions.TextStats.wordTrigramsCol(col("text")))
    val nrm = graft.functions.TextStats.lettersPrefixCol(col("text"), 200)
    // skeleton struct rides an array filtered on the ≥16-char rule so the
    // concat stays one well-typed array<struct<kind, key>> per doc
    val tagged = docs.select(explode(concat(
        transform(sh, w => struct(lit(0).as("kind"), w.as("key"))),
        filter(array(struct(lit(1).as("kind"), nrm.as("key"))),
          e => length(e.getField("key")) >= 16))).as("e"))
      .select(col("e.kind").as("kind"), col("e.key").as("key"))
    val hist = tagged.groupBy(col("kind"), col("key"))
      .agg(count(lit(1)).as("c")).persist()
    try {
      val shRow = hist.filter(col("kind") === 0)
        .agg(sum(col("c")).cast(LongType),
          sum(col("c").cast(DoubleType) * col("c")),
          max(col("c")).cast(LongType)).head()
      val shingle =
        if (shRow.isNullAt(0)) LlmQueries.ShingleStats(0L, 0.0, 0L)
        else LlmQueries.ShingleStats(shRow.getLong(0), shRow.getDouble(1),
          shRow.getLong(2))
      val skel = hist.filter(col("kind") === 1).select(col("key"), col("c"))
      val ngRow = skel
        .agg(coalesce(sum(col("c")), lit(0L)).cast(LongType),
          count(lit(1)).cast(LongType)).head()
      val (n, g) = (ngRow.getLong(0), ngRow.getLong(1))
      def vols(key: Column): (Double, Double) = {
        val r = skel.groupBy(key.as("k"))
          .agg(sum(col("c")).cast(DoubleType).as("cb"),
            count(lit(1)).cast(DoubleType).as("cg"))
          .agg(sum(col("cb") * col("cb")), sum(col("cg") * col("cg"))).head()
        if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
      }
      val (pb, pr) = vols(substring(col("key"), 1, 16))
      val (sb, sr) = vols(expr("right(key, 16)"))
      val fuzzy = TextRankQueries.FuzzyBlockStats(n, g,
        if (n == 0) 0.0 else (pb + sb) / n,
        if (n == 0) 0.0 else (pr + sr) / n)
      CorpusProfiles(shingle, fuzzy)
    } finally { hist.unpersist(); () }
  }
}
