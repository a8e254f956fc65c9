package graft.llm

import graft.{Q, Tables}
import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-training-data pipeline operators (north star in
  * /root/repo/BASELINE.json): deduplication (exact, MinHash-LSH, SimHash,
  * n-gram Jaccard, embedding cosine), similarity search (brute-force top-k +
  * LSH-bucketed ANN), text analysis (stats, token counts, language ID,
  * fingerprinting) and multimodal binary-column handling.
  *
  * The reference's own dedup primitive is the per-record SHA-256 checksum
  * (`/root/reference/src/checksum.rs:15-19`); everything beyond that is the
  * north-star extension surface, designed so each stage is one shuffle:
  * dedup_exact groups on a hash, MinHash/LSH group on (band, bandhash),
  * ANN groups on LSH bucket — all key-partitionable at 100 TB.
  *
  * Determinism: similarity math uses fixed-point integer arithmetic
  * ([[graft.functions.VectorFns]]) so sums are associative and hash-identical
  * across engines; hash families are seeded (xxhash64, fixed seed) so MinHash
  * and SimHash signatures are reproducible run-to-run.
  */
object LlmQueries {
  import Tables._
  import VectorFns._
  import graft.functions.{CrossHash => H}

  /** 12 random-hyperplane ±1 sign vectors (64 dims) for sim_ann_lsh, drawn
    * from the cross-engine affine family's parity so both engines see the
    * same literal coefficients.
    */
  private val AnnSigns: Seq[Array[Long]] = (0 until 12).map { p =>
    Array.tabulate(64) { i =>
      if ((H.affineA(64 + p) * (i + 1) + H.affineB(64 + p)) % H.P1 % 2 == 0) 1L else -1L
    }
  }

  /** Stopword lexicons shared by the Spark and oracle sides of lang_id. */
  private val LangLexicons = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** Shared lang-ID scorer (lang_id + doc_lang_confusion): stopword-lexicon
    * vote per language, argmax by the lexicographically largest
    * (score, lang) struct — the same tie order DuckDB's list_max applies.
    * One scan via [[graft.functions.LangVotes]] (the per-language
    * interpreted `aggregate` lambdas were doc_lang_confusion's whole
    * 15.5 s at sf10); the oracle keeps the list_filter formulation, and
    * LangVotesSpec pins the expression A/B against the greatest(struct)
    * chain it replaced.
    */
  private def langPred(s: SparkSession, d: String): DataFrame = {
    val v = graft.functions.LangVotes
      .langVotesCol($"text", LangLexicons.toSeq.sortBy(_._1))
    documents(s, d)
      .select($"doc_id", $"lang", v.as("v"))
      .select($"doc_id", $"lang",
        when($"v.score" > 0, $"v.lang").otherwise(lit("unk")).as("pred_lang"),
        $"v.score".as("pred_score"))
  }

  /** Exact-dedup cap for the O(docs²)-flavored demo queries (pairwise
    * near-dup over a bounded sample); the unbounded implementations are the
    * LSH-bucketed ones.
    */
  private val SampleDocs = 300
  private val SampleVecs = 30

  /** Distinct word-3-gram shingle set per document (the standard MinHash
    * shingling unit). Unigram tokens are useless on a small-vocabulary
    * corpus — every pair of long docs shares most words — while 3-gram
    * shingles keep the candidate space sparse (measured max doc-frequency of
    * a shingle at sf0.1: 25 of 5000 docs). Grams come from the one-scan
    * [[graft.functions.TextStats.wordTrigrams]] expression (sf10 measured
    * the split→transform→slice→concat_ws chain as the dominant CPU of
    * every shingle-fed build); the DuckDB mirror below still runs the
    * chain formulation, so the oracle hashes prove the rewrite. Docs with
    * <3 tokens yield an empty gram array — explode drops them, exactly
    * like the `size(ws) >= 3` pre-filter it replaces.
    */
  private[llm] def shingleTok(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(
      graft.functions.TextStats.wordTrigramsCol(col("text")))).as("w"))

  /** DuckDB mirror of [[shingleTok]] (docs with <3 words yield no rows in
    * both engines).
    */
  private[llm] def sqlShingleTok(from: String): String =
    s"""SELECT doc_id, unnest(list_distinct(
       |  [ws[i]||' '||ws[i+1]||' '||ws[i+2] FOR i IN range(1, len(ws)-1)])) AS w
       |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $from)""".stripMargin

  /** Exact Jaccard ≥ `t` near-dup pairs via the inverted-index join: join
    * docs on shared shingles, count shared shingles per pair (the
    * intersection falls out of the group count — verification is free),
    * filter on the Jaccard bound. Candidate volume is Σ_w df(w)² — bounded
    * here because 3-gram shingles keep max df tiny (measured 25/5000 docs);
    * on a heavy-tailed corpus switch to [[jaccardPairsPrefix]], which this
    * one is A/B-equal to (LlmSpec) but 2× faster at benign df (measured
    * 3.6 s vs 8.2 s warm at sf0.1, local[32]).
    *
    * Returns (a_id, b_id, inter, jac) for pairs with jac ≥ t.
    */
  private[graft] def jaccardPairs(docs: DataFrame, t: Double): DataFrame = {
    val tok = shingleTok(docs)
    val cnt = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pair = tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast(DoubleType) /
      (col("ca.n") + col("cb.n") - col("inter"))
    pair
      .join(cnt.as("ca"), col("ca.doc_id") === col("a_id"))
      .join(cnt.as("cb"), col("cb.doc_id") === col("b_id"))
      .filter(jac >= t)
      .select($"a_id", $"b_id", $"inter", jac.as("jac"))
  }

  /** Threshold- and metric-INDEPENDENT candidate pair frame: every doc
    * pair sharing ≥1 shingle, with its intersection count and both set
    * sizes — (a_id, b_id, inter, na, nb). Jaccard and containment are
    * pure PROJECTIONS of this frame (inter/(na+nb−inter) vs
    * inter/min(na,nb)), so on the naive dispatch path the inverted-index
    * self-join that dominates BOTH builds (35.8 s + 38.6 s at sf1 as
    * separate builds) runs ONCE per (session, dir) and each family just
    * filters it. Only materialized when the df profile dispatches naive
    * (blowup ≤ cutover) — exactly the corpora where candidate volume is
    * bounded, so the persist footprint is the profile-certified Σdf²
    * candidate count, never the heavy-tailed blowup (prefix-path corpora
    * never build this frame; their candidate generation is metric- and
    * threshold-specific by construction).
    */
  private val interMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()
  /** Dispatch bound for [[interCounts]]' two physically different (but
    * row-identical — SharedInterSpec pins it) builds: up to this many docs
    * the per-doc count dim (16 B/doc → 64 MB here) is FORCED broadcast and
    * the pair frame joins it after aggregation — the cheap shape, because
    * the token exchange carries only (doc_id, w). Past it the dim can't
    * broadcast and those joins would re-shuffle the LARGEST frame in the
    * build twice (the sf10 gate measured exactly that demotion before the
    * broadcast was explicit: 92.9 MB at sf1 → 4.7 GB at sf10, 51× on 10×
    * docs), so the count switches to riding the token shuffle instead
    * (size of the shingle array before the explode — one extra long per
    * token, ~1.8× the exchange, and the candidate frame becomes terminal).
    */
  private[llm] val InterBroadcastDocsCutover = 4000000L

  /** Corpus doc count, memoized per (session, dir) — parquet metadata
    * count, one cheap job, shared by every dispatch that needs it.
    */
  private val docCountMemo = new graft.SessionMemo[
    (SparkSession, String), java.lang.Long]()
  private[llm] def docCount(s: SparkSession, d: String): Long =
    docCountMemo.computeIfAbsent((s, d), _ => documents(s, d).count()).longValue()

  /** Pair-stage task count for the [[interCounts]] build. The inverted-
    * index self-join emits ~Σdf²/2 candidate rows into a map-side partial
    * aggregation, and at a FIXED 32-partition layout the per-task pair
    * volume grows linearly with the corpus until the partial hash table
    * spills and stops combining — the sf10 gate measured 27× shuffle
    * growth on 11.8× measured-linear candidate growth, attributed exactly
    * to this (BASELINE.md). The profile's Σdf² is the exact candidate
    * estimate, so scale tasks with it: ~[[PairsPerTask]] candidate pairs
    * per task, floored at the session's shuffle parallelism (never fewer
    * tasks than the configured cluster width), capped at 4096 so task
    * count can't outrun the scheduler on a pathological profile.
    */
  private[graft] val PairsPerTask = 2e6
  private[graft] def pairBuildPartitions(s: SparkSession, sumDf2: Double): Int = {
    val base = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val target = math.ceil((sumDf2 / 2.0) / PairsPerTask)
    math.min(4096.0, math.max(base.toDouble, target)).toInt
  }

  /** Absolute ceiling on build rows a single partition may feed a
    * shuffled-hash build side, whatever the memory derivation below says
    * (a backstop against a mis-sized heap reading as "infinite").
    * Under the cap the `SHUFFLE_HASH` hint replaces sort-merge — the
    * join's cost was the per-partition SORT of shingle STRINGS, not the
    * probe (measured at sf1: SMJ 19.9/24.5 s → SHJ 4.1/7.4 s on identical
    * output; guide §3.1 "often faster when one side is moderately small
    * per partition"). Above it the plan stays sort-merge, which spills
    * gracefully — the fallback costs a bounded constant factor, while an
    * over-eager hash build OOMs (an inner SHJ build side cannot spill).
    */
  private[llm] val ShjBuildRowsMax = 8000000L

  /** Memory-derived per-partition build-row cap for the SHUFFLE_HASH
    * dispatch (guide §3.1's stated risk: "an OOM if a build-side
    * partition does not fit in memory"). Construction: all concurrently
    * running tasks' hash relations together may claim at most ~30% of the
    * executor heap (half of Spark's default 0.6 execution fraction —
    * build relations share execution memory with the probe side's
    * aggregates), so each of the `slots` concurrent tasks gets
    * heap·0.3/slots bytes, at `bytesPerRow` of hash-relation footprint
    * per build row. r12 shipped a flat 8M-row cap validated only at
    * ~375k rows/partition (round-12 ADVICE); this bounds the regime the
    * cap was never measured in by construction instead. local[n]: heap =
    * driver JVM = executor; on a cluster the same formula reads the
    * executor JVM's own Runtime, which is the heap that matters.
    */
  private[graft] def shjBuildRowsCap(s: SparkSession, bytesPerRow: Long): Long = {
    val heap = Runtime.getRuntime.maxMemory()
    val slots = math.max(1, s.sparkContext.defaultParallelism)
    math.min(ShjBuildRowsMax, heap * 3L / 10L / slots / bytesPerRow)
  }

  /** Worst-PARTITION shuffled-hash safety, not worst-average: the r12
    * gate divided total build rows by the partition count, but the build
    * key is skewed (shingle df, band buckets) and every row of the
    * hottest key hashes to ONE partition — a hot shingle with df near
    * the corpus size passes an average gate and OOMs the one task whose
    * hash relation holds it (round-12 verdict "What's wrong" #3). The
    * hottest partition is ≤ avg + maxKeyRows (its share of the uniform
    * mass plus the entire hot key), so gate on that bound: dispatch to
    * SHUFFLE_HASH only when it fits the cap.
    */
  private[graft] def shjSafe(totalRows: Long, maxKeyRows: Long, parts: Int,
      cap: Long): Boolean =
    totalRows / math.max(1, parts) + maxKeyRows <= cap

  /** Hash-relation bytes budgeted per (w STRING, doc_id LONG) build row of
    * the inter-counts self-join: ~30-40 B of UTF8 shingle + 16 B UnsafeRow
    * header + 8 B long, roughly doubled for the BytesToBytesMap's key copy
    * and bucket array. Deliberately conservative — overestimating only
    * costs the graceful SMJ fallback.
    */
  private[llm] val InterShjBytesPerRow = 128L

  /** minhash band rows are fixed-width (doc_id LONG, band INT, bh LONG):
    * ~28 B of UnsafeRow plus map overhead.
    */
  private[llm] val BandShjBytesPerRow = 64L

  /** LOWER bound for the band join's SHUFFLE_HASH hint: below it the
    * planner's own broadcast of the tiny band frame wins and the hint
    * would only add two exchanges. Measured (ExpBand, noop sink, warm,
    * this host): 40k band rows (sf0.1) — broadcast 0.84 s vs SHJ 1.67 s;
    * 400k rows (sf1) — planner 3.39 s vs SHJ 1.78 s. The crossover sits
    * between; 200k (≈ 5 MB of band rows, half the broadcast threshold)
    * splits it with a bounded ~1.5–2× error either way, against the
    * unbounded SMJ sort the demoted broadcast degenerates to at scale.
    */
  private[llm] val BandShjMinRows = 200000L

  /** Broadcast-dim shape: count dim joined AFTER the pair aggregation,
    * explicitly broadcast (Catalyst's own estimate demoted this exact join
    * to sort-merge at sf10 while the dim was 8 MB on disk). `pairParts`
    * (0 = leave the session layout alone) widens the w-exchange feeding
    * the self-join so the pair partial-agg stays combine-effective — see
    * [[pairBuildPartitions]]; the self-join's two sides share the one
    * repartitioned frame, so the layout is paid once. `shj` swaps the
    * self-join to shuffled-hash (see [[ShjBuildRowsMax]]).
    */
  private[llm] def interCountsBroadcast(docs: DataFrame, pairParts: Int = 0,
      shj: Boolean = false): DataFrame = {
    val tok0 = shingleTok(docs)
    val tokL = if (pairParts > 0) tok0.repartition(pairParts, col("w")) else tok0
    val tok = if (shj) tokL.hint("SHUFFLE_HASH") else tokL
    // cnt reads the PRE-repartition frame: its doc_id rollup partial-aggs
    // at the scan and ships doc-count rows — routing it through the
    // widened w-exchange made it a third full-token reader of that
    // exchange (the armed sf0.1 budget caught the 3× shuffle)
    val cnt = tok0.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(cnt.select($"doc_id".as("a_id"), $"n".as("na"))), "a_id")
      .join(broadcast(cnt.select($"doc_id".as("b_id"), $"n".as("nb"))), "b_id")
  }

  /** Carry-n shape for corpora whose count dim outgrows broadcast: n is
    * computed on the shingle ARRAY before the explode (same value the
    * groupBy count produces) and rides the w-shuffle, so na/nb fall out of
    * the pair aggregation (min of a group-constant) and the candidate
    * frame never reshuffles.
    */
  private[llm] def interCountsCarryN(docs: DataFrame, pairParts: Int = 0,
      shj: Boolean = false): DataFrame = {
    val tok0 = docs
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .withColumn("arr", array_distinct(
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ", slice(col("ws"), i + 1, lit(3))))))
      .select(col("doc_id"), size(col("arr")).cast(LongType).as("n"),
        explode(col("arr")).as("w"))
    val tokL = if (pairParts > 0) tok0.repartition(pairParts, col("w")) else tok0
    val tok = if (shj) tokL.hint("SHUFFLE_HASH") else tokL
    tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
  }

  private[llm] def interCounts(s: SparkSession, d: String): DataFrame =
    interMemo.computeIfAbsent((s, d), _ => {
      val docs = documents(s, d)
      // interCounts is only built on the naive-dispatch path, where the
      // profile (memoized, already paid by the blowup dispatch) is in
      // hand — its Σdf² sizes the pair stage. The explicit exchange only
      // engages when the derived width EXCEEDS the session layout: at or
      // below it the planner's own w-exchange is identical and cheaper
      // (no separate repartition node).
      val base = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val stats = docShingleStats(s, d)
      val derived = pairBuildPartitions(s, stats.sumDf2)
      val parts = if (derived > base) derived else 0
      // shuffled-hash dispatch: the WORST partition's build side — its
      // uniform share of the token rows plus the hottest shingle's entire
      // df (all of which hashes to one partition) — must fit the
      // memory-derived cap (see shjSafe / shjBuildRowsCap)
      val shj = shjSafe(stats.tokens, stats.maxDf, math.max(base, derived),
        shjBuildRowsCap(s, InterShjBytesPerRow))
      val frame =
        if (docCount(s, d) <= InterBroadcastDocsCutover)
          interCountsBroadcast(docs, parts, shj)
        else interCountsCarryN(docs, parts, shj)
      graft.FrameRegistry.tracked(s, "inter_counts", frame, d)
    })

  /** Drop the parent candidate frame's cache once BOTH filtered pair
    * families are materialized (Bench's jaccard_pairs + contain_pairs
    * build stages force them): the unthresholded frame can dwarf the
    * good-pair frames at scale and no registered consumer reads it after
    * the two projections exist. The memo entry stays, so an off-registry
    * threshold still gets a correct (recomputed-lineage) answer. On the
    * lazy consumer path (Verify, ad-hoc use) nothing forces the children,
    * so the parent stays cached — unpersisting before a child
    * materializes would recompute the whole self-join.
    */
  private[llm] def releaseInterCounts(s: SparkSession, d: String): Unit = {
    // slot-scoped: the family holds one frame per dir, and a multi-dir
    // session (PairStateProbe's scale loop) must not lose sibling dirs'
    // caches when one dir's pair children materialize
    graft.FrameRegistry.releaseSlot(s, "inter_counts", d); ()
  }

  /** Session-scoped materialized intermediate over [[jaccardPairs]].
    *
    * Four registered queries (dedup_ngram_jaccard, dedup_cluster,
    * dedup_cluster_dist, graph_pagerank) all derive from the SAME
    * exact-Jaccard pair graph — a classic shared subplan in a dedup
    * pipeline. The inverted-index self-join dominates all four (~Σdf²
    * candidate pairs), while its OUTPUT is tiny (good pairs only), so the
    * first evaluation caches the pair graph and the rest reuse it — the
    * same build-once-share-across-reads contract as the reference's bucket
    * index (`/root/reference/src/index/bucket.rs:85-117`). Sound because
    * the inputs are immutable datasets (the shardpack write model: shards
    * append, never mutate), keyed by (session, dir, threshold) so distinct
    * sessions or scale factors never cross-contaminate. `persist()` is
    * lazy: plan audits still see the full join lineage and nothing runs at
    * plan time.
    *
    * Naive dispatch derives from the SHARED [[interCounts]] frame
    * (output-identical to [[jaccardPairs]] by construction — the same
    * pair/count plan with the metric applied as a projection;
    * SharedInterSpec pins all three paths equal); heavy-tailed corpora
    * dispatch to [[jaccardPairsPrefix]] exactly as before.
    */
  private val pairMemo =
    new graft.SessionMemo[(SparkSession, String, Double), DataFrame]()
  private[llm] def goodPairs(s: SparkSession, d: String, t: Double): DataFrame =
    pairMemo.computeIfAbsent((s, d, t), _ => {
      val frame =
        if (docShingleStats(s, d).blowup <= JaccardBlowupCutover) {
          val jac = col("inter").cast(DoubleType) /
            (col("na") + col("nb") - col("inter"))
          interCounts(s, d).filter(jac >= t)
            .select($"a_id", $"b_id", $"inter", jac.as("jac"))
        } else jaccardPairsPrefix(documents(s, d), t)
      graft.FrameRegistry.tracked(s, "jaccard_pairs", frame, d)
    })

  /** Containment-pair twin of [[goodPairs]] — same build-once-share
    * contract, separate map because the metric differs (inter/min vs
    * inter/union): a (session, dir, threshold) key collision between the
    * two families would silently serve the wrong pair graph. Round-5
    * verdict flagged the asymmetry: the shingle *profile* was memoized but
    * the containment pair frame was rebuilt per invocation (2.85 s warm,
    * the registry's slowest query) while its Jaccard siblings read cache.
    * Naive dispatch shares [[interCounts]] with the Jaccard family.
    */
  private val containPairMemo =
    new graft.SessionMemo[(SparkSession, String, Double), DataFrame]()
  private[llm] def goodContainPairs(s: SparkSession, d: String, t: Double): DataFrame =
    containPairMemo.computeIfAbsent((s, d, t), _ => {
      val frame =
        if (docShingleStats(s, d).blowup <= JaccardBlowupCutover) {
          val cont = col("inter").cast(DoubleType) / least(col("na"), col("nb"))
          interCounts(s, d).filter(cont >= t)
            .select($"a_id", $"b_id", $"inter", cont.as("cont"))
        } else containmentPairsPrefix(documents(s, d), t)
      graft.FrameRegistry.tracked(s, "contain_pairs", frame, d)
    })

  /** PREFIX-FILTERED exact Jaccard pairs (AllPairs/PPJoin family): order
    * every doc's shingles by a global total order (document frequency asc,
    * shingle asc) and generate candidates only from the first
    * `n − ⌈t·n⌉ + 1` shingles of each doc — any pair with Jaccard ≥ t
    * provably shares a token inside both prefixes, so the candidate set is
    * complete; candidates are then verified exactly by sorted shingle-array
    * intersection. The scale path for heavy-tailed shingle frequencies,
    * where the naive join's Σdf² explodes on hot shingles but the prefix
    * (built from the RAREST shingles of each doc) stays sparse. Identical
    * output to [[jaccardPairs]] by construction and by spec test.
    */
  def jaccardPairsPrefix(docs: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = shingleTok(docs)
    val cnt = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val dfreq = tok.groupBy($"w").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, "w")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"w")))
      .join(cnt, "doc_id")
    val prefix = ranked.filter($"rk" <= $"n" - ceil($"n" * t) + 1)
      .select($"doc_id", $"w")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val sets = tok.groupBy($"doc_id")
      .agg(sort_array(collect_list($"w")).as("ws"), count(lit(1)).as("n"))
    val jac = col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter"))
    cand
      .join(sets.select($"doc_id".as("a_id"), $"ws".as("wa"), $"n".as("na")), "a_id")
      .join(sets.select($"doc_id".as("b_id"), $"ws".as("wb"), $"n".as("nb")), "b_id")
      .withColumn("inter", size(array_intersect($"wa", $"wb")).cast(LongType))
      .filter(jac >= t)
      .select($"a_id", $"b_id", $"inter", jac.as("jac"))
  }

  /** Shingle-frequency profile driving the naive-vs-prefix dispatch.
    * `blowup = Σdf²/T` is the naive join's exact candidate-pair count per
    * input token — the cost ratio between the inverted-index join and a
    * linear pass. Doubles, not longs: Σdf² overflows Long on a 100 TB
    * corpus with df ~ 1e10.
    */
  final case class ShingleStats(tokens: Long, sumDf2: Double, maxDf: Long) {
    def blowup: Double = sumDf2 / math.max(1L, tokens)
  }

  def shingleStats(docs: DataFrame): ShingleStats = {
    val r = shingleTok(docs).groupBy($"w").agg(count(lit(1)).as("df"))
      .agg(sum($"df").cast(LongType), sum($"df".cast(DoubleType) * $"df"),
        max($"df").cast(LongType)).head()
    if (r.isNullAt(0)) ShingleStats(0L, 0.0, 0L)
    else ShingleStats(r.getLong(0), r.getDouble(1), r.getLong(2))
  }

  /** Measured crossover (DedupBench, sf0.1, local[32], threshold 0.5 —
    * table recorded in BASELINE.md): naive wins at benign blowup
    * (10.7 → 5.47 s vs 6.91 s) and at mild skew (19.0 → 3.36 vs 5.44),
    * but PREFIX already wins at blowup 83.5 (4.94 s vs 5.89 s). A linear
    * fit through the two skewed naive points crosses the ~5 s prefix
    * plateau near blowup ≈ 65; 45 is the ship point because the two error
    * modes are asymmetric — past the crossover the naive join's Σdf²
    * candidate volume grows quadratically in df while prefix stays flat,
    * so cutting over early forfeits a bounded ~1.5× naive edge, while
    * cutting over late costs unboundedly more as skew grows.
    */
  val JaccardBlowupCutover: Double = 45.0

  /** Df-profile-driven dispatch between [[jaccardPairs]] (benign df) and
    * [[jaccardPairsPrefix]] (heavy-tailed df). The stats pass is one cheap
    * shuffle over the token frame — O(T) against the joins' O(Σdf²) — the
    * right trade on any corpus big enough for the choice to matter.
    * Output-identical either way (LlmSpec pins A/B equality).
    */
  def jaccardPairsAuto(docs: DataFrame, t: Double): DataFrame =
    jaccardPairsAuto(docs, t, shingleStats(docs))

  /** [[jaccardPairsAuto]] with a caller-supplied profile (see
    * [[docShingleStats]]).
    */
  def jaccardPairsAuto(docs: DataFrame, t: Double, stats: ShingleStats): DataFrame =
    if (stats.blowup <= JaccardBlowupCutover) jaccardPairs(docs, t)
    else jaccardPairsPrefix(docs, t)

  /** Naive inverted-index containment pairs: inter / min(|a|,|b|) ≥ t over
    * distinct word shingles. Same Σdf² candidate volume as [[jaccardPairs]].
    */
  def containmentPairs(docs: DataFrame, t: Double): DataFrame = {
    val tok = shingleTok(docs)
    val cnt = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pair = tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    val cont = col("inter").cast(DoubleType) / least(col("ca.n"), col("cb.n"))
    pair
      .join(cnt.as("ca"), col("ca.doc_id") === col("a_id"))
      .join(cnt.as("cb"), col("cb.doc_id") === col("b_id"))
      .filter(cont >= t)
      .select($"a_id", $"b_id", $"inter", cont.as("cont"))
  }

  /** PREFIX-FILTERED containment pairs — the one-sided AllPairs variant.
    * Containment ≥ t is measured against the SMALLER doc s (|s| = min), so
    * s can miss at most |s| − ⌈t·|s|⌉ of its shingles: by pigeonhole any
    * fixed |s| − ⌈t·|s|⌉ + 1 of them (we take the globally RAREST, df-asc)
    * must intersect the partner's full shingle set. Candidates therefore
    * come from a prefix ⋈ full-token join restricted to (pn,p_id) <
    * (fn,f_id) — each unordered pair generated exactly once from its
    * designated smaller side — which at t = 0.8 probes only ~20% of
    * tokens, the rare-shingle end, against the index. Exact verification
    * by sorted-array intersection, identical output to
    * [[containmentPairs]] (LlmSpec pins A/B equality).
    */
  def containmentPairsPrefix(docs: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = shingleTok(docs)
    val cnt = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val dfreq = tok.groupBy($"w").agg(count(lit(1)).as("df"))
    val prefix = tok.join(dfreq, "w")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"w")))
      .join(cnt, "doc_id")
      .filter($"rk" <= $"n" - ceil($"n" * t) + 1)
      .select($"doc_id".as("p_id"), $"w".as("pw"), $"n".as("pn"))
    val full = tok.join(cnt, "doc_id")
      .select($"doc_id".as("f_id"), $"w".as("fw"), $"n".as("fn"))
    val cand = prefix.join(full,
        $"pw" === $"fw" &&
          ($"pn" < $"fn" || ($"pn" === $"fn" && $"p_id" < $"f_id")))
      .select(least($"p_id", $"f_id").as("a_id"),
        greatest($"p_id", $"f_id").as("b_id"))
      .distinct()
    val sets = tok.groupBy($"doc_id")
      .agg(sort_array(collect_list($"w")).as("ws"), count(lit(1)).as("n"))
    val cont = col("inter").cast(DoubleType) / least(col("na"), col("nb"))
    cand
      .join(sets.select($"doc_id".as("a_id"), $"ws".as("wa"), $"n".as("na")), "a_id")
      .join(sets.select($"doc_id".as("b_id"), $"ws".as("wb"), $"n".as("nb")), "b_id")
      .withColumn("inter", size(array_intersect($"wa", $"wb")).cast(LongType))
      .filter(cont >= t)
      .select($"a_id", $"b_id", $"inter", cont.as("cont"))
  }

  /** Df-profile dispatch for containment, sharing [[JaccardBlowupCutover]]:
    * the candidate volumes differ (Σ df_prefix·df against the naive Σdf²,
    * with a prefix only (1−t)·n long), but both error modes keep the same
    * asymmetry — early cutover forfeits a bounded naive edge, late cutover
    * pays quadratically in hot-shingle df — so the conservative Jaccard
    * ship point transfers.
    */
  def containmentPairsAuto(docs: DataFrame, t: Double): DataFrame =
    containmentPairsAuto(docs, t, shingleStats(docs))

  /** [[containmentPairsAuto]] with the profile supplied by the caller —
    * lets registered queries reuse the memoized per-(session, dir) stats
    * instead of re-paying the O(T) profile pass on every invocation.
    */
  def containmentPairsAuto(docs: DataFrame, t: Double, stats: ShingleStats): DataFrame =
    if (stats.blowup <= JaccardBlowupCutover) containmentPairs(docs, t)
    else containmentPairsPrefix(docs, t)

  /** Memoized shingle-frequency profile of the `documents` table, keyed like
    * [[goodPairs]] — the dispatch statistic is a property of the immutable
    * input dataset, so one O(T) pass per (session, dir) serves every
    * df-dispatched query. Since r13 the pass is SHARED with the fuzzy
    * block profile ([[ProfileStats]]): one corpus read fills both memos,
    * so whichever of `build:shingle_stats` / `build:fuzzy_stats` runs
    * first pays the combined (≈ shingle-sized) cost and the other reads
    * the memo.
    */
  private[llm] def docShingleStats(s: SparkSession, d: String): ShingleStats =
    ProfileStats.of(s, d).shingle

  /** Shared oracle for dedup_cluster AND its distributed twin
    * [[ScaleDedup]].dedup_cluster_dist: recursive-CTE transitive closure of
    * the exact-Jaccard ≥ 0.5 pair graph, min label per component.
    */
  private[llm] lazy val ClusterOracleSql: String =
    s"""WITH RECURSIVE tok AS (
       |  ${sqlShingleTok("documents")}),
       |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
       |pair AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |good AS (
       |  SELECT a_id, b_id FROM pair
       |  JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
       |  WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
       |edges AS (SELECT a_id AS u, b_id AS v FROM good
       |          UNION ALL SELECT b_id, a_id FROM good),
       |reach(u, label) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u)
       |SELECT u AS doc_id, min(label) AS cluster FROM reach
       |GROUP BY u ORDER BY doc_id""".stripMargin

  /** MinHash candidate pairs (est_jac ≥ 0.5), memoized per (session, dir)
    * — the SAME shared-intermediate contract as [[goodPairs]]: the band
    * join runs once, dedup_minhash and dedup_minhash_cluster both read the
    * cached (tiny) pair graph.
    */
  private val minhashMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()
  private[llm] def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashMemo.computeIfAbsent((s, d), _ => {
      val sig = minhashSig(s, d)
      // band rows are EXACTLY 8·docs (every doc emits one row per band),
      // so the BandShjMinRows lower bound is decidable from the memoized
      // doc count alone — below it the planner's broadcast wins and the
      // bucket profile job would be pure overhead (measured: the profile
      // added ~2 s to build:minhash_pairs at sf0.1 where the gate then
      // kept the broadcast anyway)
      val rows = 8L * docCount(s, d)
      val shj = rows >= BandShjMinRows && {
        // band-bucket profile for the shuffled-hash dispatch: one
        // vocab-sized map-combine aggregate over the (doc_id, band, bh)
        // rows — O(8·docs) against the band join's O(Σ bucket²) candidate
        // volume. maxBucket is the skew signal shjSafe needs: a near-dup
        // cluster of c docs is ONE (band, bh) key of c build rows, all of
        // which hash to a single partition of the build relation.
        val prof = bandedFrame(sig).groupBy($"band", $"bh")
          .agg(count(lit(1)).as("c"))
          .agg(max($"c").cast(LongType)).head()
        val maxBucket = if (prof.isNullAt(0)) 0L else prof.getLong(0)
        val base = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
        shjSafe(rows, maxBucket, base, shjBuildRowsCap(s, BandShjBytesPerRow))
      }
      graft.FrameRegistry.tracked(s, "minhash_pairs",
        minhashPairsRaw(sig, shj), d)
    })

  /** Memoized 32-perm signature frame over the driver tables — shared by
    * the band join ([[minhashPairs]]) and the band-calibration sweep
    * (`dedup_minhash_curve`): the shingle explode + 32-way min-agg is the
    * expensive stage, and every banding config reads the SAME signatures
    * (that is what makes the sweep a calibration, not three experiments).
    */
  private val sigMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()
  private[llm] def minhashSig(s: SparkSession, d: String): DataFrame =
    sigMemo.computeIfAbsent((s, d), _ =>
      graft.FrameRegistry.tracked(s, "minhash_sig", minhashSigRaw(documents(s, d)), d))

  /** Shared 6-plane LSH frame (vec_id, label, v, bkt, n2), materialized
    * behind an exchange and memoized per (session, dir) — the "build the
    * LSH index" pass shared by sim_ann_multiprobe and sim_ann_recall.
    * The plane count, probe set, and cosine expression live HERE, once,
    * in both their SQL and Column forms: they appear in two queries ×
    * two engines, and a drifted copy is a silent oracle divergence.
    */
  private val LshPlanes = 6
  private val lshMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()
  private def lshFrame(s: SparkSession, d: String): DataFrame =
    lshMemo.computeIfAbsent((s, d), _ => {
      val e0 = embeddings(s, d)
        .select($"vec_id", $"label", quantize($"embedding").as("v"))
        .withColumn("n2", qnorm2($"v"))
        .repartition(col("vec_id"))
      val bucket = AnnSigns.take(LshPlanes).foldLeft(lit(0L): Column) { (acc, sv) =>
        val proj = qdot($"v", array(sv.map(lit(_)): _*))
        acc * 2 + when(proj > 0, lit(1L)).otherwise(lit(0L))
      }
      graft.FrameRegistry.tracked(s, "lsh_frame", e0.withColumn("bkt", bucket), d)
    })

  /** DuckDB fold mirroring lshFrame's bucket column. */
  private def lshBucketSql: String =
    AnnSigns.take(LshPlanes).foldLeft("CAST(0 AS BIGINT)") { (acc, sv) =>
      val proj = sqlQdot("v", sv.mkString("[", ",", "]"))
      s"(($acc) * 2 + CASE WHEN $proj > 0 THEN 1 ELSE 0 END)"
    }

  /** Query cell + Hamming-1 neighbors (flip one plane each), both forms. */
  private def lshProbeSql: String = (Seq("b.bkt = q.qbkt") ++
    (0 until LshPlanes).map(i => s"b.bkt = xor(q.qbkt, ${1L << i})")).mkString(" OR ")
  private def lshProbeCol: Column = (Seq($"bkt" === $"qbkt") ++
    (0 until LshPlanes).map(i => $"bkt" === $"qbkt".bitwiseXOR(lit(1L << i))))
    .reduce(_ || _)

  /** Fixed-op-order cosine over the lshFrame/q column names, both forms. */
  private def lshCosSql: String =
    s"CAST(${sqlQdot("b.v", "q.qv")} AS DOUBLE) / " +
      "(sqrt(CAST(b.n2 AS DOUBLE)) * sqrt(CAST(q.qn2 AS DOUBLE)))"
  private def lshCosCol: Column =
    qdot($"v", $"qv").cast(DoubleType) /
      (sqrt($"n2".cast(DoubleType)) * sqrt($"qn2".cast(DoubleType)))
  private def lshQueryFrame(b: DataFrame): DataFrame =
    b.filter($"vec_id" === 1)
      .select($"v".as("qv"), $"bkt".as("qbkt"), $"n2".as("qn2"))

  /** Fixed-op-order cosine between a (v, n2) row and a centroid (cv, cn2),
    * Column + SQL forms — shared by the IVF family (sim_ann_ivf,
    * sim_ann_ivf_kmeans); a drifted copy is a silent oracle divergence.
    */
  private def ivfCosCol(v: Column, n2: Column, cv: Column, cn2: Column): Column =
    qdot(v, cv).cast(DoubleType) /
      (sqrt(n2.cast(DoubleType)) * sqrt(cn2.cast(DoubleType)))
  private def sqlIvfCos(dv: String, dn: String, cv: String, cn: String): String =
    s"CAST(${sqlQdot(dv, cv)} AS DOUBLE) / " +
      s"(sqrt(CAST($dn AS DOUBLE)) * sqrt(CAST($cn AS DOUBLE)))"

  /** Driver-side replica of the same op order, for probe-cell selection
    * over collected centroids (the bounded "load the index" state).
    */
  private def qcosArr(x: Array[Long], y: Array[Long]): Double = {
    var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  /** argmax-cosine cell assignment against broadcast literal centroids:
    * array_max over (cos, -cid) structs = highest cosine, ties to the
    * smaller cid — lexicographic struct ordering, a pure map, no shuffle.
    */
  private def ivfCellCol(cents: Seq[(Long, Array[Long])]): Column = {
    // centroid norms are constants — stamp them as literals instead of
    // re-running the 64-element qnorm2 aggregate 16× PER ROW (measured ~2×
    // assignment cost at sf1 before this)
    val centLit = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"),
        lit(cv.map(x => x * x).sum).as("cn2"))
    }: _*)
    -array_max(transform(centLit, c => struct(
      ivfCosCol($"v", $"n2", c.getField("cv"), c.getField("cn2")).as("cos"),
      (-c.getField("cid")).as("ncid")))).getField("ncid")
  }

  /** Product-quantization geometry shared by `embedding_pq` /
    * `sim_ann_adc`: M=8 subspaces × S=8 dims, K=16 codewords per subspace.
    * Codebook = subvectors of the vectors with `vec_id < K` (the same
    * bounded cold-start "load the index" collect as the IVF family; at
    * 100 TB the codebook is trained offline and broadcast — these literals
    * ARE that broadcast). Codes address codewords by their source vec_id,
    * not positional index, so a fixture with sparse low ids stays correct.
    */
  private val PqM = 8; private val PqS = 8; private val PqK = 16

  /** The PQ/ADC machinery lives in the PUBLIC [[VectorIndex]] API (the
    * user-facing surface a pipeline calls directly; streaming-parity
    * spec'd there) — these thin aliases keep the registry queries reading
    * like their oracle SQL.
    */
  private def pqCodebook(eq: DataFrame): VectorIndex.Codebook =
    VectorIndex.codebook(eq)

  /** (vec_id, label, codes ARRAY<INT>, err BIGINT) over the shared
    * quantized-index frame.
    */
  private def pqCodesFrame(eq: DataFrame, cb: VectorIndex.Codebook): DataFrame =
    VectorIndex.encode(eq, cb).select($"vec_id", $"label", $"codes", $"err")

  private def adcCol(cb: VectorIndex.Codebook, qv: Array[Long]): Column =
    VectorIndex.adcScore(cb, qv)

  /** DuckDB CTE block shared by the PQ oracle queries: subvectors, the
    * vec_id<K codebook, and the per-subspace argmin assignment (same
    * tie-break as [[VectorIndex.encode]]: {'d','k'} struct min).
    */
  private def sqlPqCtes(withLabel: Boolean): String = {
    val lbl = if (withLabel) ", label" else ""
    val slbl = if (withLabel) ", s.label" else ""
    s"""e AS (SELECT vec_id$lbl, ${sqlQuantize("embedding")} AS v FROM embeddings),
       |ms AS (SELECT unnest(range($PqM)) AS m),
       |sub AS (SELECT vec_id$lbl, m, v[m*$PqS+1 : m*$PqS+$PqS] AS sv FROM e, ms),
       |csub AS (SELECT vec_id AS k, m, v[m*$PqS+1 : m*$PqS+$PqS] AS cv
       |  FROM e, ms WHERE vec_id < $PqK),
       |asn AS (SELECT s.vec_id$slbl, s.m,
       |  (list_min(list({'d': ${sqlQdist2("s.sv", "c.cv")}, 'k': c.k}))).d AS d,
       |  (list_min(list({'d': ${sqlQdist2("s.sv", "c.cv")}, 'k': c.k}))).k AS k
       |  FROM sub s JOIN csub c ON s.m = c.m GROUP BY s.vec_id$slbl, s.m, s.sv)""".stripMargin
  }

  /** dedup_incremental's asymmetric (batch ⋈ corpus) band-join pipeline,
    * memoized per (session, dir) like [[minhashPairs]] so the persisted
    * signature frame is allocated once, not per invocation.
    */
  private val incrMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()
  private def incrementalPairs(s: SparkSession, d: String): DataFrame =
    incrMemo.computeIfAbsent((s, d), _ => {
      val numHashes = 32
      val bands = 8
      val rows = numHashes / bands
      val tok = shingleTok(documents(s, d)).withColumn("x", H.wordHash($"w"))
      val sigCols = (0 until numHashes).map(i => min(H.affine(i, $"x")).as(s"h$i"))
      val sig = graft.FrameRegistry.tracked(s, "incremental_sigs",
        tok.groupBy($"doc_id")
          .agg(sigCols.head, sigCols.tail: _*)
          .select($"doc_id",
            array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig")), d)
      val banded = sig.select($"doc_id",
          posexplode(array((0 until bands).map(b =>
            H.foldHash((0 until rows).map(r => col("sig")(b * rows + r)))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      val cand = banded.filter($"doc_id" % 2 === 1).as("b")
        .join(banded.filter($"doc_id" % 2 === 0).as("c"),
          col("b.band") === col("c.band") && col("b.bh") === col("c.bh"))
        .select(col("b.doc_id").as("batch_id"), col("c.doc_id").as("corpus_id"))
        .distinct()
      cand
        .join(sig.select($"doc_id".as("batch_id"), $"sig".as("sa")), Seq("batch_id"))
        .join(sig.select($"doc_id".as("corpus_id"), $"sig".as("sb")), Seq("corpus_id"))
        .withColumn("est_jac",
          aggregate(zip_with($"sa", $"sb", (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast(DoubleType) / numHashes)
        .filter($"est_jac" >= 0.5)
        .select($"batch_id", $"corpus_id", $"est_jac")
        .transform(graft.FrameRegistry.tracked(s, "incremental_pairs", _, d))
    })

  /** The band-join pipeline over an arbitrary document frame (doc_id,
    * text) — the memoized entry above binds it to the driver tables;
    * [[CurationPipeline.dedupNear]] applies it mid-pipeline.
    */
  private[llm] def minhashPairsOf(docsDf: DataFrame): DataFrame =
    minhashPairsFrom(minhashSigOf(docsDf))

  /** Per-doc perceptual image hash frame (doc_id, h BIGINT) behind
    * `dedup_image`, memoized per (session, dir): each document is
    * rendered as a deterministic 16×16 grayscale BMP (word-hash bucket
    * histogram → pixel intensities — the synthetic stand-in for a crawl's
    * image payloads; the container ships no image corpus), then goes
    * through the REAL pixel pipeline: BMP encode → ImageIO decode →
    * 8×8 aHash ([[Multimodal.imageAHash]]). The oracle replays the hash
    * arithmetic from the histogram directly, so a decode that returned
    * anything but the planted pixel matrix hash-diverges — the round-trip
    * IS the correctness proof of the decoder.
    *
    * Scale shape: ONE codegen scan of documents — the row-local
    * [[graft.functions.ImageRender.grayHist]] kernel renders the 16×16
    * histogram (the explode → groupBy → collect_list formulation it
    * replaces shuffled 500.8 MB / 30.6 s at sf10 for this pure per-row
    * value; the DuckDB oracle still runs that formulation, so the gate's
    * hash equality proves the rewrite) — then a map-side O(256)
    * encode+decode+hash per doc. No shuffle anywhere; the frame is
    * 16 B/doc. Persisted: the band join references it on both sides plus
    * the final pair rejoin.
    */
  private val imageHashMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()

  /** The planted-pixel frame (doc_id, gray ARRAY<INT>[256]) the image
    * queries decode from: each doc's 16×16 grayscale rendering, computed
    * row-locally in one codegen scan. Shingle buckets, not unigram
    * buckets: the driver corpus has ~31 distinct words, so a unigram
    * histogram saturates into one shared image (measured: 82% of ALL
    * pairs within Hamming 3); 3-gram shingles are the same sparsity fix
    * dedup_minhash rides. Docs with <3 tokens have no shingles and are
    * dropped, exactly as the oracle's explode drops them.
    */
  private def imageGrayFrame(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select($"doc_id",
        graft.functions.ImageRender.grayHistCol($"text").as("gray"))
      .filter(size($"gray") > 0)

  private[graft] def imageHashFrame(s: SparkSession, d: String): DataFrame =
    imageHashMemo.computeIfAbsent((s, d), _ => {
      // Array[Int] input: ArrayData converts via one primitive toIntArray
      // copy — a Seq[Int] parameter boxes all 256 cells per row
      val hashUdf = udf((gray: Array[Int]) => {
        val bmp = Multimodal.encodeBmpGray(16, 16, gray)
        Multimodal.imageAHash(bmp).getOrElse(
          sys.error("BMP pixel round-trip failed"))
      })
      graft.FrameRegistry.tracked(s, "image_hash",
        imageGrayFrame(s, d).select($"doc_id", hashUdf($"gray").as("h")), d)
    })

  /** Per-doc pooled pixel EMBEDDING frame (doc_id, e ARRAY<BIGINT>[64])
    * behind `multimodal_embed` and `sim_image_topk`, memoized per
    * (session, dir): the 16×16 rendering goes through the REAL codec
    * round-trip (BMP encode → ImageIO pixel decode) and then
    * [[Multimodal.pixelEmbed]]'s exact-integer 8×8 average pooling —
    * each cell the floor mean of its 2×2 source block. Same scale shape
    * as [[imageHashFrame]]: one codegen scan, map-side O(256) codec CPU
    * per doc, zero shuffle; the frame is ~0.5 KB/doc and both consumers
    * read it from cache (`build:image_embed` charges the fill).
    */
  private val imageEmbedMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()

  private def imageEmbedFrame(s: SparkSession, d: String): DataFrame =
    imageEmbedMemo.computeIfAbsent((s, d), _ => {
      val embUdf = udf((gray: Array[Int]) => {
        val bmp = Multimodal.encodeBmpGray(16, 16, gray)
        Multimodal.pixelEmbed(bmp, 8, 8).getOrElse(
          sys.error("BMP pixel round-trip failed"))
      })
      graft.FrameRegistry.tracked(s, "image_embed",
        imageGrayFrame(s, d).select($"doc_id", embUdf($"gray").as("e")), d)
    })

  /** The DuckDB replay of [[imageEmbedFrame]] as WITH-clause CTEs ending
    * in `pool(doc_id, i, v)` — the pooling computed from the planted
    * histogram cells without any codec: four histogram taps per grid
    * cell, `(v₀₀+v₀₁+v₁₀+v₁₁)//4`. Shared verbatim by the
    * `multimodal_embed` and `sim_image_topk` oracles so the two gates
    * pin the SAME arithmetic the shared frame computes once.
    */
  private def sqlImagePoolCtes: String =
    s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} % 256 AS p
       |  FROM (${sqlShingleTok("documents")})),
       |hist AS (SELECT doc_id, p, least(255, 16 * count(*)) AS v
       |  FROM w GROUP BY doc_id, p),
       |cell AS (SELECT CAST(unnest(range(64)) AS INT) AS i),
       |pool AS (SELECT d.doc_id, c.i,
       |    (COALESCE(h0.v, 0) + COALESCE(h1.v, 0)
       |     + COALESCE(h2.v, 0) + COALESCE(h3.v, 0)) // 4 AS v
       |  FROM (SELECT DISTINCT doc_id FROM hist) d
       |  CROSS JOIN cell c
       |  LEFT JOIN hist h0 ON h0.doc_id = d.doc_id
       |    AND h0.p = 32 * (c.i // 8) + 2 * (c.i % 8)
       |  LEFT JOIN hist h1 ON h1.doc_id = d.doc_id
       |    AND h1.p = 32 * (c.i // 8) + 2 * (c.i % 8) + 1
       |  LEFT JOIN hist h2 ON h2.doc_id = d.doc_id
       |    AND h2.p = 32 * (c.i // 8) + 2 * (c.i % 8) + 16
       |  LEFT JOIN hist h3 ON h3.doc_id = d.doc_id
       |    AND h3.p = 32 * (c.i // 8) + 2 * (c.i % 8) + 17)""".stripMargin

  /** Per-(doc, frame) perceptual hash frame (doc_id, f, ah, dh) behind
    * `dedup_video`, memoized per (session, dir): each document renders as
    * a 4-frame 16×16 grayscale "video" — frame f re-hashes every shingle
    * through the seeded affine family before bucketing, so the frames are
    * independent projections of the same content (near-dup docs agree on
    * most frames, unrelated docs on none) — then goes through the REAL
    * multi-frame codec pipeline: GIF encode → ImageIO frame decode →
    * per-frame aHash + dHash ([[Multimodal.videoFrameHashes]]). The
    * oracle replays both hash arithmetics from the planted histograms, so
    * the whole encode/decode round-trip is hash-proven like dedup_image's.
    *
    * Scale shape: ONE codegen scan of documents — the row-local
    * [[graft.functions.ImageRender.videoGrayHist]] kernel renders all
    * four 16×16 frame histograms (the shingle explode → two collect_list
    * regroupings it replaces shuffled 2,756.8 MB / 143.4 s at sf10 for
    * this pure per-row value; the DuckDB oracle still runs that
    * formulation) — then a map-side O(4·256) codec round-trip per doc
    * and a narrow 4-element explode. No shuffle touches pixels;
    * 32 B/frame output.
    */
  private val videoHashMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()
  private[llm] val VideoFrames = 4

  /** Frame rate planted in the AVI container (`multimodal_avi_features`):
    * µs-per-frame = 1000000/12 = 83333 exercises the integer-division
    * header arithmetic (a divisor of 10⁶ would make a wrong rounding
    * direction invisible).
    */
  private[llm] val AviFps = 12

  /** MJPEG MP4 timing plant (`multimodal_mp4_features`): timescale 90000
    * (the MPEG convention) with 3750 units/sample → 24 fps; duration
    * 4·3750 = 15000 units → 15000·10⁶/90000 = 166666 µs exercises the
    * truncating division in the mvhd duration arithmetic the same way
    * AviFps does for the RIFF path.
    */
  private[llm] val Mp4Timescale = 90000
  private[llm] val Mp4SampleDelta = 3750

  /** Anchors probed per (band, value) bucket in `dedup_image` — buckets
    * up to this size get EXACT pairwise treatment; above it, members
    * compare against the K smallest (mdoc, h) anchors only. K = 128
    * measured at sf1 ([[graft.ImageBandProbe]]): candidate volume
    * 85.7M → 9.7M (and Σ k·min(k,K) is corpus-LINEAR where Σk² was
    * quadratic), rep changed for 2.6% of hashes — all in the degenerate
    * all-zero-band dark core, where any anchor is an equally-valid
    * near-dup representative.
    */
  private[llm] val ImageAnchorK = 128

  /** Cluster-representative Hamming-≤3 near-dup over any 64-bit hash
    * frame (doc_id, h) — the pipeline behind `dedup_image`, shared with
    * `dedup_audio` (identical scale shape for every 64-bit perceptual
    * fingerprint): exact-hash collapse to a min-doc anchor, 4×16-bit
    * banding (pigeonhole-exact at distance ≤ 3), bounded
    * [[ImageAnchorK]]-anchor probing per (band, value) bucket via the
    * map-side-combinable [[graft.functions.MinKPairs]] aggregator, and a
    * min() rep aggregate — nothing pair-shaped survives a shuffle, output
    * is one row per doc at every scale. The unioned self-row keeps the
    * rep total even for hashes outside every bucket's anchor set.
    */
  private def hammingRepFrame(hashed: DataFrame): DataFrame = {
    val hg = hashed.groupBy($"h").agg(min($"doc_id").as("mdoc"))
    val bands = hg.select($"h", $"mdoc",
      explode(array((0 until 4).map(b => struct(lit(b).as("b"),
        shiftright($"h", b * 16).bitwiseAND(lit(65535L)).as("bv"))): _*)).as("e"))
      .select($"h", $"mdoc", $"e.b".as("b"), $"e.bv".as("bv"))
    val minK = udaf(new graft.functions.MinKPairs(ImageAnchorK))
    val anchors = bands.groupBy($"b", $"bv")
      .agg(minK($"mdoc", $"h").as("as"))
      .select($"b", $"bv", explode($"as").as("an"))
      .select($"b", $"bv", $"an._1".as("am"), $"an._2".as("ah"))
    val nbrMin = bands.join(anchors, Seq("b", "bv"))
      .filter(bit_count($"h".bitwiseXOR($"ah")) <= 3)
      .select($"h", $"am".as("m"))
      .union(hg.select($"h", $"mdoc".as("m")))
      .groupBy($"h").agg(min($"m").as("rep"))
    hashed.join(nbrMin, Seq("h"))
      .select($"doc_id", $"rep".as("rep_id"), ($"rep" < $"doc_id").as("is_dup"))
      .orderBy($"doc_id")
  }

  /** DuckDB mirror of [[hammingRepFrame]]: appends the hg/bands/anch/nbr
    * replay to a WITH-prefix whose final CTE is `hash(doc_id, h BIGINT)`.
    * The anchor selection replays as a `row_number() ≤ K` window ordered
    * by (mdoc, h) — the same total order MinKPairs keeps.
    */
  private def sqlHammingRep(withPrefix: String): String =
    s"""$withPrefix,
       |hg AS (SELECT h, min(doc_id) AS mdoc FROM hash GROUP BY h),
       |bands AS (SELECT h, mdoc, b, (h >> (16 * b)) & 65535 AS bv
       |  FROM hg, (SELECT unnest(range(4)) AS b)),
       |anch AS (SELECT b, bv, h, mdoc FROM (
       |    SELECT b, bv, h, mdoc,
       |      row_number() OVER (PARTITION BY b, bv ORDER BY mdoc, h) AS rn
       |    FROM bands) WHERE rn <= $ImageAnchorK),
       |nbr AS (SELECT h, min(m) AS rep FROM (
       |    SELECT a.h AS h, an.mdoc AS m
       |    FROM bands a JOIN anch an ON a.b = an.b AND a.bv = an.bv
       |    WHERE bit_count(xor(a.h, an.h)) <= 3
       |  UNION ALL SELECT h, mdoc AS m FROM hg)
       |  GROUP BY h)
       |SELECT hs.doc_id, n.rep AS rep_id, (n.rep < hs.doc_id) AS is_dup
       |FROM hash hs JOIN nbr n ON hs.h = n.h
       |ORDER BY hs.doc_id""".stripMargin

  /** Per-doc audio fingerprint frame (doc_id, h BIGINT) behind
    * `dedup_audio`, memoized per (session, dir): each document plants the
    * same deterministic PCM signal `multimodal_audio_features` decodes
    * (one signed 16-bit sample per whitespace token), goes through the
    * REAL RIFF/WAVE encode → javax.sound.sampled decode round-trip, and
    * the DECODED samples hash via [[Multimodal.audioFingerprint64]] —
    * 64 positional energy windows, bit = window above the floor mean.
    * The oracle replays the window arithmetic from the planted samples,
    * so a decoder deviation hash-diverges. Map-side codec + O(n) hash;
    * the frame is 16 B/doc. Persisted: the band join references it on
    * both sides plus the final rejoin.
    */
  private val audioHashMemo =
    new graft.SessionMemo[(SparkSession, String), DataFrame]()

  /** The planted per-token PCM signal both audio queries decode from. */
  private def audioSamplesCol: Column =
    transform(split($"text", " "),
      w => (H.wordHash(w) % 65536L - 32768L).cast(IntegerType))

  private def audioHashFrame(s: SparkSession, d: String): DataFrame =
    audioHashMemo.computeIfAbsent((s, d), _ => {
      val hashUdf = udf((samp: Array[Int]) => {
        val wav = Multimodal.encodeWavPcm16(8000, samp)
        val (_, dec) = Multimodal.decodeWavSamples(wav).getOrElse(
          sys.error("WAV sample round-trip failed"))
        require(dec.length == samp.length, "WAV sample count drifted")
        Multimodal.audioFingerprint64(dec)
      })
      graft.FrameRegistry.tracked(s, "audio_hash",
        documents(s, d).select($"doc_id", hashUdf(audioSamplesCol).as("h")), d)
    })

  private def videoHashFrame(s: SparkSession, d: String): DataFrame =
    videoHashMemo.computeIfAbsent((s, d), _ => {
      val grays = documents(s, d)
        .select($"doc_id",
          graft.functions.ImageRender.videoGrayHistCol($"text", VideoFrames)
            .as("gray"))
        .filter(size($"gray") > 0)
      // Array[Int] input — see imageHashFrame's boxing note
      val hashUdf = udf((gray: Array[Int]) => {
        val frames = (0 until VideoFrames).map { f =>
          val g = new Array[Int](256)
          var i = 0
          while (i < 256) { g(i) = gray(f * 256 + i); i += 1 }
          g
        }
        val gif = Multimodal.encodeGifGray(16, 16, frames)
        val hs = Multimodal.videoFrameHashes(gif)
        require(hs.length == frames.length, "GIF frame round-trip failed")
        hs.zipWithIndex.map { case ((ah, dh), f) => (f, ah, dh) }
      })
      graft.FrameRegistry.tracked(s, "video_hash",
        grays.select($"doc_id", explode(hashUdf($"gray")).as("e"))
          .select($"doc_id", $"e._1".as("f"), $"e._2".as("ah"), $"e._3".as("dh")), d)
    })

  /** 32-perm MinHash signature frame (doc_id, sig ARRAY<BIGINT>) over an
    * arbitrary document frame. Persisted: it is referenced three times by
    * the pair build alone (banding + both sides of the pair rejoin), plus
    * every calibration config (ReuseExchange does NOT unify the consumers'
    * exchanges once AQE broadcasts two of them). Lazy — nothing runs at
    * plan time; ~8 B + 256 B per doc cached.
    */
  /** Signature width shared by [[minhashSigOf]], the band join's slot
    * arithmetic ([[minhashPairsFrom]]) and the calibration configs —
    * one constant, so the sig build and its consumers can't desync.
    */
  private[llm] val MinhashPerms = 32

  private[llm] def minhashSigOf(docsDf: DataFrame): DataFrame =
    graft.FrameRegistry.transient(docsDf.sparkSession, "minhash_sig_call",
      minhashSigRaw(docsDf))

  /** The unpersisted signature build — callers pick a lifecycle: the
    * (session, dir) memo registers it TRACKED (stable across the
    * session), the per-call pipeline surface registers it in the bounded
    * transient family.
    */
  private def minhashSigRaw(docsDf: DataFrame): DataFrame = {
    val numHashes = MinhashPerms
    val tok = shingleTok(docsDf).withColumn("x", H.wordHash($"w"))
    val sigCols = (0 until numHashes).map(i => min(H.affine(i, $"x")).as(s"h$i"))
    tok.groupBy($"doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select($"doc_id",
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  private[llm] def minhashPairsFrom(sig: DataFrame): DataFrame =
    graft.FrameRegistry.transient(sig.sparkSession, "minhash_pairs_call",
      minhashPairsRaw(sig))

  /** The narrow (doc_id, band, bh) frame feeding the band self-join —
    * split out so [[minhashPairs]] can profile its bucket histogram for
    * the shuffled-hash dispatch without duplicating the banding
    * arithmetic.
    */
  private def bandedFrame(sig: DataFrame): DataFrame = {
    val bands = 8
    val rows = MinhashPerms / bands
    sig.select($"doc_id",
        posexplode(array((0 until bands).map(b =>
          H.foldHash((0 until rows).map(r => col("sig")(b * rows + r)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  }

  /** [[minhashPairsRaw]] exposed for the ExpBand A/B harness. */
  private[llm] def minhashPairsRawFor(sig: DataFrame, shj: Boolean): DataFrame =
    minhashPairsRaw(sig, shj)

  private def minhashPairsRaw(sig: DataFrame, shj: Boolean = false): DataFrame = {
      val numHashes = MinhashPerms
      // NARROW band join: the bucket shuffle carries only (doc_id, band,
      // bh) — 24 bytes/row — not the 32-long signature array (which
      // posexplode would duplicate ×8 bands). Candidates dedupe on the
      // narrow (a_id, b_id) pair, THEN the signatures rejoin by doc_id:
      // shuffle volume per candidate is 16 bytes instead of ~520, the
      // shape that holds when the corpus is 10^9 docs.
      // shj: the band keys are LONGS but sort-merge still pays a
      // per-partition sort of 8·docs rows on both sides; when the worst
      // partition's build side fits the memory-derived cap (the gate in
      // [[minhashPairs]] — guide §3.1), hint the self-join to
      // shuffled-hash like inter_counts'.
      val banded0 = bandedFrame(sig)
      val banded = if (shj) banded0.hint("SHUFFLE_HASH") else banded0
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      cand
        .join(sig.select($"doc_id".as("a_id"), $"sig".as("sa")), Seq("a_id"))
        .join(sig.select($"doc_id".as("b_id"), $"sig".as("sb")), Seq("b_id"))
        .withColumn("est_jac",
          aggregate(zip_with($"sa", $"sb", (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast(DoubleType) / numHashes)
        .filter($"est_jac" >= 0.5)
        .select($"a_id", $"b_id", $"est_jac")
  }

  /** Recursive-CTE oracle for clusters over the MINHASH candidate graph —
    * the signature/banding SQL of dedup_minhash feeding the same closure
    * as [[ClusterOracleSql]].
    */
  private[llm] lazy val MinhashClusterOracleSql: String = {
    val sigColsSql = (0 until 32)
      .map(i => s"min(${H.sqlAffine(i, "x")}) AS h$i").mkString(", ")
    val bandSql = (0 until 8).map(b =>
      s"SELECT doc_id, $b AS band, " +
        s"${H.sqlFoldHash((0 until 4).map(r => s"h${b * 4 + r}"))} AS bh FROM sig")
      .mkString(" UNION ALL ")
    val agreeSql = (0 until 32)
      .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH RECURSIVE tok AS (
       |  ${sqlShingleTok("documents")}),
       |x AS (SELECT doc_id, ${H.sqlWordHash("w")} AS x FROM tok),
       |sig AS (SELECT doc_id, $sigColsSql FROM x GROUP BY doc_id),
       |band AS ($bandSql),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM band a JOIN band b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |good AS (SELECT a_id, b_id
       |  FROM cand JOIN sig sa ON sa.doc_id = a_id JOIN sig sb ON sb.doc_id = b_id
       |  WHERE CAST(($agreeSql) AS DOUBLE) / 32 >= 0.5),
       |edges AS (SELECT a_id AS u, b_id AS v FROM good
       |          UNION ALL SELECT b_id, a_id FROM good),
       |reach(u, label) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u)
       |SELECT u AS doc_id, min(label) AS cluster FROM reach
       |GROUP BY u ORDER BY doc_id""".stripMargin
  }

  /** Merge rounds for bpe_merges — enough to exercise composite symbols
    * (merges of earlier merges appear by round 6 on the driver corpus).
    */
  private val BpeMergeRounds = 10

  /** Trained BPE state, memoized per (session, dir) like [[goodPairs]]:
    * the merge table ([[SparkEntry]] `bpe_merges`) and the final
    * word→tokenization histogram (`bpe_encode` applies it). The histogram
    * stays persisted — it is vocab-bounded, and training touches the
    * corpus exactly once (to build the word histogram), so re-running the
    * loop per consumer would redo N vocab-sized jobs for nothing.
    */
  private val bpeMemo = new graft.SessionMemo[
    (SparkSession, String), (Seq[(Int, String, String, String, Long)], DataFrame)]()
  private def bpeTrained(s: SparkSession, d: String)
      : (Seq[(Int, String, String, String, Long)], DataFrame) =
    bpeMemo.computeIfAbsent((s, d), { _ =>
      val tok = documents(s, d)
        .select(explode(
          graft.functions.TextStats.wordTokensCol($"text", 2)).as("w"))
      // DOUBLE-space separators ("  x  y  "): every symbol occurrence
      // owns a boundary space on each side, so ONE literal
      // replace(" a  b ", " ab ") is exactly greedy left-to-right BPE —
      // the matched region keeps one outer space per side and the
      // replacement restores the invariant, so the scanner never consumes
      // the next occurrence's lead. (A single-space scheme needed two
      // passes and STILL misaligned self-pair merges on symbol runs ≥ 5 —
      // caught by BpeMergesSpec's greedy-equivalence property.)
      // r12 optimization (guide §1.2 step 1 — fewer passes): rounds no
      // longer persist+count each replace result (2 jobs/round). The
      // BASE word histogram is the only corpus-derived state; each
      // round's argmax job applies the ≤9 accumulated merge replaces
      // map-side over the cached base (vocab-sized string work, trivial
      // against the job it rides in), so the loop runs 1 job per round
      // instead of 2, and one final materialization replaces the ten.
      // Merge order, replace semantics and the returned histogram are
      // bit-identical — the replaces chain in the same sequence.
      val base = tok.groupBy($"w").agg(count(lit(1)).as("freq"))
        .select($"w",
          concat(lit("  "), regexp_replace($"w", "(.)", "$1  ")).as("s"), $"freq")
        .persist()
      var cur = base
      val out = Seq.newBuilder[(Int, String, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= BpeMergeRounds && !exhausted) {
        // guard size >= 2 explicitly: Spark's sequence(1, 0) DESCENDS
        // ([1, 0]) instead of returning empty like DuckDB's range(1, 1)
        val pairs = cur.select(split(trim($"s"), "  ").as("syms"), $"freq")
          .filter(size($"syms") >= 2)
          .select(explode(transform(sequence(lit(1), size($"syms") - 1),
            i => struct(element_at($"syms", i).as("lhs"),
              element_at($"syms", i + 1).as("rhs")))).as("pr"), $"freq")
          .select($"pr.lhs", $"pr.rhs", $"freq")
          .groupBy($"lhs", $"rhs").agg(sum($"freq").cast(LongType).as("n"))
        pairs.orderBy($"n".desc, $"lhs", $"rhs").limit(1).collect() match {
          case Array() =>
            // every word is a single symbol: no pairs left to merge; the
            // oracle's b/w CTEs go empty the same round, so both engines
            // emit the same truncated merge table
            exhausted = true
          case Array(best) =>
            val (a, b, n) = (best.getString(0), best.getString(1), best.getLong(2))
            out += ((step, a, b, a + b, n))
            cur = cur.select($"w",
              replace($"s", lit(s" $a  $b "), lit(s" $a$b ")).as("s"), $"freq")
            step += 1
        }
      }
      if (!(cur eq base)) {
        // the consumers (bpe_merges/bpe_encode, the vocab memos) re-read
        // the FINAL histogram: cache it once, release the base
        cur = cur.persist()
        cur.count()
        base.unpersist()
      }
      (out.result(), cur)
    })

  /** Unrolled DuckDB oracle for bpe_merges: iteration k's CTEs rebuild the
    * word histogram from k−1's. `AS MATERIALIZED` is load-bearing — w/b
    * CTEs are each referenced twice, and inlining would double the subtree
    * per round (2^N blowup at the sf1 oracle gate).
    */
  /** Shared oracle for the two IVF search paths: `sim_ann_ivf` (in-memory
    * probe filter) and `sim_ann_ivf_partitioned` (cell-partitioned on-disk
    * layout). Same centroids, probe set, and top-k — physically different
    * plans, identical results BY CONSTRUCTION, which is exactly what the
    * shared oracle pins (the same contract as scan_parquet vs
    * scan_shardpack over one semantic result).
    */
  private lazy val simAnnIvfOracleSql: String = {
    def sqlCos(dv: String, dn: String, cv: String, cn: String) =
      s"CAST(${sqlQdot(dv, cv)} AS DOUBLE) / " +
        s"(sqrt(CAST($dn AS DOUBLE)) * sqrt(CAST($cn AS DOUBLE)))"
    // K is DERIVED from the corpus (kk mirrors deriveCellCount; rank
    // seeding mirrors coldStartRows) — probe selectivity keeps improving
    // as the corpus grows instead of freezing at a 16-cell demo grid
    s"""WITH e AS (SELECT vec_id, label, ${sqlQuantize("embedding")} AS v FROM embeddings),
       |n AS (SELECT vec_id, label, v, ${sqlQnorm2("v")} AS n2 FROM e),
       |kk AS (SELECT greatest(16, CAST(ceil(count(*) / $SemTargetCellPop.0) AS BIGINT)) AS k FROM n),
       |c AS (SELECT cid, cv, cn2 FROM (
       |    SELECT vec_id AS cid, v AS cv, n2 AS cn2,
       |           row_number() OVER (ORDER BY vec_id) AS rn FROM n)
       |  WHERE rn <= (SELECT k FROM kk)),
       |qv AS (SELECT v, n2 FROM n WHERE vec_id = 1),
       |probe AS (SELECT cid FROM c, qv
       |  ORDER BY ${sqlCos("qv.v", "qv.n2", "c.cv", "c.cn2")} DESC, cid LIMIT 2),
       |cell AS (SELECT n.vec_id, n.label, n.v, n.n2,
       |  -(list_max(list({'cos': ${sqlCos("n.v", "n.n2", "c.cv", "c.cn2")},
       |                   'ncid': -c.cid}))).ncid AS cell
       |  FROM n, c GROUP BY n.vec_id, n.label, n.v, n.n2)
       |SELECT cl.vec_id, cl.label, cl.cell,
       |  ${sqlCos("cl.v", "cl.n2", "qv.v", "qv.n2")} AS cos
       |FROM cell cl, qv WHERE cl.cell IN (SELECT cid FROM probe)
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Cell-partitioned IVF layout dir + its centroids, memoized per
    * (session, dir): [[VectorIndex.writeCellLayout]] pays the one
    * repartition-by-cell shuffle (the index-build cost) once; every probed
    * search after that reads only the probed cells' FILES.
    */
  private val cellLayoutMemo = new graft.SessionMemo[
    (SparkSession, String), (String, Seq[(Long, Array[Long])])]()
  private def ivfCellLayout(s: SparkSession, d: String)
      : (String, Seq[(Long, Array[Long])]) =
    cellLayoutMemo.computeIfAbsent((s, d), { _ =>
      val eq = lshFrame(s, d).select($"vec_id", $"label", $"v", $"n2")
      // same derived-K rank-seeded cold start as the in-memory path —
      // the two physical paths must share one coarse quantizer for the
      // shared oracle to pin them to one semantic result
      val cents = coldStartRows(eq, deriveCellCount(embCount(eq, Some((s, d)))))
      val dir = java.nio.file.Files.createTempDirectory("ivf-cells").toString
      VectorIndex.writeCellLayout(eq, cents, dir)
      (dir, cents)
    })

  /** Apply the (session, trainDir)-trained BPE vocabulary to an arbitrary
    * documents frame: per-doc word and token counts via one explode + one
    * vocab-keyed join against the trained word→tokenization histogram.
    * The histogram is a STATIC persisted frame, so `docs` may be a
    * streaming frame too — the join is a stream-static join and the
    * aggregation is a standard stateful agg (BpeStreamingSpec pins
    * batch/stream parity): the "train the tokenizer offline, meter the
    * ingest stream" deployment shape.
    */
  def bpeTokenize(s: SparkSession, trainDir: String, docs: DataFrame): DataFrame =
    if (!docs.isStreaming &&
        bpeVocabCount(s, trainDir) <= BpeVocabBroadcastCutover) {
      // broadcast-vocab serving: ONE codegen scan per document against
      // the broadcast word→token-count table ([[graft.functions.
      // BpeMeter]]) — zero shuffle, no per-occurrence explode row, no
      // join probe. The zero-word filter mirrors the explode path
      // dropping the group; BpeStreamingSpec pins this path equal to the
      // join path (its batch side dispatches here, its stream side
      // below).
      val bc = bpeVocabBcast(s, trainDir)
      docs
        .withColumn("__m", graft.functions.BpeMeter.meterCol($"text", bc))
        .filter($"__m.n_words" >= 1)
        .select($"doc_id", $"__m.n_words".as("n_words"),
          $"__m.n_tokens".as("n_tokens"))
    } else {
      // vocab-keyed join serving: the scale path when a web-scale vocab
      // outgrows a broadcast (AQE broadcasts the dim while it fits), and
      // the STREAMING path always — the histogram is a static persisted
      // frame, so this is a stream-static join + stateful agg, and the
      // spec's complete-mode sink requires the aggregation
      val wordToks = bpeTrained(s, trainDir)._2
        .select($"w", size(split(trim($"s"), "  ")).cast(LongType).as("toks"))
      docs
        .select($"doc_id", explode(
          graft.functions.TextStats.wordTokensCol($"text", 1)).as("w"))
        .join(wordToks, Seq("w"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(coalesce($"toks", lit(1L))).as("n_tokens"))
    }

  /** Broadcast cutover for [[bpeTokenize]]'s serving dispatch: up to this
    * many distinct trained words the vocabulary collects to one bounded
    * driver map (~tens of MB) and ships as a broadcast; past it the
    * serving join keys on the word — the same broadcast-vs-shuffle
    * boundary as [[InterBroadcastDocsCutover]], sized for entry strings
    * instead of 16-byte count rows.
    */
  private[llm] val BpeVocabBroadcastCutover = 1000000L

  private val bpeVocabCountMemo = new graft.SessionMemo[
    (SparkSession, String), java.lang.Long]()
  private def bpeVocabCount(s: SparkSession, d: String): Long =
    bpeVocabCountMemo.computeIfAbsent((s, d),
      _ => bpeTrained(s, d)._2.count()).longValue()

  /** The trained word→token-count table as a broadcast HashMap, memoized
    * per (session, dir) — only ever built on the ≤-cutover dispatch, so
    * the collect is bounded by [[BpeVocabBroadcastCutover]].
    */
  private val bpeVocabMemo = new graft.SessionMemo[
    (SparkSession, String),
    org.apache.spark.broadcast.Broadcast[java.util.HashMap[String, java.lang.Long]]]()
  private def bpeVocabBcast(s: SparkSession, d: String)
      : org.apache.spark.broadcast.Broadcast[java.util.HashMap[String, java.lang.Long]] =
    bpeVocabMemo.computeIfAbsent((s, d), _ => {
      val m = new java.util.HashMap[String, java.lang.Long]()
      bpeTrained(s, d)._2
        .select($"w", size(split(trim($"s"), "  ")).cast(LongType).as("toks"))
        .collect()
        .foreach(r => m.put(r.getString(0), java.lang.Long.valueOf(r.getLong(1))))
      s.sparkContext.broadcast(m)
    })

  /** One-Lloyd-round trained PQ codebook, memoized per (session, dir) —
    * a deployment trains the index once offline; re-paying the training
    * groupBy on every query invocation models nothing and doubles the
    * warm query cost. Deterministic (fixed seed rows, fixed rounds), so
    * caching cannot change any oracle-checked result.
    */
  private val trainedCbMemo = new graft.SessionMemo[
    (SparkSession, String), VectorIndex.Codebook]()
  private def trainedCodebook(s: SparkSession, d: String): VectorIndex.Codebook =
    trainedCbMemo.computeIfAbsent((s, d),
      _ => VectorIndex.trainCodebook(lshFrame(s, d), rounds = 1))

  /** One-Lloyd-round refined IVF centroids (sim_ann_ivf_kmeans's training
    * step), memoized per (session, dir) under the same train-once-serve-
    * many contract: assign to cold-start cells, per-cell element-wise
    * floor-mean via a bounded (cells×dim) aggregate collect.
    */
  private val kmeansCentsMemo = new graft.SessionMemo[
    (SparkSession, String), Seq[(Long, Array[Long])]]()
  private def kmeansRefined(s: SparkSession, d: String, eq: DataFrame,
      initRows: Seq[(Long, Array[Long])], dim: Int): Seq[(Long, Array[Long])] =
    kmeansCentsMemo.computeIfAbsent((s, d), _ => kmeansRefinedOf(eq, initRows, dim))

  /** The un-memoized Lloyd round, for callers training on frames with no
    * (session, dir) identity (CurationPipeline.dedupSemantic).
    */
  private def kmeansRefinedOf(eq: DataFrame,
      initRows: Seq[(Long, Array[Long])], dim: Int): Seq[(Long, Array[Long])] = {
    val sums = eq.withColumn("cell", ivfCellCol(initRows))
      .select($"cell", posexplode($"v"))
      .groupBy($"cell", $"pos").agg(sum($"col").as("sx"), count(lit(1)).as("cnt"))
      .collect()
    sums.groupBy(_.getLong(0)).toSeq.map { case (cell, rs) =>
      val arr = new Array[Long](dim)
      rs.foreach(r => arr(r.getInt(1)) =
        math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
      (cell, arr)
    }.sortBy(_._1)
  }

  /** Per-(session, dir, K) trained coarse quantizers for the K-sweep query
    * — same train-once-serve-many contract as [[kmeansRefined]], one slot
    * per swept K (3 × cells×dim driver state, bounded).
    */
  private val kSweepMemo = new graft.SessionMemo[
    (SparkSession, String, Int), Seq[(Long, Array[Long])]]()
  private def kSweepCents(s: SparkSession, d: String, eq: DataFrame,
      k: Int): Seq[(Long, Array[Long])] =
    kSweepMemo.computeIfAbsent((s, d, k), _ => {
      val init = coldStartRows(eq, k)
      kmeansRefinedOf(eq, init, init.head._2.length)
    })

  /** Target mean cell population for the SemDeDup/IVF-kmeans coarse
    * quantizer. The cell count K is DERIVED from the corpus as
    * K = max(16, ceil(n / target)) — SemDeDup's scale contract: the
    * within-cell stage is all-pairs per cell, so pair volume is
    * Σ cell² ≈ n·c̄; holding c̄ fixed while K grows with n keeps the
    * stage linear in the corpus instead of the quadratic n²/K a fixed
    * K degenerates to at 100 TB (Abbas et al. 2023 §3).
    */
  private[llm] val SemTargetCellPop = 2000L

  /** K = max(16, ceil(n / targetPop)) — shared by the Spark paths and
    * (as `greatest(16, ceil(count(*)/…))`) the oracle SQL; a drifted
    * copy is a silent oracle divergence.
    */
  private[llm] def deriveCellCount(n: Long, targetPop: Long = SemTargetCellPop): Int =
    math.max(16L, (n + targetPop - 1) / targetPop).toInt

  /** Corpus row count, memoized per (session, dir) alongside the other
    * index-build memos so the derived-K chain counts the registry frame
    * once per session, not once per consumer.
    */
  private val embCountMemo = new graft.SessionMemo[
    (SparkSession, String), java.lang.Long]()
  private def embCount(eq: DataFrame,
      memoKey: Option[(SparkSession, String)]): Long = memoKey match {
    case Some(k) => embCountMemo.computeIfAbsent(k, _ => eq.count()).longValue()
    case scala.None => eq.count()
  }

  /** Cold-start centroids: the K smallest vec_ids PRESENT (not
    * `vec_id < K` — arbitrary corpora handed to the public pipeline may
    * carry no low ids at all, which silently produced an empty seed set
    * and a no-op dedup before this). Matches the oracle's
    * `row_number() OVER (ORDER BY vec_id) <= K` seeding exactly.
    */
  private def coldStartRows(eq: DataFrame, k: Int): Seq[(Long, Array[Long])] =
    eq.orderBy($"vec_id").limit(k).select($"vec_id", $"v").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1).toSeq

  /** SemDeDup core shared by the dedup_semantic query and
    * [[CurationPipeline.dedupSemantic]]: one-Lloyd-round cells from the
    * K-smallest-vec_id cold start (K derived from corpus size — see
    * [[deriveCellCount]]), no-shuffle cell assignment, within-cell
    * greedy-by-id cosine pruning. `eq` must carry (vec_id, v, n2); output
    * is (vec_id, cell, is_dup, dup_of). `memoKey` reuses the per-(session,
    * dir) trained centroids when the input IS the registry's index frame.
    */
  private[llm] def semanticDedupFrame(eq: DataFrame, tau: Double,
      memoKey: Option[(SparkSession, String)],
      targetCellPop: Long = SemTargetCellPop,
      assignCutover: Int = VectorIndex.CellAssignJoinCutover,
      assignProbe: Int = VectorIndex.DefaultAssignProbe): DataFrame = {
    val nCent = deriveCellCount(embCount(eq, memoKey), targetCellPop)
    if (nCent > assignCutover) {
      // K past the broadcast-literal cutover: centroids stay in a FRAME,
      // assignment is the pruned join, Lloyd is fully distributed —
      // nothing K-sized in the plan or on the driver (VERDICT r9 #1; the
      // dedup_cluster cutover pattern applied to the coarse quantizer).
      // The gated corpora never reach this branch (K = 100 at sf10); it
      // is the 1e9+-embedding story, exercised by CellAssignCutoverSpec.
      val init = VectorIndex.coldStartFrame(eq, nCent)
      val refined = VectorIndex.trainCentroidsFrame(eq, init, nCent,
        rounds = 1, probe = assignProbe)
      val cells = VectorIndex
        .assignCellsJoin(eq.select($"vec_id", $"v", $"n2"), refined, nCent,
          assignProbe)
        .select($"vec_id", $"cell", $"v", $"n2")
      withinCellDups(cells, tau)
    } else {
      val initRows = coldStartRows(eq, nCent)
      if (initRows.isEmpty)
        eq.select($"vec_id", lit(0L).as("cell"), lit(false).as("is_dup"),
          lit(null).cast(LongType).as("dup_of")).filter(lit(false))
      else {
        val dim = initRows.head._2.length
        val refined = memoKey match {
          case Some((s, d)) => kmeansRefined(s, d, eq, initRows, dim)
          case scala.None => kmeansRefinedOf(eq, initRows, dim)
        }
        val cells = eq.withColumn("cell", ivfCellCol(refined))
          .select($"vec_id", $"cell", $"v", $"n2")
        withinCellDups(cells, tau)
      }
    }
  }

  /** SemDeDup's within-cell stage, shared by both assignment paths: all
    * pairs per cell (bounded by the derived target population), greedy
    * collapse onto the smallest same-cell vec_id above `tau`.
    */
  private def withinCellDups(cells: DataFrame, tau: Double): DataFrame = {
    val dups = cells.as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(ivfCosCol(col("a.v"), col("a.n2"), col("b.v"), col("b.n2")) >= tau)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("vec_id"))
      .groupBy($"vec_id").agg(min($"a_id").as("dup_of"))
    cells.select($"vec_id", $"cell")
      .join(dups, Seq("vec_id"), "left")
      .select($"vec_id", $"cell", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
  }

  /** One shared SQL text for the exact-arithmetic one-Lloyd-round k-means
    * training chain (derived cell count kk → cold-start c0 from the K
    * smallest vec_ids → assignment a0 → floor-mean refinement → refined
    * centroids `cn`) — consumed by BOTH sim_ann_ivf_kmeans and
    * dedup_semantic. The chain appears in two oracles × one Spark replica
    * ([[kmeansRefined]]); a drifted copy is a silent oracle divergence,
    * so it lives here once. `kk` mirrors [[deriveCellCount]] and c0's
    * rank seeding mirrors [[coldStartRows]].
    */
  private def sqlKmeansCellCtes: String =
    s"""e AS (SELECT vec_id, label, ${sqlQuantize("embedding")} AS v FROM embeddings),
       |n AS (SELECT vec_id, label, v, ${sqlQnorm2("v")} AS n2 FROM e),
       |kk AS (SELECT greatest(16, CAST(ceil(count(*) / $SemTargetCellPop.0) AS BIGINT)) AS k FROM n),
       |c0 AS (SELECT cid, cv, cn2 FROM (
       |    SELECT vec_id AS cid, v AS cv, n2 AS cn2,
       |           row_number() OVER (ORDER BY vec_id) AS rn FROM n)
       |  WHERE rn <= (SELECT k FROM kk)),
       |a0 AS (SELECT n.vec_id, n.v,
       |  -(list_max(list({'cos': ${sqlIvfCos("n.v", "n.n2", "c0.cv", "c0.cn2")},
       |                   'ncid': -c0.cid}))).ncid AS cell
       |  FROM n, c0 GROUP BY n.vec_id, n.v, n.n2),
       |sums AS (SELECT cell, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a0),
       |ref AS (SELECT cell, pos, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS ci
       |  FROM sums GROUP BY cell, pos),
       |cents AS (SELECT cell AS cid, list(ci ORDER BY pos) AS cv FROM ref GROUP BY cell),
       |cn AS (SELECT cid, cv, ${sqlQnorm2("cv")} AS cn2 FROM cents)""".stripMargin

  private def bpeCtes(rounds: Int): String = {
    // double-space separators — see bpeTrained: one literal replace per
    // merge is exactly greedy left-to-right BPE under this encoding
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT w, '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s, count(*) AS freq
        |  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |        FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w)""".stripMargin
    val iters = (1 to rounds).map { k =>
      s"""p$k AS (
         |  SELECT pr[1] AS lhs, pr[2] AS rhs, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT unnest([[syms[i], syms[i+1]] FOR i IN range(1, len(syms))]) AS pr, freq
         |        FROM (SELECT string_split(trim(s), '  ') AS syms, freq FROM w${k - 1}))
         |  GROUP BY lhs, rhs),
         |b$k AS MATERIALIZED (SELECT lhs, rhs, n FROM p$k ORDER BY n DESC, lhs, rhs LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT w.w, replace(w.s, ' '||b.lhs||'  '||b.rhs||' ', ' '||b.lhs||b.rhs||' ') AS s, w.freq
         |  FROM w${k - 1} w, b$k b)""".stripMargin
    }
    (w0 +: iters).mkString(",\n")
  }

  private def bpeMergesOracleSql(rounds: Int): String = {
    val finals = (1 to rounds)
      .map(k => s"SELECT $k AS step, lhs, rhs, lhs||rhs AS merged, n FROM b$k")
      .mkString(" UNION ALL ")
    s"WITH ${bpeCtes(rounds)}\nSELECT * FROM ($finals) ORDER BY step"
  }

  private def bpeEncodeOracleSql(rounds: Int): String =
    s"""WITH ${bpeCtes(rounds)},
       |dw AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
       |    FROM documents) WHERE length(w) >= 1)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(COALESCE(len(string_split(trim(t.s), '  ')), 1)) AS BIGINT) AS n_tokens
       |FROM dw LEFT JOIN w$rounds t ON dw.w = t.w
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Seq[Q] = Seq(

    // ───────────────────── deduplication ─────────────────────
    Q("dedup_exact",
      """SELECT sha256(text) AS h, count(*) AS n, min(doc_id) AS keep_id
        |FROM documents GROUP BY h ORDER BY h""".stripMargin) { (s, d) =>
      documents(s, d)
        .groupBy(sha2($"text", 256).as("h"))
        .agg(count(lit(1)).as("n"), min($"doc_id").as("keep_id"))
        .orderBy($"h")
    },

    // Paragraph-level boilerplate dedup (the CCNet construction, Wenzek et
    // al. 2020, arXiv:1911.00359 §3.1: hash every paragraph, drop the ones
    // whose hash repeats across documents — headers, footers, navigation
    // chrome). Corpus text has no paragraph marks, so the unit is the
    // doc_chunk convention's non-overlapping 32-word block. Per doc:
    // block count, boilerplate blocks (block-hash seen in ≥2 distinct
    // docs), and tokens surviving the drop. The text is gone before the
    // first exchange — blocks travel as (doc_id, toks, h); the df count
    // map-combines on h, the backjoin shuffles hash-sized keys, and the
    // per-doc rollup map-combines again, so at 100 TB every exchange is
    // block-metadata-sized, never corpus-sized.
    Q("dedup_paragraph",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |s AS (SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, words, n, (n + 31) // 32 AS n_blk FROM s),
        |x AS (SELECT doc_id, words, n, unnest(range(0, n_blk)) AS b FROM c),
        |blk AS (SELECT doc_id,
        |    CAST(least(32, n - b * 32) AS BIGINT) AS toks,
        |    sha256(array_to_string(
        |      list_slice(words, b * 32 + 1, b * 32 + least(32, n - b * 32)),
        |      ' ')) AS h
        |  FROM x),
        |df AS (SELECT h, count(DISTINCT doc_id) AS df FROM blk GROUP BY h)
        |SELECT blk.doc_id, count(*) AS n_blocks,
        |  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(sum(CASE WHEN df.df < 2 THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM blk JOIN df ON blk.h = df.h
        |GROUP BY blk.doc_id ORDER BY blk.doc_id""".stripMargin) { (s, d) =>
      val blk = documents(s, d)
        .select($"doc_id", split($"text", " ").as("words"))
        .withColumn("n", size($"words").cast(LongType))
        .withColumn("n_blk", expr("(n + 31) div 32"))
        .select($"doc_id", $"words", $"n",
          explode(sequence(lit(0L), $"n_blk" - 1)).as("b"))
        .withColumn("toks", least(lit(32L), $"n" - $"b" * 32))
        .select($"doc_id", $"toks",
          sha2(array_join(slice($"words", ($"b" * 32 + 1).cast(IntegerType),
            $"toks".cast(IntegerType)), " "), 256).as("h"))
      val dfByHash = blk.groupBy($"h")
        .agg(countDistinct($"doc_id").as("df"))
      blk.join(dfByHash, "h")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_blocks"),
          sum(when($"df" >= 2, 1L).otherwise(0L)).as("n_boiler"),
          sum(when($"df" < 2, $"toks").otherwise(0L)).as("kept_tokens"))
        .orderBy($"doc_id")
    },

    // Exact 3-gram-shingle Jaccard near-dup pairs over a bounded sample;
    // inter/union counted via an inverted-index join on shingle — the same
    // shape scales out by sharding on shingle.
    Q("dedup_ngram_jaccard",
      s"""WITH tok AS (
         |  ${sqlShingleTok("documents")}),
         |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         |pair AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, inter,
         |  CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jac
         |FROM pair
         |JOIN cnt ca ON ca.doc_id = a_id
         |JOIN cnt cb ON cb.doc_id = b_id
         |WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      goodPairs(s, d, 0.5).orderBy($"a_id", $"b_id")
    },

    // Asymmetric near-dup: n-gram CONTAINMENT |A∩B| / min(|A|,|B|) — the
    // quote/subset detector Jaccard misses (a doc pasted inside a bigger
    // one has high containment but low Jaccard once the host grows).
    // Same inverted-index join as jaccardPairs: the intersection count
    // falls out of the pair group-by, so verification is free. Scale path
    // mirrors the Jaccard dispatch: the prefix bound for containment is
    // n − ⌈t·n⌉ + 1 over the SMALLER set's rarest shingles, so
    // jaccardPairsPrefix's machinery transfers when df goes heavy-tailed.
    // Single double division (inter / least) — engine-identical.
    Q("dedup_containment",
      s"""WITH tok AS (
         |  ${sqlShingleTok("documents")}),
         |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         |pair AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, inter,
         |  CAST(inter AS DOUBLE) / LEAST(ca.n, cb.n) AS cont
         |FROM pair
         |JOIN cnt ca ON ca.doc_id = a_id
         |JOIN cnt cb ON cb.doc_id = b_id
         |WHERE CAST(inter AS DOUBLE) / LEAST(ca.n, cb.n) >= 0.8
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      goodContainPairs(s, d, 0.8).orderBy($"a_id", $"b_id")
    },

    // Near-dup CLUSTERS: connected components over the exact-Jaccard pair
    // graph (pairs → groups → keep min doc_id per group — the step that
    // makes dedup actionable). Spark side: min-label propagation iterated
    // to a fixpoint — each round is one distributed join+agg, rounds =
    // graph diameter (tiny for near-dup cliques); the same loop is how
    // GraphX computes components, no driver-side graph. Oracle: recursive
    // CTE transitive closure.
    Q("dedup_cluster", ClusterOracleSql) { (s, d) =>
      val good = goodPairs(s, d, 0.5).select($"a_id", $"b_id")
      // The pair graph is the LSH/Jaccard CANDIDATE output — orders of
      // magnitude smaller than the corpus (477 nodes for 5000 docs at
      // sf0.1). Union-find over the collected pairs is O(E α(E)) with
      // min-root determinism, and costs ONE job beyond the pair
      // computation — measured 30+ Spark jobs (one per diameter step,
      // ~13 s) for the distributed min-label-propagation loop on the same
      // input. Past MaxDriverPairs edges (~16 bytes each → ~1.6 GB at the
      // cap) the driver collect would OOM, so the query CUTS OVER to the
      // fully distributed star-contraction ([[ScaleDedup.connectedComponents]],
      // O(log n) rounds) — spec-proven label-identical to the union-find.
      val MaxDriverPairs = 100L * 1000 * 1000
      // (no extra persist: the parent pair graph is memo-cached in
      // goodPairs — count and collect both scan that cache)
      val nPairs = good.count()
      if (nPairs > MaxDriverPairs) {
        // (no `return` — non-local return doesn't work in a lambda body)
        ScaleDedup.connectedComponents(good)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      } else {
      val pairRows = good.collect()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairRows.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          // min root keeps cluster ids deterministic
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val nodes = pairRows.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      val labeled = nodes.map(u => (u, find(u))).sortBy(_._1)
      s.createDataFrame(labeled.toSeq).toDF("doc_id", "cluster")
        .orderBy(col("doc_id"))
      }
    },

    // MinHash + LSH banding (32 hashes, 8 bands × 4 rows). Candidate pairs
    // come only from shared (band, bandhash) buckets — one shuffle on the
    // bucket key, never all-pairs. The hash family is the cross-engine
    // affine one (h_i(x) = (a_i·shingleHash + b_i) mod p), so the DuckDB
    // oracle replays signatures, banding, and the ≥16/32 (≈ Jaccard 0.5)
    // agreement filter exactly; LSH recall is property-tested in LlmSpec.
    Q("dedup_minhash", {
      val sigColsSql = (0 until 32)
        .map(i => s"min(${H.sqlAffine(i, "x")}) AS h$i").mkString(", ")
      val bandSql = (0 until 8).map(b =>
        s"SELECT doc_id, $b AS band, " +
          s"${H.sqlFoldHash((0 until 4).map(r => s"h${b * 4 + r}"))} AS bh FROM sig")
        .mkString(" UNION ALL ")
      val agreeSql = (0 until 32)
        .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  ${sqlShingleTok("documents")}),
         |x AS (SELECT doc_id, ${H.sqlWordHash("w")} AS x FROM tok),
         |sig AS (SELECT doc_id, $sigColsSql FROM x GROUP BY doc_id),
         |band AS ($bandSql),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM band a JOIN band b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, CAST(($agreeSql) AS DOUBLE) / 32 AS est_jac
         |FROM cand JOIN sig sa ON sa.doc_id = a_id JOIN sig sb ON sb.doc_id = b_id
         |WHERE CAST(($agreeSql) AS DOUBLE) / 32 >= 0.5
         |ORDER BY a_id, b_id""".stripMargin
    }) { (s, d) =>
      // pair computation lives in [[minhashPairs]] (memo-shared with
      // dedup_minhash_cluster); this query just orders the pair set
      minhashPairs(s, d).orderBy($"a_id", $"b_id")
    },

    // Clusters over the MINHASH candidate graph — the LSH-scale
    // counterpart of dedup_cluster (whose edges are exact Jaccard):
    // candidates come only from shared band buckets (never all-pairs) and
    // components from the distributed star contraction, so BOTH stages
    // hold at 10^9 docs. Shares the cached pair graph with dedup_minhash.
    Q("dedup_minhash_cluster", MinhashClusterOracleSql) { (s, d) =>
      ScaleDedup.connectedComponents(minhashPairs(s, d).select($"a_id", $"b_id"))
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy(col("doc_id"))
    },

    // LSH band-calibration sweep — the S-curve measured on THIS corpus
    // instead of argued from 1-(1-j^r)^b: over the SAME memoized 32-perm
    // signatures, run the band join at (b,r) ∈ {(16,2),(8,4),(4,8)} and
    // score each config's candidate set against the exact-Jaccard truth
    // pairs (the goodPairs frame dedup_ngram_jaccard verifies). One row
    // per config: candidate volume, recall and precision at the 0.5
    // threshold — the table a deployment reads before picking its banding
    // (more bands/shorter rows = recall up, candidates up). The sweep is
    // the MinHash counterpart of sim_ann_recall_k's coarse-quantizer
    // sweep. Scale shape: signatures build once (build:minhash_sig);
    // each config is one narrow (doc_id, band, bh) self-join — the
    // dedup_minhash shape — and the scoring join carries only id pairs;
    // the three counts are bounded driver actions (the recall_k
    // precedent), never a collected pair set.
    Q("dedup_minhash_curve", {
      val sigColsSql = (0 until 32)
        .map(i => s"min(${H.sqlAffine(i, "x")}) AS h$i").mkString(", ")
      def bandSql(b: Int, r: Int) = (0 until b).map(i =>
        s"SELECT doc_id, $i AS band, " +
          s"${H.sqlFoldHash((0 until r).map(j => s"h${i * r + j}"))} AS bh FROM sig")
        .mkString(" UNION ALL ")
      def cfgSql(b: Int, r: Int) =
        s"""SELECT $b AS bands, $r AS rows_per_band,
           |  (SELECT count(*) FROM cand$b) AS n_cand,
           |  (SELECT count(*) FROM truth) AS n_truth,
           |  (SELECT count(*) FROM cand$b c JOIN truth t
           |     ON c.a_id = t.a_id AND c.b_id = t.b_id) AS n_hit""".stripMargin
      // MATERIALIZED: DuckDB 1.0 inlines every CTE reference — without the
      // hints the corpus² pair build and the signature aggregation re-run
      // per referencing config (the graph_pagerank lesson)
      s"""WITH tok AS MATERIALIZED (
         |  ${sqlShingleTok("documents")}),
         |x AS MATERIALIZED (SELECT doc_id, ${H.sqlWordHash("w")} AS x FROM tok),
         |sig AS MATERIALIZED (SELECT doc_id, $sigColsSql FROM x GROUP BY doc_id),
         |cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         |pair AS MATERIALIZED (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |truth AS MATERIALIZED (SELECT a_id, b_id FROM pair
         |  JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
         |band16 AS MATERIALIZED (${bandSql(16, 2)}),
         |cand16 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM band16 a JOIN band16 b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |band8 AS MATERIALIZED (${bandSql(8, 4)}),
         |cand8 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM band8 a JOIN band8 b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |band4 AS MATERIALIZED (${bandSql(4, 8)}),
         |cand4 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM band4 a JOIN band4 b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |cfg AS (${cfgSql(16, 2)} UNION ALL ${cfgSql(8, 4)} UNION ALL ${cfgSql(4, 8)})
         |SELECT bands, rows_per_band, CAST(n_cand AS BIGINT) AS n_cand,
         |  CAST(n_truth AS BIGINT) AS n_truth, CAST(n_hit AS BIGINT) AS n_hit,
         |  round(CASE WHEN n_truth = 0 THEN 0
         |    ELSE CAST(n_hit AS DOUBLE) / n_truth END, 6) AS recall,
         |  round(CASE WHEN n_cand = 0 THEN 0
         |    ELSE CAST(n_hit AS DOUBLE) / n_cand END, 6) AS prec
         |FROM cfg ORDER BY bands DESC""".stripMargin
    }) { (s, d) =>
      val sig = minhashSig(s, d)
      val truth = goodPairs(s, d, 0.5).select($"a_id", $"b_id")
      val nTruth = truth.count()
      val measured = Seq((16, 2), (8, 4), (4, 8)).map { case (b, r) =>
        val banded = sig.select($"doc_id",
            posexplode(array((0 until b).map(i =>
              H.foldHash((0 until r).map(j => col("sig")(i * r + j)))): _*)))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
        val cand = banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct().persist()
        val nCand = cand.count()
        val nHit = cand.join(truth, Seq("a_id", "b_id"), "left_semi").count()
        cand.unpersist()
        (b, r, nCand, nTruth, nHit)
      }
      val spark = s
      import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
      measured.toDF("bands", "rows_per_band", "n_cand", "n_truth", "n_hit")
        .withColumn("recall", round(when(col("n_truth") === 0, 0.0)
          .otherwise(col("n_hit").cast(DoubleType) / col("n_truth")), 6))
        .withColumn("prec", round(when(col("n_cand") === 0, 0.0)
          .otherwise(col("n_hit").cast(DoubleType) / col("n_cand")), 6))
        .orderBy(col("bands").desc)
    },

    // 62-bit SimHash over tokens (31 bits from each of two independent
    // char-polynomial hashes); near-dup = hamming distance ≤ 8 over a
    // bounded sample. Pure SQL-lambda arithmetic (no UDF), identical in
    // DuckDB, so the oracle hash-checks the full pair set.
    Q("dedup_simhash", {
      def half(c: String, off: Int) =
        s"list_sum(list_transform(range(0, 31), j -> " +
          s"CASE WHEN list_sum(list_transform($c, h -> " +
          s"CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0 " +
          s"THEN (CAST(1 AS BIGINT) << (j + $off)) ELSE CAST(0 AS BIGINT) END))"
      s"""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |  FROM documents WHERE doc_id < $SampleDocs),
         |h AS (SELECT doc_id,
         |  list_transform(ws, w -> ${H.sqlWordHash("w")}) AS hs1,
         |  list_transform(ws, w -> ${H.sqlWordHash("w", 137L, H.P2)}) AS hs2
         |FROM w),
         |s AS (SELECT doc_id, ${half("hs1", 0)} + ${half("hs2", 31)} AS sh FROM h)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 8
         |ORDER BY a_id, b_id""".stripMargin
    }) { (s, d) =>
      // Explode → hash each word ONCE → 62 partial-aggregable bit votes in
      // one shuffle. The nested-lambda formulation (hash recomputed per bit)
      // allocates ~60× the garbage and is not map-side combinable; this
      // shape is, and scales to the full corpus, not just the sample.
      val words = documents(s, d).filter($"doc_id" < SampleDocs)
        .select($"doc_id", explode(filter(split($"text", " "), x => x =!= "")).as("w"))
        .select($"doc_id", H.wordHash($"w").as("h1"), H.wordHash($"w", 137L, H.P2).as("h2"))
      val votes = (0 until 31).map(j =>
        sum(when(shiftright($"h1", j).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v1_$j")) ++
        (0 until 31).map(j =>
          sum(when(shiftright($"h2", j).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v2_$j"))
      val voted = words.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
      val shBits = (0 until 31).map(j => when(col(s"v1_$j") > 0, lit(1L << j)).otherwise(0L)) ++
        (0 until 31).map(j => when(col(s"v2_$j") > 0, lit(1L << (j + 31))).otherwise(0L))
      // left-join back so an all-empty doc keeps sh=0 (matching the oracle,
      // which emits every sampled doc)
      val sh = documents(s, d).filter($"doc_id" < SampleDocs).select($"doc_id")
        .join(voted.select($"doc_id", shBits.reduce(_ + _).as("sh")), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"sh", lit(0L)).as("sh"))
      sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
        .filter($"hamming" <= 8)
        .orderBy($"a_id", $"b_id")
    },

    // Embedding near-dup pairs: fixed-point cosine ≥ 0.5 between a bounded
    // sample and the full table (quantized ⇒ hash-exact vs oracle).
    Q("dedup_embedding_cosine",
      s"""WITH e AS (SELECT vec_id, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |n AS (SELECT vec_id, v, ${sqlQnorm2("v")} AS n2 FROM e)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  CAST(${sqlQdot("a.v", "b.v")} AS DOUBLE) /
         |    (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos
         |FROM n a JOIN n b ON a.vec_id < b.vec_id AND a.vec_id < $SampleVecs
         |WHERE CAST(${sqlQdot("a.v", "b.v")} AS DOUBLE) /
         |    (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) >= 0.35
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      // Materialize (v, n2) behind an exchange (same barrier as sim_ann_lsh):
      // without it, project collapsing re-inlines quantize() into the
      // per-pair qdot, recomputing the lambda for every candidate pair
      // instead of once per row. The bounded sample side is filtered first
      // and broadcast, so the nested loop streams the full table exactly
      // once against ≤ SampleVecs in-memory rows.
      val e = embeddings(s, d)
        .select($"vec_id", quantize($"embedding").as("v"))
        .withColumn("n2", qnorm2($"v"))
        .repartition(col("vec_id"))
      val a = e.filter($"vec_id" < SampleVecs)
      val cos = qdot(col("a.v"), col("b.v")).cast(DoubleType) /
        (sqrt(col("a.n2").cast(DoubleType)) * sqrt(col("b.n2").cast(DoubleType)))
      broadcast(a.as("a")).join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), cos.as("cos"))
        .filter($"cos" >= 0.35)
        .orderBy($"a_id", $"b_id")
    },

    // ─────────────────── similarity search ───────────────────
    // Brute-force cosine top-k against a fixed query vector (vec_id=1),
    // broadcast to every partition — the exact baseline.
    Q("sim_topk",
      s"""WITH qv AS (SELECT ${sqlQuantize("embedding")} AS q FROM embeddings WHERE vec_id = 1),
         |e AS (SELECT vec_id, label, ${sqlQuantize("embedding")} AS v FROM embeddings)
         |SELECT vec_id, label,
         |  CAST(${sqlQdot("e.v", "qv.q")} AS DOUBLE) /
         |    (sqrt(CAST(${sqlQnorm2("e.v")} AS DOUBLE)) *
         |     sqrt(CAST(${sqlQnorm2("qv.q")} AS DOUBLE))) AS cos
         |FROM e, qv
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val e = embeddings(s, d).select($"vec_id", $"label", quantize($"embedding").as("v"))
      val qv = embeddings(s, d).filter($"vec_id" === 1)
        .select(quantize($"embedding").as("q"))
      e.crossJoin(broadcast(qv))
        .select($"vec_id", $"label",
          (qdot($"v", $"q").cast(DoubleType) /
            (sqrt(qnorm2($"v").cast(DoubleType)) *
              sqrt(qnorm2($"q").cast(DoubleType)))).as("cos"))
        .orderBy($"cos".desc, $"vec_id")
        .limit(10)
    },

    // LSH-bucketed ANN: 12 random-hyperplane sign bits (±1 coefficients from
    // the seeded affine family, materialized as literal sign vectors) →
    // bucket id; search only the query's bucket. The scale path: bucketing
    // is one shuffle, each bucket scanned independently. Projections are
    // exact integer dots of the quantized embedding with the ±1 vectors, so
    // the DuckDB oracle replays bucketing and cosines bit-for-bit.
    Q("sim_ann_lsh", {
      val bucketSql = AnnSigns.zipWithIndex.foldLeft("CAST(0 AS BIGINT)") {
        case (acc, (sv, _)) =>
          val proj = sqlQdot("v", sv.mkString("[", ",", "]"))
          s"(($acc) * 2 + CASE WHEN $proj > 0 THEN 1 ELSE 0 END)"
      }
      s"""WITH e AS (SELECT vec_id, label, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |b AS (SELECT vec_id, label, v, $bucketSql AS bkt, ${sqlQnorm2("v")} AS n2 FROM e),
         |q AS (SELECT v AS qv, bkt AS qbkt, n2 AS qn2 FROM b WHERE vec_id = 1)
         |SELECT b.vec_id, b.label, b.bkt,
         |  CAST(${sqlQdot("b.v", "q.qv")} AS DOUBLE) /
         |    (sqrt(CAST(b.n2 AS DOUBLE)) * sqrt(CAST(q.qn2 AS DOUBLE))) AS cos
         |FROM b, q WHERE b.bkt = q.qbkt
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
    }) { (s, d) =>
      // Materialize (v, n2) behind an exchange: without the barrier,
      // project collapsing re-inlines quantize() into each of the 12 plane
      // projections (12× the lambda work and garbage). At scale this
      // materialization is the "build the LSH index" pass — quantized
      // vectors would live as a stored column.
      val e0 = embeddings(s, d)
        .select($"vec_id", $"label", quantize($"embedding").as("v"))
        .withColumn("n2", qnorm2($"v"))
        .repartition(col("vec_id"))
      val bucket = AnnSigns.foldLeft(lit(0L): Column) { (acc, sv) =>
        val proj = qdot($"v", array(sv.map(lit(_)): _*))
        acc * 2 + when(proj > 0, lit(1L)).otherwise(lit(0L))
      }
      val e = e0.withColumn("bkt", bucket)
      val q = e.filter($"vec_id" === 1)
        .select($"v".as("qv"), $"bkt".as("qbkt"), $"n2".as("qn2"))
      e.join(broadcast(q), $"bkt" === $"qbkt")
        .select($"vec_id", $"label", $"bkt",
          (qdot($"v", $"qv").cast(DoubleType) /
            (sqrt($"n2".cast(DoubleType)) * sqrt($"qn2".cast(DoubleType)))).as("cos"))
        .orderBy($"cos".desc, $"vec_id")
        .limit(10)
    },

    // ANN quality, MEASURED: recall@10 of the LSH bucket search against
    // the exact brute-force top-10 for the same query vector — "measure,
    // don't guess" applied to the index itself (the number an ANN
    // deployment watches when tuning planes/probes). Both sides share the
    // bucket/cosine arithmetic of sim_ann_lsh/sim_topk, identical
    // ORDER BY ties, so the sets — and the exact integer hit count — are
    // engine-identical. Output is one row: k, n_hit, recall.
    // Multi-probe LSH: probe the query's cell PLUS its 6 Hamming-1
    // neighbor cells (flip one hyperplane sign each) — the standard
    // recall lever that keeps the bucket-pruning shape: 7 of 64 cells
    // ≈ 11% of the corpus scanned instead of 100%, and the probe set is
    // computed on the driver-free broadcast side. 6 planes, matching
    // sim_ann_recall's measurement geometry.
    Q("sim_ann_multiprobe",
      s"""WITH e AS (SELECT vec_id, label, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |b AS (SELECT vec_id, label, v, $lshBucketSql AS bkt, ${sqlQnorm2("v")} AS n2 FROM e),
         |q AS (SELECT v AS qv, bkt AS qbkt, n2 AS qn2 FROM b WHERE vec_id = 1)
         |SELECT b.vec_id, b.label, b.bkt, $lshCosSql AS cos
         |FROM b, q WHERE $lshProbeSql
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val b = lshFrame(s, d)
      b.join(broadcast(lshQueryFrame(b)), lshProbeCol)
        .select($"vec_id", $"label", $"bkt", lshCosCol.as("cos"))
        .orderBy($"cos".desc, $"vec_id")
        .limit(10)
    },

    Q("sim_ann_recall", {
      // 6 planes (64 cells), not sim_ann_lsh's 12: recall is only a
      // meaningful measurement when the probed cell is populated at the
      // smallest verify SF (500 vectors / 4096 cells would probe an empty
      // bucket and measure nothing). Reports single-probe vs multi-probe
      // side by side. Measured finding on the SYNTHETIC fixture: ~0.1-0.2
      // for both — the generated embeddings are isotropic (top-10 cosines
      // ≈ 0.37, labels uncorrelated with proximity), and on isotropic
      // vectors ANY hyperplane scheme's recall ≈ fraction of cells
      // probed. That diagnosis is this operator's JOB: it tells a corpus
      // owner whether their embeddings have the cluster structure LSH
      // exploits (recall ≫ coverage) or need IVF/brute force (recall ≈
      // coverage, as here).
      s"""WITH e AS (SELECT vec_id, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $lshBucketSql AS bkt, ${sqlQnorm2("v")} AS n2 FROM e),
         |q AS (SELECT v AS qv, bkt AS qbkt, n2 AS qn2 FROM b WHERE vec_id = 1),
         |single AS (SELECT b.vec_id FROM b, q WHERE b.bkt = q.qbkt AND b.vec_id <> 1
         |  ORDER BY $lshCosSql DESC, b.vec_id LIMIT 10),
         |multi AS (SELECT b.vec_id FROM b, q WHERE ($lshProbeSql) AND b.vec_id <> 1
         |  ORDER BY $lshCosSql DESC, b.vec_id LIMIT 10),
         |exact AS (SELECT b.vec_id FROM b, q WHERE b.vec_id <> 1
         |  ORDER BY $lshCosSql DESC, b.vec_id LIMIT 10)
         |SELECT 10 AS k,
         |  (SELECT count(*) FROM exact JOIN single USING (vec_id)) AS n_hit_single,
         |  CAST((SELECT count(*) FROM exact JOIN single USING (vec_id)) AS DOUBLE) / 10
         |    AS recall_single,
         |  (SELECT count(*) FROM exact JOIN multi USING (vec_id)) AS n_hit_multi,
         |  CAST((SELECT count(*) FROM exact JOIN multi USING (vec_id)) AS DOUBLE) / 10
         |    AS recall_multi""".stripMargin
    }) { (s, d) =>
      val b = lshFrame(s, d)
      val q = lshQueryFrame(b)
      def topIds(pred: Column): DataFrame =
        b.join(broadcast(q), pred).filter($"vec_id" =!= 1)
          .orderBy(lshCosCol.desc, $"vec_id").limit(10).select($"vec_id")
      val exact = topIds(lit(true))
      val nSingle = exact.join(topIds($"bkt" === $"qbkt"), "vec_id").count()
      val nMulti = exact.join(topIds(lshProbeCol), "vec_id").count()
      val spark = s
      import spark.implicits._
      Seq((10, nSingle, nSingle / 10.0, nMulti, nMulti / 10.0))
        .toDF("k", "n_hit_single", "recall_single", "n_hit_multi", "recall_multi")
    },

    // IVF ANN: coarse-quantize to the nearest of K cold-start centroids
    // (the K smallest present vec_ids — deterministic, standing in for
    // trained k-means cells; sim_ann_ivf_kmeans adds the Lloyd round),
    // then probe only the query's 2 nearest cells. K is DERIVED from the
    // corpus, K = max(16, ⌈n/2000⌉) like the kmeans/SemDeDup siblings, so
    // probe selectivity (nprobe/K of the table scanned) keeps improving
    // with corpus growth instead of freezing at a 16-cell grid. Centroids
    // are driver state (as in any IVF index), so cell assignment is a
    // pure map over the broadcast literal — NO shuffle. All cosines are
    // exact-integer dots cast to DOUBLE in a fixed op order, so the
    // DuckDB oracle replays cell assignment, probe selection, and the
    // final top-k identically.
    Q("sim_ann_ivf", simAnnIvfOracleSql) { (s, d) =>
      val nProbe = 2
      // Centroids (and the query vector) are collected driver state, as in
      // any IVF index — the collect here is the "load the index" step,
      // bounded by the derived K. If the bucket lacks vec_id 1 (the query)
      // the query degrades to an empty result like its LSH sibling would.
      // Reads the SAME memoized persisted (v, n2) index pass as the rest
      // of the ANN family (build-once-share contract): a private
      // quantize+repartition per invocation re-paid the index build on
      // every call (~2 s of the sf1 warm time before round 6).
      val eq = lshFrame(s, d)
      val nCent = deriveCellCount(embCount(eq, Some((s, d))))
      val centRows = coldStartRows(eq, nCent)
      // vec_id 1, if present, is by construction among the K ≥ 16
      // smallest present ids, so the seed rows double as the query lookup
      val qvOpt = centRows.find(_._1 == 1L).map(_._2)
      if (qvOpt.isEmpty)
        eq.select($"vec_id", $"label", lit(0L).as("cell"), lit(0.0).as("cos"))
          .filter(lit(false))
      else {
        val qv = qvOpt.get
        val qn2 = qv.map(x => x * x).sum
        val probeCells = centRows
          .map { case (cid, cv) => (cid, qcosArr(qv, cv)) }
          .sortBy { case (cid, cos) => (-cos, cid) }
          .take(nProbe).map(_._1)
        eq.withColumn("cell", ivfCellCol(centRows))
          .filter($"cell".isin(probeCells: _*))
          .select($"vec_id", $"label", $"cell",
            ivfCosCol($"v", $"n2", array(qv.map(lit(_)): _*), lit(qn2)).as("cos"))
          .orderBy($"cos".desc, $"vec_id")
          .limit(10)
      }
    },

    // The same IVF search served from a CELL-PARTITIONED layout
    // ([[VectorIndex.writeCellLayout]], memoized build): the probe
    // predicate lands in the scan's PartitionFilters, so the nprobe=2
    // search opens 2 of 16 cell directories and reads ZERO bytes of the
    // other 14 — files pruned, not rows (CellLayoutSpec pins the pruned
    // file set; the in-memory sim_ann_ivf filters rows of a full scan).
    // Same centroids/probe/top-k as sim_ann_ivf, so the shared oracle
    // pins the two physical paths to one semantic result. At 100 TB this
    // is the serving shape: per-cell file sets grow with the corpus while
    // probe cost grows only with the probed cells.
    Q("sim_ann_ivf_partitioned", simAnnIvfOracleSql) { (s, d) =>
      val (layoutDir, cents) = ivfCellLayout(s, d)
      val qvOpt = cents.find(_._1 == 1L).map(_._2)
      qvOpt match {
        case scala.None =>
          lshFrame(s, d)
            .select($"vec_id", $"label", lit(0L).as("cell"), lit(0.0).as("cos"))
            .filter(lit(false))
        case Some(qv) =>
          val qn2 = qv.map(x => x * x).sum
          val probes = VectorIndex.probeCells(cents, qv, nprobe = 2)
          VectorIndex.readProbed(s, layoutDir, probes)
            .select($"vec_id", $"label", $"cell",
              (qdot($"v", array(qv.map(lit(_)): _*)).cast(DoubleType) /
                (sqrt($"n2".cast(DoubleType)) *
                  sqrt(lit(qn2).cast(DoubleType)))).as("cos"))
            .orderBy($"cos".desc, $"vec_id")
            .limit(10)
      }
    },

    // Recall-vs-probes CURVE over the 6-plane LSH geometry: top-10 recall
    // when probing the Hamming-ball of radius r ∈ {0,1,2} around the query
    // cell (1, 7, 22 of 64 cells — the probe predicate is one bit_count on
    // the bucket ids, so "more probes" is a filter constant, not a plan
    // change). This is the tuning table an ANN deployment reads: on the
    // isotropic driver fixture recall ≈ cell coverage (the sim_ann_recall
    // diagnosis); on clustered embeddings (AnnCalibrationSpec's planted
    // fixture) radius 2 reaches recall ≥ 0.8 while scanning ~1/3 of cells.
    Q("sim_ann_recall_curve", {
      def top(alias: String, cond: String) =
        s"$alias AS (SELECT b.vec_id FROM b, q WHERE $cond AND b.vec_id <> 1 " +
          s"ORDER BY $lshCosSql DESC, b.vec_id LIMIT 10)"
      def row(r: Int, cells: Int, t: String) =
        s"SELECT CAST($r AS INT) AS probe_radius, CAST($cells AS INT) AS cells_probed, " +
          s"(SELECT count(*) FROM exact JOIN $t USING (vec_id)) AS n_hit, " +
          s"CAST((SELECT count(*) FROM exact JOIN $t USING (vec_id)) AS DOUBLE) / 10 AS recall"
      s"""WITH e AS (SELECT vec_id, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $lshBucketSql AS bkt, ${sqlQnorm2("v")} AS n2 FROM e),
         |q AS (SELECT v AS qv, bkt AS qbkt, n2 AS qn2 FROM b WHERE vec_id = 1),
         |${top("exact", "true")},
         |${top("h0", "bit_count(xor(b.bkt, q.qbkt)) <= 0")},
         |${top("h1", "bit_count(xor(b.bkt, q.qbkt)) <= 1")},
         |${top("h2", "bit_count(xor(b.bkt, q.qbkt)) <= 2")}
         |${row(0, 1, "h0")} UNION ALL ${row(1, 7, "h1")} UNION ALL ${row(2, 22, "h2")}
         |ORDER BY probe_radius""".stripMargin
    }) { (s, d) =>
      val b = lshFrame(s, d)
      val q = lshQueryFrame(b)
      def topIds(pred: Column): DataFrame =
        b.join(broadcast(q), pred).filter($"vec_id" =!= 1)
          .orderBy(lshCosCol.desc, $"vec_id").limit(10).select($"vec_id")
      val exact = topIds(lit(true))
      val cellsAt = Seq(1, 7, 22) // Σ_{j≤r} C(6, j)
      val rows = (0 to 2).map { r =>
        val hit = exact
          .join(topIds(bit_count($"bkt".bitwiseXOR($"qbkt")) <= r), "vec_id")
          .count()
        (r, cellsAt(r), hit, hit / 10.0)
      }
      val spark = s
      import spark.implicits._
      rows.toDF("probe_radius", "cells_probed", "n_hit", "recall")
    },

    // IVF with DATA-SEEDED centroids: one exact-arithmetic Lloyd round from
    // the same 16 cold-start centroids sim_ann_ivf uses. Assignment is the
    // no-shuffle broadcast-literal map; the refinement is ONE bounded
    // groupBy (nCent×dim rows collected — the "train the index" step, which
    // at 100 TB is the same job shape with centroids checkpointed). Refined
    // centroid elements are floor(sum/count) where the per-cell sums stay
    // ≪ 2^53 (|element| ≤ ~2e7 fixed-point × ≤ 2^25 rows/cell at sf1), so
    // the double division is exact and DuckDB replays the training
    // bit-for-bit via the same floor — the k-means step stays inside the
    // rows+schema+hash oracle gate rather than dropping to rows-only.
    Q("sim_ann_ivf_kmeans",
      s"""WITH $sqlKmeansCellCtes,
         |qv AS (SELECT v, n2 FROM n WHERE vec_id = 1),
         |probe AS (SELECT cid FROM cn, qv
         |  ORDER BY ${sqlIvfCos("qv.v", "qv.n2", "cn.cv", "cn.cn2")} DESC, cid LIMIT 2),
         |a1 AS (SELECT n.vec_id, n.label, n.v, n.n2,
         |  -(list_max(list({'cos': ${sqlIvfCos("n.v", "n.n2", "cn.cv", "cn.cn2")},
         |                   'ncid': -cn.cid}))).ncid AS cell
         |  FROM n, cn GROUP BY n.vec_id, n.label, n.v, n.n2)
         |SELECT a1.vec_id, a1.label, a1.cell,
         |  ${sqlIvfCos("a1.v", "a1.n2", "qv.v", "qv.n2")} AS cos
         |FROM a1, qv WHERE a1.cell IN (SELECT cid FROM probe)
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val nProbe = 2
      // shared persisted (vec_id, label, v, n2) index pass — bkt unused here
      val eq = lshFrame(s, d)
      val nCent = deriveCellCount(embCount(eq, Some((s, d))))
      val initRows = coldStartRows(eq, nCent)
      val qvOpt = initRows.find(_._1 == 1L).map(_._2)
      if (qvOpt.isEmpty)
        eq.select($"vec_id", $"label", lit(0L).as("cell"), lit(0.0).as("cos"))
          .filter(lit(false))
      else {
        val qv = qvOpt.get
        // one Lloyd round, memoized per (session, dir) like
        // trainedCodebook: train once, serve every invocation
        val refined = kmeansRefined(s, d, eq, initRows, qv.length)
        val probeCells = refined.map { case (cid, cv) => (cid, qcosArr(qv, cv)) }
          .sortBy { case (cid, cos) => (-cos, cid) }
          .take(nProbe).map(_._1)
        val qn2 = qv.map(x => x * x).sum
        eq.withColumn("cell", ivfCellCol(refined))
          .filter($"cell".isin(probeCells: _*))
          .select($"vec_id", $"label", $"cell",
            ivfCosCol($"v", $"n2", array(qv.map(lit(_)): _*), lit(qn2)).as("cos"))
          .orderBy($"cos".desc, $"vec_id")
          .limit(10)
      }
    },

    // COARSE-QUANTIZER K SWEEP: recall@10 vs (K, nprobe) with K up to 256
    // and nprobe scaled to hold the probe FRACTION at K/8 — the tuning
    // table that answers "does probe selectivity keep improving as the
    // index grows cells?" (the round-7 finding against the fixed k=16 cold
    // start: with K pinned, the fraction of the corpus scanned per query
    // stops shrinking as the corpus grows). Each K trains the same
    // exact-arithmetic one-Lloyd-round quantizer as sim_ann_ivf_kmeans
    // (rank-seeded cold start, floor-mean refine — bit-replayed by the
    // oracle), assignment stays the no-shuffle broadcast-literal map, and
    // training state is (session, dir, K)-memoized like every other index
    // build. At a fixed probe fraction the per-query scan cost is
    // n·(nprobe/K); the sweep measures what that selectivity buys/costs in
    // recall on this corpus — on the isotropic driver fixture recall decays
    // with K (cells are arbitrary), which is exactly the calibration signal
    // a deployment reads before picking K for clustered real embeddings.
    Q("sim_ann_recall_k", {
      val ks = Seq(16, 64, 256)
      def np(k: Int): Int = math.max(2, k / 8)
      def ctes(k: Int): String =
        s"""c0_$k AS (SELECT cid, cv, cn2 FROM (
           |    SELECT vec_id AS cid, v AS cv, n2 AS cn2,
           |           row_number() OVER (ORDER BY vec_id) AS rn FROM n)
           |  WHERE rn <= $k),
           |a0_$k AS (SELECT n.vec_id, n.v,
           |  -(list_max(list({'cos': ${sqlIvfCos("n.v", "n.n2", "c.cv", "c.cn2")},
           |                   'ncid': -c.cid}))).ncid AS cell
           |  FROM n, c0_$k c GROUP BY n.vec_id, n.v, n.n2),
           |sums_$k AS (SELECT cell, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a0_$k),
           |ref_$k AS (SELECT cell, pos, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS ci
           |  FROM sums_$k GROUP BY cell, pos),
           |cn_$k AS (SELECT cid, cv, ${sqlQnorm2("cv")} AS cn2 FROM (
           |    SELECT cell AS cid, list(ci ORDER BY pos) AS cv FROM ref_$k GROUP BY cell)),
           |probe_$k AS (SELECT cid FROM cn_$k c, qv
           |  ORDER BY ${sqlIvfCos("qv.v", "qv.n2", "c.cv", "c.cn2")} DESC, cid LIMIT ${np(k)}),
           |a1_$k AS (SELECT n.vec_id, n.v, n.n2,
           |  -(list_max(list({'cos': ${sqlIvfCos("n.v", "n.n2", "c.cv", "c.cn2")},
           |                   'ncid': -c.cid}))).ncid AS cell
           |  FROM n, cn_$k c GROUP BY n.vec_id, n.v, n.n2),
           |t_$k AS (SELECT a.vec_id FROM a1_$k a, qv
           |  WHERE a.cell IN (SELECT cid FROM probe_$k) AND a.vec_id <> 1
           |  ORDER BY ${sqlIvfCos("a.v", "a.n2", "qv.v", "qv.n2")} DESC, a.vec_id LIMIT 10)""".stripMargin
      def row(k: Int): String =
        s"SELECT CAST($k AS INT) AS k, CAST(${np(k)} AS INT) AS nprobe, " +
          s"(SELECT count(*) FROM exact_k JOIN t_$k USING (vec_id)) AS n_hit, " +
          s"CAST((SELECT count(*) FROM exact_k JOIN t_$k USING (vec_id)) AS DOUBLE) / 10 AS recall"
      s"""WITH e AS (SELECT vec_id, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |n AS (SELECT vec_id, v, ${sqlQnorm2("v")} AS n2 FROM e),
         |qv AS (SELECT v, n2 FROM n WHERE vec_id = 1),
         |exact_k AS (SELECT n.vec_id FROM n, qv WHERE n.vec_id <> 1
         |  ORDER BY ${sqlIvfCos("n.v", "n.n2", "qv.v", "qv.n2")} DESC, n.vec_id LIMIT 10),
         |${ks.map(ctes).mkString(",\n")}
         |${ks.map(row).mkString(" UNION ALL ")}
         |ORDER BY k""".stripMargin
    }) { (s, d) =>
      val ks = Seq(16, 64, 256)
      def np(k: Int): Int = math.max(2, k / 8)
      val eq = lshFrame(s, d)
      val qRow = eq.filter($"vec_id" === 1).select($"v").collect()
      val rows =
        if (qRow.isEmpty) ks.map(k => (k, np(k), 0L, 0.0))
        else {
          val qv = qRow.head.getSeq[Long](0).toArray
          val qn2 = qv.map(x => x * x).sum
          def qcos = ivfCosCol($"v", $"n2", array(qv.map(lit(_)): _*), lit(qn2))
          // the exact top-10 is at most 10 longs: collect it ONCE and
          // intersect each swept K's result on the driver, instead of
          // re-running the full-corpus exact scan as the build side of a
          // join per K (it is unpersisted — 3 sweeps re-executed it)
          val exactIds = eq.filter($"vec_id" =!= 1)
            .orderBy(qcos.desc, $"vec_id").limit(10).select($"vec_id")
            .collect().map(_.getLong(0)).toSet
          ks.map { k =>
            val refined = kSweepCents(s, d, eq, k)
            val probes = refined.map { case (cid, cv) => (cid, qcosArr(qv, cv)) }
              .sortBy { case (cid, cos) => (-cos, cid) }.take(np(k)).map(_._1)
            val approx = eq.withColumn("cell", ivfCellCol(refined))
              .filter($"cell".isin(probes: _*) && $"vec_id" =!= 1)
              .orderBy(qcos.desc, $"vec_id").limit(10).select($"vec_id")
              .collect().map(_.getLong(0))
            val hit = approx.count(exactIds).toLong
            (k, np(k), hit, hit / 10.0)
          }
        }
      val spark = s
      import spark.implicits._
      rows.toDF("k", "nprobe", "n_hit", "recall").orderBy(col("k"))
    },

    // SEMANTIC DEDUP (the SemDeDup construction, Abbas et al. 2023,
    // arXiv:2303.09540): cluster the embeddings with the SAME memoized
    // one-Lloyd-round k-means cells as sim_ann_ivf_kmeans, then compare
    // pairs ONLY within a cell — cosine ≥ 0.4 marks the higher vec_id a
    // duplicate of its lowest qualifying cell-mate (greedy-by-id, the
    // deterministic stand-in for SemDeDup's keep-farthest-from-centroid).
    // Scale shape: clustering is what makes semantic dedup sub-quadratic —
    // candidate pairs are per-cell, and K GROWS with the corpus
    // (K = max(16, ceil(n/c̄)) for target mean cell size c̄ = 2000, derived
    // identically on both engines — see deriveCellCount / the kk CTE), so
    // per-cell pair cost stays bounded while assignment stays a no-shuffle
    // broadcast-literal map. SemanticDedupSpec pins the pair-volume bound
    // on a growing planted fixture. The only exchanges here are the
    // cell-keyed self-join and one bounded groupBy on vec_id.
    Q("dedup_semantic",
      s"""WITH $sqlKmeansCellCtes,
         |a1 AS (SELECT n.vec_id, n.v, n.n2,
         |  -(list_max(list({'cos': ${sqlIvfCos("n.v", "n.n2", "cn.cv", "cn.cn2")},
         |                   'ncid': -cn.cid}))).ncid AS cell
         |  FROM n, cn GROUP BY n.vec_id, n.v, n.n2),
         |p AS (SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |  FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${sqlIvfCos("a.v", "a.n2", "b.v", "b.n2")} >= 0.4
         |  GROUP BY b.vec_id)
         |SELECT a1.vec_id, a1.cell, (p.dup_of IS NOT NULL) AS is_dup, p.dup_of
         |FROM a1 LEFT JOIN p ON a1.vec_id = p.vec_id
         |ORDER BY a1.vec_id""".stripMargin) { (s, d) =>
      semanticDedupFrame(lshFrame(s, d), 0.4, Some((s, d))).orderBy($"vec_id")
    },

    // PRODUCT QUANTIZATION encode: 8 subspaces × 8 dims, 16 codewords each
    // — 64 float dims compress to 8 small ints (32× vs float32), the
    // memory step that makes billion-vector ANN fit a cluster at all.
    // Assignment is a pure map against the broadcast literal codebook
    // (argmin of exact integer L2² per subspace, ties to smaller code), so
    // the encode plan is scan → project → sort, no shuffle; `err` is the
    // exact integer reconstruction error Σ_m d(sv_m, codeword)² — the
    // quality number a PQ deployment monitors (cf. embedding_quantize's
    // affine-int8 reconstruction check).
    // The checked surface is all-scalar: `codes` is the canonical
    // '_'-joined string of the 8 per-subspace codes (the driver's oracle
    // harness sorts through pandas, which cannot hash an ARRAY column —
    // CORRECTNESS_r06's only red row). The array-shaped API lives on in
    // [[VectorIndex.encode]].
    Q("embedding_pq",
      s"""WITH ${sqlPqCtes(withLabel = false)}
         |SELECT vec_id,
         |  array_to_string(list(CAST(k AS INTEGER) ORDER BY m), '_') AS codes,
         |  CAST(sum(d) AS BIGINT) AS err
         |FROM asn GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
      val eq = lshFrame(s, d)
      pqCodesFrame(eq, pqCodebook(eq)).drop("label")
        .select($"vec_id",
          concat_ws("_", transform($"codes", _.cast("string"))).as("codes"),
          $"err")
        .orderBy($"vec_id")
    },

    // ADC (asymmetric distance computation) top-k over the PQ codes: the
    // query stays full-precision, each candidate is scored from its 8
    // codes via a 128-entry lookup table — the scan reads CODES ONLY
    // (64 bits/vector), never the embedding column. The LUT is a
    // broadcast map literal built from the collected codebook (the same
    // bounded driver state as the IVF centroid load), so the plan is a
    // map-only projection + TakeOrdered — zero exchanges; exact integer
    // distances make the ranking engine-identical, ties to smaller
    // vec_id.
    Q("sim_ann_adc",
      s"""WITH ${sqlPqCtes(withLabel = true)},
         |q AS (SELECT m, sv FROM sub WHERE vec_id = 1),
         |lut AS (SELECT c.m, c.k, ${sqlQdist2("q.sv", "c.cv")} AS ld
         |  FROM csub c JOIN q ON q.m = c.m),
         |adc AS (SELECT a.vec_id, a.label, CAST(sum(l.ld) AS BIGINT) AS adc
         |  FROM asn a JOIN lut l ON l.m = a.m AND l.k = a.k
         |  GROUP BY a.vec_id, a.label)
         |SELECT vec_id, label, adc FROM adc WHERE vec_id <> 1
         |ORDER BY adc, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val eq = lshFrame(s, d)
      val cb = pqCodebook(eq)
      val qRowOpt = eq.filter($"vec_id" === 1).select($"v").collect().headOption
      qRowOpt match {
        case scala.None =>
          eq.select($"vec_id", $"label", lit(0L).as("adc")).filter(lit(false))
        case Some(qRow) =>
          val qv = qRow.getSeq[Long](0).toArray
          pqCodesFrame(eq, cb)
            .select($"vec_id", $"label", adcCol(cb, qv).cast(LongType).as("adc"))
            .filter($"vec_id" =!= 1)
            .orderBy($"adc", $"vec_id").limit(10)
      }
    },

    // IVF-PQ: the composed production ANN path — the coarse quantizer
    // routes the query to nprobe=2 of 16 cells (pure map against broadcast
    // centroids), then ADC scores ONLY the probed cells' vectors from
    // their 8 codes. At 100 TB this is the plan that wins: the cell filter
    // prunes ~7/8 of the corpus before any distance work, the survivors
    // are scored from 64-bit codes without touching the embedding column,
    // and the whole search is scan → filter → project → TakeOrdered —
    // zero exchanges. Exact integer LUT distances keep the ranking
    // engine-identical (ties to smaller vec_id).
    Q("sim_ann_ivf_pq",
      s"""WITH e AS (SELECT vec_id, label, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v, ${sqlQnorm2("v")} AS n2 FROM e),
         |c0 AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n WHERE vec_id < 16),
         |a0 AS (SELECT n.vec_id,
         |  -(list_max(list({'cos': ${sqlIvfCos("n.v", "n.n2", "c0.cv", "c0.cn2")},
         |                   'ncid': -c0.cid}))).ncid AS cell
         |  FROM n, c0 GROUP BY n.vec_id, n.v, n.n2),
         |qn AS (SELECT v, n2 FROM n WHERE vec_id = 1),
         |probe AS (SELECT cid FROM c0, qn
         |  ORDER BY ${sqlIvfCos("qn.v", "qn.n2", "c0.cv", "c0.cn2")} DESC, cid LIMIT 2),
         |cand AS (SELECT vec_id FROM a0 WHERE cell IN (SELECT cid FROM probe)),
         |ms AS (SELECT unnest(range($PqM)) AS m),
         |sub AS (SELECT vec_id, label, m, v[m*$PqS+1 : m*$PqS+$PqS] AS sv FROM e, ms),
         |csub AS (SELECT vec_id AS k, m, v[m*$PqS+1 : m*$PqS+$PqS] AS cv
         |  FROM e, ms WHERE vec_id < $PqK),
         |asn AS (SELECT s.vec_id, s.label, s.m,
         |  (list_min(list({'d': ${sqlQdist2("s.sv", "c.cv")}, 'k': c.k}))).k AS k
         |  FROM sub s JOIN csub c ON s.m = c.m
         |  WHERE s.vec_id IN (SELECT vec_id FROM cand)
         |  GROUP BY s.vec_id, s.label, s.m, s.sv),
         |q AS (SELECT m, sv FROM sub WHERE vec_id = 1),
         |lut AS (SELECT c.m, c.k, ${sqlQdist2("q.sv", "c.cv")} AS ld
         |  FROM csub c JOIN q ON q.m = c.m),
         |adc AS (SELECT a.vec_id, a.label, CAST(sum(l.ld) AS BIGINT) AS adc
         |  FROM asn a JOIN lut l ON l.m = a.m AND l.k = a.k
         |  GROUP BY a.vec_id, a.label)
         |SELECT vec_id, label, adc FROM adc WHERE vec_id <> 1
         |ORDER BY adc, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val nProbe = 2
      val eq = lshFrame(s, d)
      val cb = pqCodebook(eq)
      val initRows = VectorIndex.centroids(eq, PqK)
      initRows.find(_._1 == 1L) match {
        case scala.None =>
          eq.select($"vec_id", $"label", lit(0L).as("adc")).filter(lit(false))
        case Some((_, qv)) =>
          val probed = VectorIndex.probeCells(initRows, qv, nProbe)
          pqCodesFrame(VectorIndex.assignCells(eq, initRows)
              .filter($"cell".isin(probed: _*)), cb)
            .select($"vec_id", $"label", adcCol(cb, qv).cast(LongType).as("adc"))
            .filter($"vec_id" =!= 1)
            .orderBy($"adc", $"vec_id").limit(10)
      }
    },

    // ADC over a TRAINED codebook: one Lloyd round (exact-integer argmin
    // assignment, floor-mean codeword update) before encoding — the
    // "train the index" step a real PQ deployment runs offline, kept
    // inside the rows+schema+hash oracle gate because the training is
    // bit-replayable (see VectorIndex.trainCodebook). Same zero-exchange
    // search plan as sim_ann_adc; the training adds one bounded
    // (M×K×S ≤ 1024 rows) groupBy pass. AnnCalibrationSpec measures the
    // recall/quantization-error win over the cold-start codebook on the
    // planted fixture.
    Q("sim_ann_adc_trained",
      s"""WITH ${sqlPqCtes(withLabel = true)},
         |px AS (SELECT m, k, generate_subscripts(sv, 1) AS pos, unnest(sv) AS x
         |  FROM (SELECT a.m, a.k, s.sv FROM asn a
         |        JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m)),
         |upd AS (SELECT m, k, pos,
         |  CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS ci
         |  FROM px GROUP BY m, k, pos),
         |cw AS (SELECT m, k, list(ci ORDER BY pos) AS cv FROM upd GROUP BY m, k),
         |csub1 AS (SELECT c.m, c.k, coalesce(w.cv, c.cv) AS cv
         |  FROM csub c LEFT JOIN cw w ON c.m = w.m AND c.k = w.k),
         |asn1 AS (SELECT s.vec_id, s.label, s.m,
         |  (list_min(list({'d': ${sqlQdist2("s.sv", "c.cv")}, 'k': c.k}))).k AS k
         |  FROM sub s JOIN csub1 c ON s.m = c.m
         |  GROUP BY s.vec_id, s.label, s.m, s.sv),
         |q AS (SELECT m, sv FROM sub WHERE vec_id = 1),
         |lut AS (SELECT c.m, c.k, ${sqlQdist2("q.sv", "c.cv")} AS ld
         |  FROM csub1 c JOIN q ON q.m = c.m),
         |adc AS (SELECT a.vec_id, a.label, CAST(sum(l.ld) AS BIGINT) AS adc
         |  FROM asn1 a JOIN lut l ON l.m = a.m AND l.k = a.k
         |  GROUP BY a.vec_id, a.label)
         |SELECT vec_id, label, adc FROM adc WHERE vec_id <> 1
         |ORDER BY adc, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val eq = lshFrame(s, d)
      val cb = trainedCodebook(s, d)
      val qRowOpt = eq.filter($"vec_id" === 1).select($"v").collect().headOption
      qRowOpt match {
        case scala.None =>
          eq.select($"vec_id", $"label", lit(0L).as("adc")).filter(lit(false))
        case Some(qRow) =>
          val qv = qRow.getSeq[Long](0).toArray
          pqCodesFrame(eq, cb)
            .select($"vec_id", $"label", adcCol(cb, qv).cast(LongType).as("adc"))
            .filter($"vec_id" =!= 1)
            .orderBy($"adc", $"vec_id").limit(10)
      }
    },

    // IVF-PQ with RESIDUAL encoding — the production refinement: each
    // vector is PQ-encoded as v − centroid(cell), not raw v. Residuals
    // have smaller variance, so the same 8×16 codebook budget quantizes
    // them with less error and ADC recall improves (measured against the
    // raw variant in AnnCalibrationSpec). The query side builds ONE LUT
    // per probed cell (query residual differs per cell — nprobe×M×K
    // entries, still broadcast literals), and the search plan stays
    // scan → filter → project → TakeOrdered, zero exchanges.
    Q("sim_ann_ivf_pq_residual",
      s"""WITH e AS (SELECT vec_id, label, ${sqlQuantize("embedding")} AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v, ${sqlQnorm2("v")} AS n2 FROM e),
         |c0 AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n WHERE vec_id < $PqK),
         |a0 AS (SELECT n.vec_id,
         |  -(list_max(list({'cos': ${sqlIvfCos("n.v", "n.n2", "c0.cv", "c0.cn2")},
         |                   'ncid': -c0.cid}))).ncid AS cell
         |  FROM n, c0 GROUP BY n.vec_id, n.v, n.n2),
         |qn AS (SELECT v, n2 FROM n WHERE vec_id = 1),
         |probe AS (SELECT cid FROM c0, qn
         |  ORDER BY ${sqlIvfCos("qn.v", "qn.n2", "c0.cv", "c0.cn2")} DESC, cid LIMIT 2),
         |rv AS (SELECT e.vec_id, e.label, a0.cell,
         |  [e.v[i] - c0.cv[i] FOR i IN range(1, len(e.v)+1)] AS v
         |  FROM e JOIN a0 ON e.vec_id = a0.vec_id JOIN c0 ON a0.cell = c0.cid),
         |ms AS (SELECT unnest(range($PqM)) AS m),
         |sub AS (SELECT vec_id, label, cell, m, v[m*$PqS+1 : m*$PqS+$PqS] AS sv FROM rv, ms),
         |csub AS (SELECT vec_id AS k, m, v[m*$PqS+1 : m*$PqS+$PqS] AS cv
         |  FROM rv, ms WHERE vec_id >= $PqK AND vec_id < ${2 * PqK}),
         |asn AS (SELECT s.vec_id, s.label, s.cell, s.m,
         |  (list_min(list({'d': ${sqlQdist2("s.sv", "c.cv")}, 'k': c.k}))).k AS k
         |  FROM sub s JOIN csub c ON s.m = c.m
         |  WHERE s.cell IN (SELECT cid FROM probe)
         |  GROUP BY s.vec_id, s.label, s.cell, s.m, s.sv),
         |qr AS (SELECT p.cid AS cell, ms.m,
         |  ([qn.v[i] - c0.cv[i] FOR i IN range(1, len(qn.v)+1)])[ms.m*$PqS+1 : ms.m*$PqS+$PqS] AS sv
         |  FROM probe p JOIN c0 ON p.cid = c0.cid, qn, ms),
         |lut AS (SELECT q.cell, c.m, c.k, ${sqlQdist2("q.sv", "c.cv")} AS ld
         |  FROM csub c JOIN qr q ON q.m = c.m),
         |adc AS (SELECT a.vec_id, a.label, CAST(sum(l.ld) AS BIGINT) AS adc
         |  FROM asn a JOIN lut l ON l.cell = a.cell AND l.m = a.m AND l.k = a.k
         |  GROUP BY a.vec_id, a.label)
         |SELECT vec_id, label, adc FROM adc WHERE vec_id <> 1
         |ORDER BY adc, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val nProbe = 2
      val eq = lshFrame(s, d)
      val cents = VectorIndex.centroids(eq, PqK)
      cents.find(_._1 == 1L) match {
        case scala.None =>
          eq.select($"vec_id", $"label", lit(0L).as("adc")).filter(lit(false))
        case Some((_, qv)) =>
          val res = VectorIndex.residualize(VectorIndex.assignCells(eq, cents), cents)
          // codewords from [K, 2K): the first K rows seed the coarse
          // centroids, so their residuals are ~zero — a codebook built
          // from them is degenerate (measured 4/10 vs 10/10 planted
          // recall before this offset)
          val cb = VectorIndex.codebook(res, offset = PqK.toLong)
          val probed = VectorIndex.probeCells(cents, qv, nProbe)
          val centOf = cents.toMap
          val qrOf = probed.map(c =>
            c -> VectorIndex.residualArr(qv, centOf(c))).toMap
          // one LUT per probed cell — the query residual depends on the cell
          val adcByCell = probed.tail.foldLeft(
            when($"cell" === probed.head, adcCol(cb, qrOf(probed.head)))) {
            (acc, c) => acc.when($"cell" === c, adcCol(cb, qrOf(c)))
          }
          // encode keeps `cell` (pqCodesFrame would drop it; the per-cell
          // LUT dispatch needs it)
          VectorIndex.encode(res.filter($"cell".isin(probed: _*)), cb)
            .select($"vec_id", $"label", adcByCell.cast(LongType).as("adc"))
            .filter($"vec_id" =!= 1)
            .orderBy($"adc", $"vec_id").limit(10)
      }
    },

    // ───────────────────── text analysis ─────────────────────
    Q("text_stats",
      """SELECT lang, count(*) AS docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
        |  CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
        |  CAST(SUM(length(text)) AS DOUBLE) / count(*) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      documents(s, d).groupBy($"lang")
        .agg(count(lit(1)).as("docs"),
          sum(length($"text")).cast(LongType).as("sum_chars"),
          sum(size(split($"text", " "))).cast(LongType).as("sum_words"),
          sum(when($"n_chars" >= 200, 1).otherwise(0)).cast(LongType).as("n_long"),
          (sum(length($"text")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
        .orderBy($"lang")
    },

    // Whitespace + regex ("BPE-ish" alpha runs) token counts and a quality
    // ratio per document.
    Q("token_count",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha_tokens,
        |  CAST(length(replace(text, ' ', '')) AS INT) AS n_nonspace_chars,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / length(text) AS density
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).select($"doc_id",
          size(split($"text", " ")).as("n_ws_tokens"),
          size(regexp_extract_all($"text", lit("[a-z]+"), lit(0))).as("n_alpha_tokens"),
          length(regexp_replace($"text", " ", "")).as("n_nonspace_chars"),
          (length(regexp_replace($"text", " ", "")).cast(DoubleType) / length($"text"))
            .as("density"))
        .orderBy($"doc_id")
    },

    // Document quality scoring: length / punctuation-ratio / stopword-ratio
    // heuristics with a composite keep flag — the standard pre-training
    // filter stage. Ratios are single divisions of exact integer counts, so
    // Spark and DuckDB agree bit-for-bit.
    Q("quality_score",
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INT) AS n_punct,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    w -> w IN ('the','a','of','and','to','in','is','that'))) AS INT) AS n_stop,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    w -> w IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stop_ratio,
        |  CASE WHEN len(string_split(text, ' ')) >= 20
        |        AND CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |            / length(text) <= 0.1
        |        AND CAST(len(list_filter(string_split(text, ' '),
        |              w -> w IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)
        |            / len(string_split(text, ' ')) >= 0.02
        |       THEN 1 ELSE 0 END AS keep
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val stops = Seq("the", "a", "of", "and", "to", "in", "is", "that")
      val words = split($"text", " ")
      val nWords = size(words)
      val nPunct = size(regexp_extract_all($"text", lit("[.,!?;:]"), lit(0)))
      val nStop = size(filter(words, w => w.isin(stops: _*)))
      val punctRatio = nPunct.cast(DoubleType) / length($"text")
      val stopRatio = nStop.cast(DoubleType) / nWords
      documents(s, d).select($"doc_id",
          length($"text").as("n_chars"),
          nWords.as("n_words"),
          nPunct.as("n_punct"),
          nStop.as("n_stop"),
          punctRatio.as("punct_ratio"),
          stopRatio.as("stop_ratio"),
          when(nWords >= 20 && punctRatio <= 0.1 && stopRatio >= 0.02, 1)
            .otherwise(0).as("keep"))
        .orderBy($"doc_id")
    },

    // N-gram-heuristic language ID: stopword-lexicon vote, deterministic.
    // Argmax tie-break is the lexicographically LARGEST (score, lang) struct
    // in both engines (Spark greatest over structs == DuckDB list_max).
    Q("lang_id", {
      def sc(stops: Seq[String]) =
        s"CAST(len(list_filter(string_split(text, ' '), " +
          s"w -> w IN (${stops.map(x => s"'$x'").mkString(",")}))) AS INT)"
      s"""WITH s AS (SELECT doc_id, lang,
         |  ${sc(LangLexicons("de"))} AS s_de, ${sc(LangLexicons("en"))} AS s_en,
         |  ${sc(LangLexicons("es"))} AS s_es, ${sc(LangLexicons("fr"))} AS s_fr
         |FROM documents),
         |g AS (SELECT doc_id, lang,
         |  list_max([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
         |            {'score': s_es, 'lang': 'es'}, {'score': s_fr, 'lang': 'fr'}]) AS m
         |FROM s)
         |SELECT doc_id, lang,
         |  CASE WHEN m.score > 0 THEN m.lang ELSE 'unk' END AS pred_lang,
         |  m.score AS pred_score
         |FROM g ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      langPred(s, d).orderBy($"doc_id")
    },

    // Declared-vs-predicted language confusion matrix — the evaluation
    // companion of lang_id (a curation pipeline tracks this to catch
    // lexicon drift / mislabeled sources). Same scorer, one extra
    // vocabulary-sized groupBy: |langs|² output regardless of corpus size.
    Q("doc_lang_confusion", {
      def sc(stops: Seq[String]) =
        s"CAST(len(list_filter(string_split(text, ' '), " +
          s"w -> w IN (${stops.map(x => s"'$x'").mkString(",")}))) AS INT)"
      s"""WITH s AS (SELECT doc_id, lang,
         |  ${sc(LangLexicons("de"))} AS s_de, ${sc(LangLexicons("en"))} AS s_en,
         |  ${sc(LangLexicons("es"))} AS s_es, ${sc(LangLexicons("fr"))} AS s_fr
         |FROM documents),
         |g AS (SELECT doc_id, lang,
         |  list_max([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
         |            {'score': s_es, 'lang': 'es'}, {'score': s_fr, 'lang': 'fr'}]) AS m
         |FROM s)
         |SELECT lang, CASE WHEN m.score > 0 THEN m.lang ELSE 'unk' END AS pred_lang,
         |  count(*) AS n
         |FROM g GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin
    }) { (s, d) =>
      langPred(s, d)
        .groupBy($"lang", $"pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"pred_lang")
    },

    // Rolling polynomial fingerprint over the token stream (mod 2^31-1) —
    // order-sensitive, unlike the set-based dedup hashes. Word hashes come
    // from the cross-engine char-polynomial family, so the oracle replays
    // the identical arithmetic.
    Q("doc_fingerprint",
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(list_filter(string_split(text, ' '), w -> w <> ''),
         |      w -> ${H.sqlWordHash("w")})),
         |    (acc, h) -> (acc * 31 + h) % 2147483647) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val words = filter(split($"text", " "), w => w =!= "")
      documents(s, d).select($"doc_id",
          aggregate(words, lit(0L),
            (acc, w) => (acc * 31L + H.wordHash(w)) % 2147483647L).as("fingerprint"))
        .orderBy($"doc_id")
    },

    // Deterministic hash-based train/test split — reproducible across runs,
    // machines, and engines (no RNG state): the affine hash of doc_id picks
    // the bucket, so re-running on grown data never reassigns old docs.
    Q("split_train_test",
      s"""WITH s AS (SELECT doc_id,
         |  CASE WHEN (${H.sqlAffine(0, "doc_id")}) % 100 < 80
         |       THEN 'train' ELSE 'test' END AS split
         |FROM documents)
         |SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      documents(s, d)
        .withColumn("split",
          when(H.affine(0, $"doc_id") % 100 < 80, "train").otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("min_id"),
          max($"doc_id").as("max_id"))
        .orderBy($"split")
    },

    // PII masking: regex redaction of email-shaped tokens and long digit
    // runs (the standard pre-training scrub), patterns kept in the
    // RE2 ∩ java.util.regex common subset so both engines rewrite alike.
    Q("pii_mask",
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |                 '[0-9]{3,}', '<NUM>', 'g') AS masked,
        |  CAST(len(regexp_extract_all(text, '[0-9]{3,}')) AS INT) AS n_nums
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).select($"doc_id",
          regexp_replace(
            regexp_replace($"text", "[a-z0-9._]+@[a-z0-9.]+", "<EMAIL>"),
            "[0-9]{3,}", "<NUM>").as("masked"),
          size(regexp_extract_all($"text", lit("[0-9]{3,}"), lit(0))).as("n_nums"))
        .orderBy($"doc_id")
    },

    // Text normalization: lowercase, strip non-alphanumerics, collapse
    // whitespace — the canonical form exact-dedup and shingling run on.
    Q("text_normalize",
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                      ' +', ' ', 'g')) AS norm
        |FROM documents)
        |SELECT doc_id, norm, CAST(length(norm) AS INT) AS n_chars_norm
        |FROM n ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .select($"doc_id",
          trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", ""),
            " +", " ")).as("norm"))
        .select($"doc_id", $"norm", length($"norm").as("n_chars_norm"))
        .orderBy($"doc_id")
    },

    // Sequence packing for training: contiguous greedy fill of 2048-token
    // bins in doc_id order, packed PER SHARD of 100 docs (shard = doc_id
    // div 100) — the scale shape: every worker packs its own contiguous
    // slice independently (one hash shuffle, no global ordering), bins
    // never straddle shards, and the assignment is deterministic because
    // doc order within a shard is fixed. (shard_id, bin) identifies a
    // packed sequence globally. A global running sum would funnel the whole
    // corpus through ONE task — the anti-pattern this formulation replaces.
    Q("pack_sequences",
      """WITH t AS (SELECT doc_id, doc_id // 100 AS shard_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, shard_id, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT doc_id, shard_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"shard_id").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      documents(s, d)
        .select($"doc_id", expr("doc_id div 100").as("shard_id"),
          size(split($"text", " ")).cast(LongType).as("n_tokens"))
        .withColumn("cum", sum($"n_tokens").over(w))
        .select($"doc_id", $"shard_id", $"n_tokens",
          (($"cum" - $"n_tokens") / 2048).cast(LongType).as("bin"))
        .orderBy($"doc_id")
    },

    // Deterministic global training-order shuffle — the write-side verb
    // that turns a curated corpus into training shards: every doc hashes
    // to one of 64 shards (affine seed 90) and takes a pseudo-random
    // position WITHIN its shard (order by affine seed 91, doc_id
    // tie-break) — exactly `repartition(64, shard).sortWithinPartitions
    // (ord)` on the write path, reproducible across runs/engines unlike
    // `orderBy(rand())`. The output proves both halves of the contract:
    // shard sizes/membership (n_docs, id_sum) prove the ASSIGNMENT, and
    // the position-weighted checksum Σ pos·(doc_id mod P1) proves the
    // ORDER — swapping any two docs within a shard changes it. Scale
    // shape: ONE hash shuffle on the shard key + an in-partition sort (no
    // global order anywhere); at 100 TB each shard is an independent
    // task, the same plan the writer runs. Checksum bound: pos ≤ docs/64,
    // terms ≤ (n/64)·P1 ≈ 10⁵·10⁹ per doc at sf10 — Σ stays < 2^63 up to
    // ~10⁸ docs/shard, far past any per-shard size a real layout allows.
    Q("corpus_shuffle", {
      val shard = s"(${H.sqlAffine(90, "doc_id")}) % 64"
      val ord = H.sqlAffine(91, "doc_id")
      s"""WITH s AS (SELECT doc_id, $shard AS shard_id, $ord AS ord FROM documents),
         |p AS (SELECT doc_id, shard_id,
         |  row_number() OVER (PARTITION BY shard_id ORDER BY ord, doc_id) AS pos
         |  FROM s)
         |SELECT CAST(shard_id AS BIGINT) AS shard_id,
         |  count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(pos * (doc_id % ${H.P1})) AS BIGINT) AS order_sum
         |FROM p GROUP BY shard_id ORDER BY shard_id""".stripMargin
    }) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"shard_id").orderBy($"ord", $"doc_id")
      documents(s, d)
        .select($"doc_id",
          (H.affine(90, $"doc_id") % 64).as("shard_id"),
          H.affine(91, $"doc_id").as("ord"))
        .withColumn("pos", row_number().over(w).cast(LongType))
        .groupBy($"shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"doc_id").as("id_sum"),
          sum($"pos" * ($"doc_id" % H.P1)).as("order_sum"))
        .orderBy($"shard_id")
    },

    // Document chunking: sliding token windows (window 64, stride 48 — 16
    // tokens of overlap) — how long documents become bounded training
    // samples while dedup/decontamination stay chunk-addressable. One
    // explode, no shuffle until the final ORDER BY; at 100 TB this is a
    // pure map stage. Chunk counts/starts are exact integer arithmetic so
    // the oracle replays them; chunk extents are proven by the sliced
    // token/char counts.
    Q("doc_chunk",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |s AS (SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n_tokens FROM t),
        |c AS (SELECT doc_id, words, n_tokens,
        |  1 + (greatest(0, n_tokens - 64) + 47) // 48 AS n_chunks FROM s),
        |x AS (SELECT doc_id, words, n_tokens,
        |  unnest(range(0, n_chunks)) AS chunk_id FROM c)
        |SELECT doc_id, chunk_id, chunk_id * 48 AS start_token,
        |  CAST(least(64, n_tokens - chunk_id * 48) AS BIGINT) AS n_chunk_tokens,
        |  CAST(length(array_to_string(
        |    list_slice(words, chunk_id * 48 + 1,
        |               chunk_id * 48 + least(64, n_tokens - chunk_id * 48)),
        |    ' ')) AS BIGINT) AS n_chunk_chars
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .select($"doc_id", split($"text", " ").as("words"))
        .withColumn("n_tokens", size($"words").cast(LongType))
        .withColumn("over_", greatest(lit(0L), $"n_tokens" - 64) + 47)
        .withColumn("n_chunks", expr("1 + (over_ div 48)"))
        .select($"doc_id", $"words", $"n_tokens",
          explode(sequence(lit(0L), $"n_chunks" - 1)).as("chunk_id"))
        .withColumn("start_token", $"chunk_id" * 48)
        .withColumn("n_chunk_tokens", least(lit(64L), $"n_tokens" - $"start_token"))
        .withColumn("n_chunk_chars",
          length(array_join(
            slice($"words", ($"start_token" + 1).cast(IntegerType),
              $"n_chunk_tokens".cast(IntegerType)), " ")).cast(LongType))
        .select($"doc_id", $"chunk_id", $"start_token", $"n_chunk_tokens", $"n_chunk_chars")
        .orderBy($"doc_id", $"chunk_id")
    },

    // ─────────────────── multimodal columns ───────────────────
    // Text payload as an opaque binary column with typed metadata — the
    // reference's FileEntry model (file_name/content_type/data,
    // /root/reference/docs/draft.md:84-94) carried through a relational
    // pipeline. The mapPartitions feature-extraction pipeline
    // (Multimodal.extractFeatures) run end-to-end through the typed
    // Dataset API and hash-checked on its text/plain FALLBACK path
    // (extractStub): the 8-bucket byte histogram is replayed in SQL
    // (documents are ASCII, so char codepoints == payload bytes). The
    // REAL image path of the same pipeline — pixel decode + 8×8 pooled
    // embedding — is gated by multimodal_embed below. Proves the decode
    // plumbing produces engine-exact results on both routes.
    Q("multimodal_features", {
      val fCols = (0 until 8).map(i =>
        s"CAST(len(list_filter(buckets, x -> x = $i)) AS DOUBLE) / n AS f$i").mkString(",\n  ")
      s"""WITH b AS (SELECT doc_id,
         |  [unicode(c) >> 5 FOR c IN string_split(text, '')] AS buckets,
         |  greatest(1, length(text)) AS n
         |FROM documents)
         |SELECT doc_id,
         |  $fCols
         |FROM b ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val shaped = documents(s, d).select(
        $"doc_id".cast(StringType).as("key"),
        lit(null).cast(BinaryType).as("metadata"),
        array(struct(lit("text.txt").as("file_name"),
          lit("text/plain").as("content_type"),
          lit("").as("encoding"), $"text".cast(BinaryType).as("data"))).as("entries"))
      val feats = Multimodal.extractFeatures(shaped).toDF()
      val cols = col("key").cast(LongType).as("doc_id") +:
        (0 until 8).map(i => element_at(col("features"), i + 1).as(s"f$i"))
      feats.select(cols: _*).orderBy($"doc_id")
    },

    Q("multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  sha256(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).select($"doc_id",
          octet_length($"text".cast(BinaryType)).as("n_bytes"),
          sha2($"text".cast(BinaryType), 256).as("content_hash"))
        .orderBy($"doc_id")
    },

    // Image near-dup — the multimodal twin of dedup_minhash, over REAL
    // pixel decode: every doc renders as a deterministic 16×16 grayscale
    // BMP, the Spark side runs encode → ImageIO pixel decode → 8×8 aHash
    // ([[imageHashFrame]]), hashes band into 4×16-bit slices and the
    // band join + Hamming ≤ 3 filter finds near-dup neighbors —
    // pigeonhole-exact recall (≤3 differing bits can touch at most 3 of
    // 4 bands). OUTPUT IS CLUSTER-REPRESENTATIVE, not pair enumeration:
    // per doc, the minimum doc_id among all docs whose hash is within
    // Hamming 3 (the production dedup decision). Pair output died at
    // sf10 — the synthetic corpus's hash neighborhoods are dense (3.1M
    // doc pairs at sf1 from 50k docs, ~quadratic beyond), so enumerating
    // pairs materializes an O(cluster²) result no matter how the join is
    // arranged. The rep formulation collapses identical hashes FIRST
    // (one band row per DISTINCT hash, min-doc anchor), and the
    // quadratic candidate stream ends in min() aggregates — map-side
    // combinable, nothing pair-shaped survives a shuffle, output is one
    // row per doc at every scale.
    //
    // BOUNDED BUCKET PROBING (the hot-bucket guard, measured by
    // [[graft.ImageBandProbe]]): each band row compares only against its
    // bucket's [[ImageAnchorK]] smallest (mdoc, h) anchors. The flat
    // self-join's candidate CPU is Σ_buckets k² and the corpus's
    // degenerate buckets are ALL-ZERO band values (dark renderings:
    // bv=0 holds 4.1k of 46.7k distinct hashes at sf1 in every band),
    // which grow linearly with the corpus and defeat every recursive
    // banding refinement (an all-zero key splits nothing: 4×12-bit
    // sub-banding measured only 2.8× off 85.7M candidates, a third
    // 9-bit level 3.6×). Anchor probing measured 9× (9.7M at K=128)
    // with candidate volume Σ k·min(k, K) — linear in the corpus — and
    // changed the rep of only 2.6% of hashes, all inside the dark core
    // where any member is an equally-valid near-dup anchor. Buckets
    // ≤ K are EXACT (every member is an anchor); each hash still meets
    // itself via the unioned self-row, so no doc can drop. Anchors come
    // from the bounded map-side-combinable [[graft.functions.MinKPairs]]
    // aggregator (a row_number window would sort the whole hot bucket
    // in one task); the oracle replays the selection as a row_number ≤ K
    // window — identical pairs ordered by (mdoc, h), both total orders.
    //
    // The oracle never decodes: it replays the hash arithmetic from the
    // histogram the pixels were planted from, so any decoder deviation
    // hash-diverges. Bit 63 is built via the min-long literal (DuckDB
    // raises on 1<<63); band slices mask after an arithmetic shift —
    // sign-identical in both engines.
    Q("dedup_image", {
      val bit = "CASE WHEN s.i = 63 THEN CAST(-9223372036854775808 AS BIGINT) " +
        "ELSE (CAST(1 AS BIGINT) << s.i) END"
      sqlHammingRep(
        s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} % 256 AS p
           |  FROM (${sqlShingleTok("documents")})),
           |hist AS (SELECT doc_id, p, least(255, 16 * count(*)) AS v
           |  FROM w GROUP BY doc_id, p),
           |cell AS (SELECT i, 32 * (i // 8) + 2 * (i % 8) AS p
           |  FROM (SELECT unnest(range(64)) AS i)),
           |samp AS (SELECT d.doc_id, c.i, COALESCE(h.v, 0) AS v
           |  FROM (SELECT DISTINCT doc_id FROM hist) d
           |  CROSS JOIN cell c
           |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.p = c.p),
           |mean AS (SELECT doc_id, sum(v) // 64 AS m FROM samp GROUP BY doc_id),
           |hash AS (SELECT s.doc_id,
           |    COALESCE(bit_or(CASE WHEN s.v > mn.m THEN $bit END),
           |      CAST(0 AS BIGINT)) AS h
           |  FROM samp s JOIN mean mn ON s.doc_id = mn.doc_id
           |  GROUP BY s.doc_id)""".stripMargin)
    }) { (s, d) =>
      hammingRepFrame(imageHashFrame(s, d))
    },

    // Audio near-dup — the audio member of the perceptual-hash dedup
    // family, over the REAL WAV codec round-trip: each doc's planted PCM
    // signal (the `multimodal_audio_features` signal) encodes as RIFF/
    // WAVE, decodes through javax.sound.sampled, and the DECODED samples
    // fingerprint via 64 positional energy windows (bit = window energy
    // above the floor mean — aHash's shape on the time axis,
    // [[Multimodal.audioFingerprint64]]). Near-dup = Hamming ≤ 3 on the
    // fingerprint, resolved by the SAME cluster-representative anchored
    // band pipeline as dedup_image ([[hammingRepFrame]]) — exact-dup
    // collapse first, bounded anchor probing, min() rep aggregates,
    // one row per doc at every scale. The oracle replays the window
    // arithmetic from the planted samples (PCM is lossless), so the
    // codec round-trip is hash-proven.
    Q("dedup_audio", {
      val bit = "CASE WHEN f.j = 63 THEN CAST(-9223372036854775808 AS BIGINT) " +
        "ELSE (CAST(1 AS BIGINT) << f.j) END"
      sqlHammingRep(
        s"""WITH t AS (SELECT doc_id,
           |  [CAST(${H.sqlWordHash("w")} % 65536 - 32768 AS BIGINT)
           |   FOR w IN string_split(text, ' ')] AS s
           |FROM documents),
           |samp AS (SELECT doc_id, len(s) AS n, unnest(s) AS v,
           |    unnest(range(len(s))) AS i FROM t),
           |wen AS (SELECT doc_id, (i * 64) // n AS j, sum(abs(v)) AS e
           |  FROM samp GROUP BY doc_id, (i * 64) // n),
           |grid AS (SELECT unnest(range(64)) AS j),
           |win AS (SELECT d.doc_id, g.j, COALESCE(w.e, 0) AS e
           |  FROM (SELECT DISTINCT doc_id FROM t) d
           |  CROSS JOIN grid g
           |  LEFT JOIN wen w ON w.doc_id = d.doc_id AND w.j = g.j),
           |m AS (SELECT doc_id, sum(e) // 64 AS m FROM win GROUP BY doc_id),
           |hash AS (SELECT f.doc_id,
           |    COALESCE(bit_or(CASE WHEN f.e > mm.m THEN $bit END),
           |      CAST(0 AS BIGINT)) AS h
           |  FROM win f JOIN m mm ON f.doc_id = mm.doc_id
           |  GROUP BY f.doc_id)""".stripMargin)
    }) { (s, d) =>
      hammingRepFrame(audioHashFrame(s, d))
    },

    // Video near-dup — the multi-frame extension of dedup_image over a
    // REAL codec round-trip: each doc renders as a 4-frame GIF (frames =
    // affine-seeded projections of the shingle set), the Spark side runs
    // GIF encode → ImageIO multi-frame decode → per-frame aHash + dHash
    // ([[videoHashFrame]]), and a video is near-dup of another when at
    // least HALF of its distinct frame fingerprints appear in the other
    // (the dedup_containment shape on exact (ah, dh) equality — both
    // hashes must agree, average for local noise, gradient for brightness
    // shifts). OUTPUT IS CLUSTER-REPRESENTATIVE (dedup_image's shape):
    // per doc, the min doc_id over half-containing videos. Identical
    // frame-SETS collapse first (canonical sorted-distinct fingerprint
    // list, min-doc anchor), so exact video dups — the quadratic core at
    // scale — never reach the containment join; a set half-contains
    // itself, so no doc can drop through the inner joins. The oracle
    // replays both hash arithmetics from the planted histograms, never
    // decoding — the frame-exact GIF round-trip is the decoder's
    // correctness proof. Map-side hashing; shuffles carry fingerprint
    // rows per DISTINCT set and doc-count-sized results only.
    Q("dedup_video", {
      val bit = "CASE WHEN c.i = 63 THEN CAST(-9223372036854775808 AS BIGINT) " +
        "ELSE (CAST(1 AS BIGINT) << c.i) END"
      val dbitSel = "CASE WHEN b.i = 63 THEN CAST(-9223372036854775808 AS BIGINT) " +
        "ELSE (CAST(1 AS BIGINT) << b.i) END"
      val frVals = (0 until VideoFrames)
        .map(f => s"(${f}, ${H.affineA(f)}, ${H.affineB(f)})").mkString(", ")
      s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} AS x
         |  FROM (${sqlShingleTok("documents")})),
         |fr AS (SELECT * FROM (VALUES $frVals) t(f, fa, fb)),
         |hist AS (SELECT doc_id, f, p, least(255, 16 * count(*)) AS v FROM (
         |    SELECT w.doc_id, fr.f, ((w.x * fr.fa + fr.fb) % ${H.P1}) % 256 AS p
         |    FROM w CROSS JOIN fr)
         |  GROUP BY doc_id, f, p),
         |vd AS (SELECT DISTINCT doc_id FROM w),
         |acell AS (SELECT i, 32 * (i // 8) + 2 * (i % 8) AS p
         |  FROM (SELECT unnest(range(64)) AS i)),
         |asamp AS (SELECT d.doc_id, fr.f, c.i, COALESCE(h.v, 0) AS v
         |  FROM vd d CROSS JOIN fr CROSS JOIN acell c
         |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.f = fr.f AND h.p = c.p),
         |amean AS (SELECT doc_id, f, sum(v) // 64 AS m
         |  FROM asamp GROUP BY doc_id, f),
         |ahash AS (SELECT c.doc_id, c.f,
         |    COALESCE(bit_or(CASE WHEN c.v > mn.m THEN $bit END),
         |      CAST(0 AS BIGINT)) AS ah
         |  FROM asamp c JOIN amean mn ON c.doc_id = mn.doc_id AND c.f = mn.f
         |  GROUP BY c.doc_id, c.f),
         |dcell AS (SELECT j, 32 * (j // 9) + ((j % 9) * 16) // 9 AS p
         |  FROM (SELECT unnest(range(72)) AS j)),
         |dsamp AS (SELECT d.doc_id, fr.f, c.j, COALESCE(h.v, 0) AS v
         |  FROM vd d CROSS JOIN fr CROSS JOIN dcell c
         |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.f = fr.f AND h.p = c.p),
         |dbit AS (SELECT i, (i // 8) * 9 + (i % 8) AS jl,
         |    (i // 8) * 9 + (i % 8) + 1 AS jr
         |  FROM (SELECT unnest(range(64)) AS i)),
         |dhash AS (SELECT l.doc_id, l.f,
         |    COALESCE(bit_or(CASE WHEN r.v > l.v THEN $dbitSel END),
         |      CAST(0 AS BIGINT)) AS dh
         |  FROM dbit b
         |  JOIN dsamp l ON l.j = b.jl
         |  JOIN dsamp r ON r.j = b.jr AND r.doc_id = l.doc_id AND r.f = l.f
         |  GROUP BY l.doc_id, l.f),
         |fpf AS (SELECT a.doc_id,
         |    CAST(a.ah AS VARCHAR) || ':' || CAST(d.dh AS VARCHAR) AS k
         |  FROM ahash a JOIN dhash d ON a.doc_id = d.doc_id AND a.f = d.f),
         |fps AS (SELECT doc_id, list_sort(list_distinct(list(k))) AS fp
         |  FROM fpf GROUP BY doc_id),
         |sets AS (SELECT fp, min(doc_id) AS mdoc, len(fp) AS n
         |  FROM fps GROUP BY fp),
         |expl AS (SELECT mdoc, n, unnest(fp) AS k FROM sets),
         |sh AS (SELECT a.mdoc AS am, a.n AS an, b.mdoc AS bm,
         |    count(*) AS shared
         |  FROM expl a JOIN expl b ON a.k = b.k
         |  GROUP BY a.mdoc, a.n, b.mdoc),
         |rep AS (SELECT am, min(bm) AS rep FROM sh
         |  WHERE 2 * shared >= an GROUP BY am),
         |docset AS (SELECT f.doc_id, s.mdoc FROM fps f JOIN sets s ON f.fp = s.fp)
         |SELECT d.doc_id, r.rep AS rep_id, (r.rep < d.doc_id) AS is_dup
         |FROM docset d JOIN rep r ON d.mdoc = r.am
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, d) =>
      // canonical sorted-distinct fingerprint set per doc (fingerprints
      // ride as "ah:dh" strings — exact decimal rendering is identical
      // in both engines, and any consistent canonical order yields the
      // same doc partition), then identical sets collapse to one anchor
      // (min doc) before the containment join
      val fps = videoHashFrame(s, d)
        .select($"doc_id", concat($"ah".cast(StringType), lit(":"),
          $"dh".cast(StringType)).as("k"))
        .groupBy($"doc_id")
        .agg(array_sort(array_distinct(collect_list($"k"))).as("fp"))
      val sets = fps.groupBy($"fp").agg(min($"doc_id").as("mdoc"))
        .withColumn("n", size($"fp").cast(LongType))
      val expl = sets.select($"mdoc", $"n", explode($"fp").as("k"))
      // a set shares all n of its own fingerprints with itself, so every
      // set qualifies against itself — the rep join is total.
      // Cardinality cut (guide §2.3 — shuffle fewer bytes): shared =
      // |a ∩ b| ≤ |b|, so a pair can only survive the 2·shared ≥ |a|
      // filter below when 2·|b| ≥ |a| — applying that implied predicate
      // AT the join drops candidate rows before they reach the pair
      // aggregation's exchange instead of after it. Output-identical by
      // construction (every dropped pair would have been filtered).
      val sh = expl.as("a")
        .join(expl.as("b"),
          col("a.k") === col("b.k") && col("b.n") * 2L >= col("a.n"))
        .groupBy(col("a.mdoc").as("am"), col("a.n").as("an"),
          col("b.mdoc").as("bm"))
        .agg(count(lit(1)).as("shared"))
      val rep = sh.filter($"shared" * 2L >= $"an")
        .groupBy($"am").agg(min($"bm").as("rep"))
      fps.join(sets.select($"fp", $"mdoc"), Seq("fp"))
        .join(rep, $"mdoc" === $"am")
        .select($"doc_id", $"rep".as("rep_id"), ($"rep" < $"doc_id").as("is_dup"))
        .orderBy($"doc_id")
    },

    // REAL pixel-derived image features — the feature-extraction
    // counterpart of dedup_image, replacing the "embedding model" gap
    // with a decoded-pixel statistic under the oracle gate: each doc's
    // 16×16 grayscale rendering goes through the full BMP encode → ImageIO
    // pixel decode, and the features are the 8-bucket intensity histogram
    // (counts of gray >> 5) plus the floor mean — all exact integers, so
    // the oracle replays them from the planted cells without decoding
    // (the byte-histogram extractStub stays only for payloads no JDK
    // codec claims). Map-side decode, vocabulary-free, 72 B/doc output.
    Q("multimodal_image_features", {
      val fCols = (0 until 8).map(i =>
        s"CAST(sum(CASE WHEN (COALESCE(h.v, 0) >> 5) = $i THEN 1 ELSE 0 END) AS BIGINT) AS f$i")
        .mkString(",\n  ")
      s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} % 256 AS p
         |  FROM (${sqlShingleTok("documents")})),
         |hist AS (SELECT doc_id, p, least(255, 16 * count(*)) AS v
         |  FROM w GROUP BY doc_id, p),
         |cell AS (SELECT CAST(unnest(range(256)) AS INT) AS p)
         |SELECT d.doc_id,
         |  $fCols,
         |  CAST(sum(COALESCE(h.v, 0)) // 256 AS BIGINT) AS mean_gray
         |FROM (SELECT DISTINCT doc_id FROM hist) d
         |CROSS JOIN cell c
         |LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.p = c.p
         |GROUP BY d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, d) =>
      val featUdf = udf((gray: Array[Int]) => {
        val bmp = Multimodal.encodeBmpGray(16, 16, gray)
        val (_, _, px) = Multimodal.decodeGrayPixels(bmp).getOrElse(
          sys.error("BMP pixel round-trip failed"))
        val hist8 = new Array[Long](8)
        var sum = 0L
        var j = 0
        while (j < px.length) { hist8(px(j) >> 5) += 1L; sum += px(j); j += 1 }
        (hist8.toSeq, sum / 256L)
      })
      imageGrayFrame(s, d)
        .select($"doc_id", featUdf($"gray").as("e"))
        .select(($"doc_id" +: (0 until 8).map(i =>
          element_at($"e._1", i + 1).as(s"f$i"))) :+ $"e._2".as("mean_gray"): _*)
        .orderBy($"doc_id")
    },

    // REAL image resize under the oracle gate — the last of the brief's
    // four multimodal verbs (decode / feature-extract / resize /
    // frame-sample) to move from stub to real: each doc's 16×16 rendering
    // goes BMP encode → ImageIO pixel decode → nearest-neighbor resample
    // to 8×8 with the exact integer index map src=(2y,2x) → BMP re-encode
    // → ImageIO decode AGAIN ([[Multimodal.resizeImage]] — the output is
    // itself a decodable image, proven by decoding it). Every resized
    // pixel is a sampled planted cell, so the oracle replays the index
    // map in SQL: per-row sums r0..r7 + total pin all 64 sample
    // positions. Map-side codec work, vocabulary-free, ~80 B/doc output.
    Q("multimodal_resize", {
      val rCols = (0 until 8).map(y =>
        s"CAST(sum(CASE WHEN i // 8 = $y THEN v ELSE 0 END) AS BIGINT) AS r$y")
        .mkString(",\n  ")
      s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} % 256 AS p
         |  FROM (${sqlShingleTok("documents")})),
         |hist AS (SELECT doc_id, p, least(255, 16 * count(*)) AS v
         |  FROM w GROUP BY doc_id, p),
         |cell AS (SELECT CAST(unnest(range(64)) AS INT) AS i),
         |samp AS (SELECT d.doc_id, c.i, COALESCE(h.v, 0) AS v
         |  FROM (SELECT DISTINCT doc_id FROM hist) d
         |  CROSS JOIN cell c
         |  LEFT JOIN hist h ON h.doc_id = d.doc_id
         |    AND h.p = 32 * (c.i // 8) + 2 * (c.i % 8))
         |SELECT doc_id, 8 AS width, 8 AS height,
         |  $rCols,
         |  CAST(sum(v) AS BIGINT) AS rsum
         |FROM samp GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val featUdf = udf((gray: Array[Int]) => {
        val bmp = Multimodal.encodeBmpGray(16, 16, gray)
        val rbmp = Multimodal.resizeImage(bmp, 8, 8)
          .getOrElse(sys.error("resize pixel path failed"))
        val (w, h, px) = Multimodal.decodeGrayPixels(rbmp)
          .getOrElse(sys.error("resized BMP decode failed"))
        require(w == 8 && h == 8, "resized dims drifted")
        val rows = (0 until 8).map { y =>
          var t = 0L; var x = 0
          while (x < 8) { t += px(y * 8 + x); x += 1 }
          t
        }
        (rows, rows.sum)
      })
      imageGrayFrame(s, d)
        .select($"doc_id", featUdf($"gray").as("e"))
        .select(($"doc_id" +: Seq(lit(8).as("width"), lit(8).as("height"))) ++
          (0 until 8).map(y => element_at($"e._1", y + 1).as(s"r$y")) :+
          $"e._2".as("rsum"): _*)
        .orderBy($"doc_id")
    },

    // REAL NumPy tensor payloads — `application/x-npy` is in the
    // reference's own recommended-content-type catalog
    // (`docs/draft.md:187-195`): the annotation/tensor member of a
    // training record. Each doc's 16×16 rendering is encoded as an int64
    // .npy v1.0 tensor (magic, padded dict header, little-endian
    // payload), decoded back through the header parse
    // ([[Multimodal.decodeNpyLongs]]), and the output proves the full
    // round-trip: shape dims from the DECODED header, element sum, and a
    // position-weighted checksum Σ (i+1)·vᵢ that any element reorder or
    // byte-order slip changes. Integers are exact, so the oracle replays
    // all three from the planted histogram. Map-side O(256) per doc,
    // no shuffle before the final ORDER BY. (float32 `<f4` — the
    // embedding shape — is pinned bit-exact in MultimodalSpec.)
    Q("multimodal_npy_features", {
      s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} % 256 AS p
         |  FROM (${sqlShingleTok("documents")})),
         |hist AS (SELECT doc_id, p, least(255, 16 * count(*)) AS v
         |  FROM w GROUP BY doc_id, p),
         |cell AS (SELECT CAST(unnest(range(256)) AS INT) AS p),
         |grid AS (SELECT d.doc_id, c.p, COALESCE(h.v, 0) AS v
         |  FROM (SELECT DISTINCT doc_id FROM hist) d
         |  CROSS JOIN cell c
         |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.p = c.p)
         |SELECT doc_id, 16 AS dim0, 16 AS dim1,
         |  CAST(sum(v) AS BIGINT) AS el_sum,
         |  CAST(sum((p + 1) * v) AS BIGINT) AS pos_sum
         |FROM grid GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val featUdf = udf((gray: Array[Int]) => {
        val vals = gray.map(_.toLong)
        val npy = Multimodal.encodeNpyLongs(Seq(16, 16), vals)
        val (shape, dec) = Multimodal.decodeNpyLongs(npy)
          .getOrElse(sys.error("npy round-trip failed"))
        require(shape == Seq(16, 16) && dec.length == 256, "npy shape drifted")
        var elSum = 0L; var posSum = 0L; var i = 0
        while (i < dec.length) {
          elSum += dec(i); posSum += (i + 1) * dec(i); i += 1
        }
        (shape.head, shape(1), elSum, posSum)
      })
      imageGrayFrame(s, d)
        .select($"doc_id", featUdf($"gray").as("e"))
        .select($"doc_id", $"e._1".as("dim0"), $"e._2".as("dim1"),
          $"e._3".as("el_sum"), $"e._4".as("pos_sum"))
        .orderBy($"doc_id")
    },

    // REAL pixel-derived feature EMBEDDING — retiring the last honest
    // stub class for decodable payloads: [[Multimodal.extractFeatures]]'s
    // image path is no longer the byte-histogram stand-in but a genuine
    // decoded-pixel descriptor, and this query gates the kernel it runs
    // ([[Multimodal.pixelEmbed]]): 16×16 rendering → BMP encode → ImageIO
    // pixel decode → exact-integer average pooling to an 8×8 grid (each
    // embedding cell is the floor mean of its 2×2 source block — the
    // downsampled-intensity descriptor classical visual retrieval uses
    // below the learned-model layer). The output pins all 64 cells
    // through five independent exact-integer functionals (sum,
    // position-weighted sum, squared L2 norm, min, max), and the oracle
    // replays the pooling from the planted cells without decoding — four
    // histogram taps per grid cell, `(v₀₀+v₀₁+v₁₀+v₁₁)//4` — so any
    // decoder or pooling deviation hash-diverges. Map-side O(256) per
    // doc, vocabulary-free, no shuffle before the final ORDER BY; at
    // 100 TB this is one codegen scan + per-task codec CPU, the same
    // shape as the image-hash build.
    Q("multimodal_embed", {
      s"""$sqlImagePoolCtes
         |SELECT doc_id, CAST(64 AS BIGINT) AS e_dim,
         |  CAST(sum(v) AS BIGINT) AS e_sum,
         |  CAST(sum((i + 1) * v) AS BIGINT) AS e_wsum,
         |  CAST(sum(v * v) AS BIGINT) AS e_norm2,
         |  CAST(min(v) AS BIGINT) AS e_min,
         |  CAST(max(v) AS BIGINT) AS e_max
         |FROM pool GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val statUdf = udf((e: Array[Long]) => {
        var sumv = 0L; var wsum = 0L; var n2 = 0L
        var mn = Long.MaxValue; var mx = Long.MinValue
        var i = 0
        while (i < e.length) {
          val v = e(i); sumv += v; wsum += (i + 1) * v; n2 += v * v
          if (v < mn) mn = v; if (v > mx) mx = v; i += 1
        }
        (e.length.toLong, sumv, wsum, n2, mn, mx)
      })
      imageEmbedFrame(s, d)
        .select($"doc_id", statUdf($"e").as("t"))
        .select($"doc_id", $"t._1".as("e_dim"), $"t._2".as("e_sum"),
          $"t._3".as("e_wsum"), $"t._4".as("e_norm2"),
          $"t._5".as("e_min"), $"t._6".as("e_max"))
        .orderBy($"doc_id")
    },

    // Image RETRIEVAL over the real decoded-pixel embedding — the
    // similarity-search member of the multimodal family: rank the whole
    // corpus against a query IMAGE (doc 0's rendering) by exact-integer
    // squared-L2 distance between the pooled embeddings
    // ([[imageEmbedFrame]] — genuine BMP→ImageIO→8×8-pool vectors, not
    // byte histograms). All-integer arithmetic (cells ≤ 255 → dist2 ≤
    // 64·255² < 2³³), so both engines rank identically with no float
    // tolerance; ties (exact and near dups of the query plant at
    // dist2 = 0 or near it) break on doc_id. Scale shape: the persisted
    // embed frame (one codegen scan + map-side codec, zero shuffle),
    // a broadcast 1-row query vector, map-side zip_with/aggregate
    // distance, TakeOrdered top-k — the brute-force-scan ANN baseline,
    // which at 100 TB is one pass over ~0.5 KB/doc of cached state; the
    // IVF/LSH family (sim_ann_*) is the indexed path when the query
    // volume, not the corpus, is what scales.
    Q("sim_image_topk", {
      s"""$sqlImagePoolCtes,
         |q AS (SELECT i, v FROM pool WHERE doc_id = 0)
         |SELECT p.doc_id,
         |  CAST(sum((p.v - q.v) * (p.v - q.v)) AS BIGINT) AS dist2
         |FROM pool p JOIN q ON q.i = p.i
         |GROUP BY p.doc_id
         |ORDER BY dist2, doc_id LIMIT 20""".stripMargin
    }) { (s, d) =>
      val emb = imageEmbedFrame(s, d)
      val qv = emb.filter($"doc_id" === 0).select($"e".as("q"))
      emb.crossJoin(broadcast(qv))
        .select($"doc_id",
          aggregate(zip_with($"e", $"q", (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("dist2"))
        .orderBy($"dist2", $"doc_id")
        .limit(20)
    },

    // REAL sample-level audio features — the audio member of the decoded-
    // media family (VERDICT r11 #5, the GIF playbook applied to WAV):
    // each doc plants a deterministic PCM signal (one signed 16-bit
    // sample per whitespace token, `wordHash(w) % 65536 − 32768`), the
    // Spark side encodes a REAL RIFF/WAVE payload and decodes it through
    // the JDK's audio codec (javax.sound.sampled — not our own parser),
    // then computes integer features from the DECODED samples:
    // zero-crossings, floor mean |amplitude|, exact energy Σs², and an
    // 8-bin amplitude histogram ((s+32768)>>13 ∈ 0..7). PCM is lossless,
    // so the oracle replays every feature from the planted samples — a
    // decoder that returned anything but the planted signal
    // hash-diverges; the round-trip IS the correctness proof. Map-side
    // codec, no shuffle before the final ORDER BY; ≤2 B/sample payloads
    // built and dropped inside the task. Energy stays in int64: n ≤ 10⁴
    // samples × 32768² ≈ 10¹³.
    Q("multimodal_audio_features", {
      val aCols = (0 until 8).map(j =>
        s"CAST(len(list_filter(s, x -> (x + 32768) >> 13 = $j)) AS BIGINT) AS a$j")
        .mkString(",\n  ")
      s"""WITH t AS (SELECT doc_id,
         |  [CAST(${H.sqlWordHash("w")} % 65536 - 32768 AS BIGINT)
         |   FOR w IN string_split(text, ' ')] AS s
         |FROM documents)
         |SELECT doc_id,
         |  CAST(len(s) AS BIGINT) AS n_samples,
         |  CAST(len([i FOR i IN range(1, len(s))
         |            IF (s[i] < 0) != (s[i+1] < 0)]) AS BIGINT) AS zero_crossings,
         |  CAST(list_sum(list_transform(s, x -> abs(x))) // len(s) AS BIGINT)
         |    AS mean_abs,
         |  CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy,
         |  $aCols
         |FROM t ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val samples = transform(split($"text", " "),
        w => (H.wordHash(w) % 65536L - 32768L).cast(IntegerType))
      val featUdf = udf((samp: Array[Int]) => {
        val wav = Multimodal.encodeWavPcm16(8000, samp)
        val (_, dec) = Multimodal.decodeWavSamples(wav).getOrElse(
          sys.error("WAV sample round-trip failed"))
        require(dec.length == samp.length, "WAV sample count drifted")
        val hist = new Array[Long](8)
        var zc = 0L
        var sumAbs = 0L
        var energy = 0L
        var i = 0
        while (i < dec.length) {
          val v = dec(i)
          if (i + 1 < dec.length && ((v < 0) != (dec(i + 1) < 0))) zc += 1
          sumAbs += math.abs(v)
          energy += v.toLong * v
          hist((v + 32768) >> 13) += 1
          i += 1
        }
        (dec.length.toLong, zc, sumAbs / dec.length, energy, hist.toSeq)
      })
      documents(s, d)
        .select($"doc_id", featUdf(samples).as("e"))
        .select(($"doc_id" +: Seq($"e._1".as("n_samples"), $"e._2".as("zero_crossings"),
          $"e._3".as("mean_abs"), $"e._4".as("energy"))) ++
          (0 until 8).map(j => element_at($"e._5", j + 1).as(s"a$j")): _*)
        .orderBy($"doc_id")
    },

    // REAL frame-derived video features — the feature-extraction
    // counterpart of dedup_video, completing the {image, audio, video} ×
    // {features, dedup} matrix: each doc's 4-frame 16×16 grayscale
    // rendering goes through the full GIF encode → ImageIO multi-frame
    // decode, and the features come from the DECODED frames
    // ([[Multimodal.videoFeatures]]): per-frame floor mean m0..m3, total
    // temporal motion Σ_f Σ_p |px_{f+1} − px_f| (the scene-change
    // statistic), and the global 8-bucket intensity histogram over all
    // four frames. The GIF grayscale round-trip is exact, so the oracle
    // replays every integer from the planted per-frame histograms without
    // decoding — a decoder deviation hash-diverges. Scale shape: the
    // row-local videoGrayHist codegen kernel + a map-side O(4·256) codec
    // round-trip per doc; no shuffle before the final ORDER BY.
    Q("multimodal_video_features", {
      val frVals = (0 until VideoFrames)
        .map(f => s"(${f}, ${H.affineA(f)}, ${H.affineB(f)})").mkString(", ")
      val vCols = (0 until VideoFrames).map(f =>
        s"sum(CASE WHEN f = $f THEN v ELSE 0 END) AS v$f").mkString(",\n  ")
      val mCols = (0 until VideoFrames).map(f =>
        s"CAST(sum(v$f) // 256 AS BIGINT) AS m$f").mkString(",\n  ")
      val motion = (0 until VideoFrames - 1)
        .map(f => s"abs(v${f + 1} - v$f)").mkString(" + ")
      val gCols = (0 until 8).map(g =>
        s"CAST(sum(${(0 until VideoFrames).map(f =>
          s"CASE WHEN v$f >> 5 = $g THEN 1 ELSE 0 END").mkString(" + ")}) AS BIGINT) AS g$g")
        .mkString(",\n  ")
      s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} AS x
         |  FROM (${sqlShingleTok("documents")})),
         |fr AS (SELECT * FROM (VALUES $frVals) t(f, fa, fb)),
         |hist AS (SELECT doc_id, f, p, least(255, 16 * count(*)) AS v FROM (
         |    SELECT w.doc_id, fr.f, ((w.x * fr.fa + fr.fb) % ${H.P1}) % 256 AS p
         |    FROM w CROSS JOIN fr)
         |  GROUP BY doc_id, f, p),
         |vd AS (SELECT DISTINCT doc_id FROM w),
         |cell AS (SELECT CAST(unnest(range(256)) AS INT) AS p),
         |grid AS (SELECT d.doc_id, fr.f, c.p, COALESCE(h.v, 0) AS v
         |  FROM vd d CROSS JOIN fr CROSS JOIN cell c
         |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.f = fr.f AND h.p = c.p),
         |pix AS (SELECT doc_id, p,
         |  $vCols
         |  FROM grid GROUP BY doc_id, p)
         |SELECT doc_id,
         |  $mCols,
         |  CAST(sum($motion) AS BIGINT) AS motion,
         |  $gCols
         |FROM pix GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val featUdf = udf((gray: Array[Int]) => {
        val frames = (0 until VideoFrames).map { f =>
          val g = new Array[Int](256)
          var i = 0
          while (i < 256) { g(i) = gray(f * 256 + i); i += 1 }
          g
        }
        Multimodal.videoFeatures(16, 16, frames)
      })
      documents(s, d)
        .select($"doc_id",
          graft.functions.ImageRender.videoGrayHistCol($"text", VideoFrames)
            .as("gray"))
        .filter(size($"gray") > 0)
        .select($"doc_id", featUdf($"gray").as("e"))
        .select(($"doc_id" +:
          (0 until VideoFrames).map(f => element_at($"e._1", f + 1).as(s"m$f"))) ++
          ($"e._2".as("motion") +:
            (0 until 8).map(g => element_at($"e._3", g + 1).as(s"g$g"))): _*)
        .orderBy($"doc_id")
    },

    // REAL AVI container round-trip — the SECOND video container beside
    // GIF, and the one that carries frame-exact TIMING metadata: each
    // doc's 4-frame rendering encodes as a RIFF AVI with uncompressed
    // 8-bit DIB frames ('DIB ' VfW codec, identity gray palette), the
    // header fields (width/height/frame count/µs-per-frame/duration) come
    // from the REAL avih parse, and per-frame pixel sums come from the
    // DECODED frames — each '00db' DIB chunk decoded through the JDK's
    // actual BMP ImageIO codec ([[Multimodal.decodeAviFrames]]). DIB is
    // lossless, so the oracle replays the sums from the planted per-frame
    // histograms and the header fields as the arithmetic constants the
    // encoder wrote — a container-walk or codec deviation hash-diverges.
    // Scale shape: identical to multimodal_video_features — the row-local
    // videoGrayHist codegen kernel + a map-side O(4·256) codec round-trip
    // per doc; no shuffle before the final ORDER BY.
    Q("multimodal_avi_features", {
      val usPf = 1000000L / AviFps
      val durUs = usPf * VideoFrames
      val frVals = (0 until VideoFrames)
        .map(f => s"(${f}, ${H.affineA(f)}, ${H.affineB(f)})").mkString(", ")
      val sCols = (0 until VideoFrames).map(f =>
        s"CAST(sum(CASE WHEN f = $f THEN v ELSE 0 END) AS BIGINT) AS s$f")
        .mkString(",\n  ")
      s"""WITH w AS (SELECT doc_id, ${H.sqlWordHash("w")} AS x
         |  FROM (${sqlShingleTok("documents")})),
         |fr AS (SELECT * FROM (VALUES $frVals) t(f, fa, fb)),
         |hist AS (SELECT doc_id, f, p, least(255, 16 * count(*)) AS v FROM (
         |    SELECT w.doc_id, fr.f, ((w.x * fr.fa + fr.fb) % ${H.P1}) % 256 AS p
         |    FROM w CROSS JOIN fr)
         |  GROUP BY doc_id, f, p)
         |SELECT doc_id, 16 AS width, 16 AS height,
         |  $VideoFrames AS n_frames,
         |  CAST($usPf AS BIGINT) AS us_per_frame,
         |  CAST($durUs AS BIGINT) AS dur_micros,
         |  $sCols
         |FROM hist GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val featUdf = udf((gray: Array[Int]) => {
        val frames = (0 until VideoFrames).map { f =>
          val g = new Array[Int](256)
          var i = 0
          while (i < 256) { g(i) = gray(f * 256 + i); i += 1 }
          g
        }
        val avi = Multimodal.encodeAviGray(16, 16, AviFps, frames)
        val meta = Multimodal.decodeAviMeta(avi)
          .getOrElse(sys.error("AVI header round-trip failed"))
        val dec = Multimodal.decodeAviFrames(avi)
        require(dec.length == frames.length && meta._3 == frames.length,
          "AVI frame round-trip failed")
        val sums = dec.map { case (_, _, px) =>
          var t = 0L; var i = 0
          while (i < px.length) { t += px(i); i += 1 }
          t
        }
        (meta._1, meta._2, meta._3, meta._4, meta._5, sums)
      })
      documents(s, d)
        .select($"doc_id",
          graft.functions.ImageRender.videoGrayHistCol($"text", VideoFrames)
            .as("gray"))
        .filter(size($"gray") > 0)
        .select($"doc_id", featUdf($"gray").as("e"))
        .select(($"doc_id" +: Seq($"e._1".as("width"), $"e._2".as("height"),
          $"e._3".as("n_frames"), $"e._4".as("us_per_frame"),
          $"e._5".as("dur_micros"))) ++
          (0 until VideoFrames).map(f => element_at($"e._6", f + 1).as(s"s$f")): _*)
        .orderBy($"doc_id")
    },

    // REAL MP4 (ISO BMFF) MJPEG round-trip — the THIRD video container,
    // and the one that retires the last frame-decode stub: per doc, 4
    // FLAT 16×16 frames (value 16+32·bucket_f, bucket planted from the
    // doc_id affine family) encode as an MP4 with Motion-JPEG samples
    // ([[Multimodal.encodeMp4Mjpeg]] — full moov with mvhd/tkhd and a
    // complete stbl sample table), the REAL demux walks stsd/stsc/stsz/
    // stco to slice each sample ([[Multimodal.decodeMp4Samples]]), and
    // each sample decodes through the JDK's actual JPEG ImageIO codec.
    // Flat frames are DC-only, so the JDK JPEG round-trip is bit-exact
    // (MultimodalSpec pins all 8 gray levels) — and the contract still
    // buckets the decoded mean by 32, so ±15 of codec drift can never
    // flip a value. The oracle replays the planted buckets and the
    // container timing constants (duration 15000/90000 units exercises
    // the truncating µs division); a demux or codec deviation
    // hash-diverges. The header-path [[Multimodal.decodeMp4]] parse is
    // cross-checked against the demux dims inside the UDF. Scale shape:
    // map-side O(4·256) codec round-trip per doc, no shuffle before the
    // final ORDER BY — identical to the GIF/AVI video paths.
    Q("multimodal_mp4_features", {
      val durUnits = Mp4SampleDelta.toLong * VideoFrames
      val durMicros = durUnits * 1000000L / Mp4Timescale
      val bExprs = (0 until VideoFrames).map(f =>
        s"(doc_id * ${H.affineA(200 + f)} + ${H.affineB(200 + f)}) % ${H.P1} % 8 AS b$f")
        .mkString(",\n  |    ")
      val motion = (0 until VideoFrames - 1)
        .map(f => s"abs(b${f + 1} - b$f)").mkString(" + ")
      s"""WITH b AS (SELECT doc_id,
         |    $bExprs
         |  FROM documents)
         |SELECT doc_id, 16 AS width, 16 AS height,
         |  $VideoFrames AS n_frames,
         |  CAST($Mp4Timescale AS BIGINT) AS timescale,
         |  CAST($durUnits AS BIGINT) AS dur_units,
         |  CAST($durMicros AS BIGINT) AS dur_micros,
         |  ${(0 until VideoFrames).map(f => s"CAST(b$f AS BIGINT) AS b$f").mkString(", ")},
         |  CAST($motion AS BIGINT) AS motion
         |FROM b ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val featUdf = udf((docId: Long) => {
        val frames = (0 until VideoFrames).map { f =>
          val bucket = ((docId * H.affineA(200 + f) + H.affineB(200 + f)) % H.P1 % 8).toInt
          Array.fill(256)(16 + 32 * bucket)
        }
        val mp4 = Multimodal.encodeMp4Mjpeg(16, 16, Mp4Timescale, Mp4SampleDelta, frames)
        val (w, h, ts, durUnits, samples) = Multimodal.decodeMp4Samples(mp4)
          .getOrElse(sys.error("MP4 demux round-trip failed"))
        val dec = Multimodal.decodeMp4Frames(mp4)
        require(dec.length == frames.length && samples.length == frames.length,
          "MP4 frame round-trip failed")
        // header path (mvhd/tkhd) must agree with the demux (stsd) dims
        val meta = Multimodal.decodeMp4(mp4)
          .getOrElse(sys.error("MP4 header parse failed"))
        require(meta._1 == w && meta._2 == h, "MP4 header/demux dim mismatch")
        val buckets = dec.map { case (_, _, px) =>
          var t = 0L; var i = 0
          while (i < px.length) { t += px(i); i += 1 }
          // mean is exactly 16+32k (flat DC-only JPEG); bucket floor is
          // robust to ±15 of codec drift either way
          (t / px.length / 32).toLong
        }
        val motion = buckets.sliding(2).map(p => math.abs(p(1) - p(0))).sum
        (w, h, samples.length, ts, durUnits,
          durUnits * 1000000L / ts, buckets, motion)
      })
      documents(s, d)
        .select($"doc_id", featUdf($"doc_id").as("e"))
        .select(($"doc_id" +: Seq($"e._1".as("width"), $"e._2".as("height"),
          $"e._3".as("n_frames"), $"e._4".cast(LongType).as("timescale"),
          $"e._5".as("dur_units"), $"e._6".as("dur_micros"))) ++
          (0 until VideoFrames).map(f => element_at($"e._7", f + 1).as(s"b$f")) :+
          $"e._8".as("motion"): _*)
        .orderBy($"doc_id")
    },

    // Corpus mixture rebalancing — the data-mixing primitive: downsample
    // every language stratum to the smallest stratum's token budget with a
    // DETERMINISTIC per-doc hash gate (affine mod 10^6 vs floor(rate·10^6)
    // — reproducible across runs/engines, unlike Bernoulli sample()). The
    // gate is a broadcast of |langs| rates applied inside the scan — no
    // shuffle touches the full corpus; both rollups are vocabulary-sized.
    // floor() is explicit: Spark's double→long cast truncates while
    // DuckDB's rounds, so the raw cast would disagree on the cutoff.
    Q("corpus_mixture", {
      val gate = s"${H.sqlAffine(0, "doc_id")} % 1000000"
      s"""WITH tok AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM documents),
         |tot AS (SELECT lang, count(*) AS n_docs,
         |    CAST(sum(toks) AS BIGINT) AS total_toks FROM tok GROUP BY lang),
         |tgt AS (SELECT min(total_toks) AS budget FROM tot),
         |rate AS (SELECT lang, n_docs, total_toks,
         |    CAST(budget AS DOUBLE) / total_toks AS rate FROM tot, tgt),
         |kept AS (SELECT t.lang, count(*) AS kept_docs,
         |    CAST(sum(t.toks) AS BIGINT) AS kept_toks
         |  FROM tok t JOIN rate r ON t.lang = r.lang
         |  WHERE $gate < CAST(floor(r.rate * 1000000) AS BIGINT)
         |  GROUP BY t.lang)
         |SELECT r.lang, n_docs, total_toks, rate,
         |  COALESCE(kept_docs, 0) AS kept_docs,
         |  COALESCE(kept_toks, 0) AS kept_toks
         |FROM rate r LEFT JOIN kept k ON r.lang = k.lang
         |ORDER BY r.lang""".stripMargin
    }) { (s, d) =>
      val tok = documents(s, d).select($"doc_id", $"lang",
        size(split($"text", " ")).cast(LongType).as("toks"))
      val tot = tok.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"toks").as("total_toks"))
      // 1-row global min: a driver scalar, same as the oracle's tgt CTE
      val budget = tot.agg(min($"total_toks")).head.getLong(0)
      val rate = tot.withColumn("rate",
        lit(budget).cast(DoubleType) / $"total_toks")
      val kept = tok
        .join(broadcast(rate.select($"lang", $"rate")), "lang")
        .filter(H.affine(0, $"doc_id") % 1000000L <
          floor($"rate" * 1000000).cast(LongType))
        .groupBy($"lang")
        .agg(count(lit(1)).as("kept_docs"), sum($"toks").as("kept_toks"))
      rate.join(kept, Seq("lang"), "left")
        .select($"lang", $"n_docs", $"total_toks", $"rate",
          coalesce($"kept_docs", lit(0L)).as("kept_docs"),
          coalesce($"kept_toks", lit(0L)).as("kept_toks"))
        .orderBy($"lang")
    },

    // Int8 scalar quantization of the embedding column — the 4×
    // storage-shrink pass an ANN index runs before bucketing. Per-vector
    // min/max affine codes (floor((x−vmin)/scale), clamped to [0,255]);
    // map-only, embarrassingly parallel, no shuffle but the final sort.
    // Engine-portable by construction: code_sum is an INTEGER fold
    // (associative), max_abs_err is a MAX (order-independent), and every
    // double op (sub/div/floor/mul/abs on float-exact inputs) is a fixed
    // IEEE sequence identical in both engines; /nullif(scale,0) turns the
    // constant-vector edge into NULL→code 0, err 0 — never inf.
    Q("embedding_quantize",
      """WITH m AS (SELECT vec_id, label, embedding,
        |    CAST(list_min(embedding) AS DOUBLE) AS vmin,
        |    CAST(list_max(embedding) AS DOUBLE) AS vmax,
        |    (CAST(list_max(embedding) AS DOUBLE) -
        |     CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale
        |  FROM embeddings),
        |c AS (SELECT vec_id, label, vmin, vmax, scale,
        |    CAST(len(embedding) AS INT) AS n_dims,
        |    [COALESCE(LEAST(GREATEST(CAST(floor(
        |        (CAST(x AS DOUBLE) - vmin) / nullif(scale, 0.0)) AS BIGINT),
        |      0), 255), 0) FOR x IN embedding] AS codes
        |  FROM m),
        |e AS (SELECT c.*, m.embedding FROM c JOIN m USING (vec_id, label, vmin, vmax, scale))
        |SELECT vec_id, label, n_dims, vmin, vmax,
        |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
        |  list_max([abs(CAST(embedding[i] AS DOUBLE) -
        |      (vmin + (CAST(codes[i] AS DOUBLE) + 0.5) * scale))
        |    FOR i IN range(1, n_dims + 1)]) AS max_abs_err
        |FROM e ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = embeddings(s, d)
        .withColumn("vmin", array_min($"embedding").cast(DoubleType))
        .withColumn("vmax", array_max($"embedding").cast(DoubleType))
        .withColumn("scale", ($"vmax" - $"vmin") / 255.0)
        .withColumn("sdiv", when($"scale" === 0.0, lit(null)).otherwise($"scale"))
      def code(x: Column, vmin: Column, sdiv: Column): Column =
        coalesce(least(greatest(
          floor((x.cast(DoubleType) - vmin) / sdiv).cast(LongType), lit(0L)),
          lit(255L)), lit(0L))
      e.select($"vec_id", $"label",
          size($"embedding").as("n_dims"), $"vmin", $"vmax",
          aggregate(transform($"embedding", x => code(x, $"vmin", $"sdiv")),
            lit(0L), (acc, x) => acc + x).as("code_sum"),
          array_max(transform($"embedding", x =>
            abs(x.cast(DoubleType) -
              ($"vmin" + (code(x, $"vmin", $"sdiv").cast(DoubleType) + 0.5) * $"scale"))))
            .as("max_abs_err"))
        .orderBy($"vec_id")
    },

    // The dedup-planning profile as a first-class operator: the shingle
    // document-frequency statistics that drive [[jaccardPairsAuto]]'s
    // naive-vs-prefix dispatch, exposed so a user can profile a corpus
    // BEFORE committing to a dedup strategy. All integer aggregates
    // (Σdf and Σdf² exact in BIGINT — the internal ShingleStats keeps
    // Σdf² in double, the oracle-hashed surface is exact); blowup is one
    // double division. One shuffle on shingle, one 1-row rollup.
    Q("corpus_df_profile",
      s"""WITH tok AS (
         |  ${sqlShingleTok("documents")}),
         |df AS (SELECT w, count(*) AS df FROM tok GROUP BY w)
         |SELECT CAST(SUM(df) AS BIGINT) AS total_tokens,
         |  count(*) AS distinct_shingles,
         |  CAST(max(df) AS BIGINT) AS max_df,
         |  CAST(SUM(df * df) AS BIGINT) AS sum_df2,
         |  CAST(SUM(df * df) AS DOUBLE) / CAST(SUM(df) AS DOUBLE) AS blowup
         |FROM df""".stripMargin) { (s, d) =>
      shingleTok(documents(s, d))
        .groupBy($"w").agg(count(lit(1)).as("df"))
        .agg(sum($"df").cast(LongType).as("total_tokens"),
          count(lit(1)).as("distinct_shingles"),
          max($"df").cast(LongType).as("max_df"),
          sum($"df" * $"df").cast(LongType).as("sum_df2"),
          (sum($"df" * $"df").cast(DoubleType) /
            sum($"df").cast(DoubleType)).as("blowup"))
    },

    // The BPE-training inner loop, one iteration: adjacent character-pair
    // frequencies over lowercased alpha words — the table a tokenizer
    // trainer maximizes over to pick its next merge. Pairs are counted
    // over the DISTINCT-word histogram weighted by occurrence count (the
    // same trick bpe_merges uses, and how GPT-2's trainer actually works):
    // the per-char explode runs once per VOCABULARY word, not once per
    // corpus occurrence — identical counts, CPU bounded by vocab size on
    // replicated corpora (this was the single most expensive sf10 entry,
    // 88 s of pure interpreted-expression CPU, at occurrence granularity).
    // Two shuffles, both tiny after map-side combine: word keys (vocab-
    // sized) then 2-char pair keys (≤26²). Top-k via TakeOrdered.
    Q("bpe_pair_counts",
      """WITH w AS (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |  FROM documents),
        |h AS (SELECT w, count(*) AS freq FROM w WHERE length(w) >= 2 GROUP BY w),
        |p AS (SELECT unnest([substring(w, i, 2) FOR i IN range(1, length(w))]) AS pair,
        |  freq FROM h)
        |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 200""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(explode(
          graft.functions.TextStats.wordTokensCol($"text", 2)).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("freq"))
        .withColumn("cs", split($"w", ""))
        .select(explode(transform(sequence(lit(1), length($"w") - 1),
          i => concat(element_at($"cs", i), element_at($"cs", i + 1)))).as("pair"),
          $"freq")
        .groupBy($"pair").agg(sum($"freq").cast(LongType).as("n"))
        .orderBy($"n".desc, $"pair")
        .limit(200)
    },

    // The full BPE tokenizer-training loop (bpe_pair_counts is ONE
    // iteration): N greedy merges over the distinct-WORD histogram — the
    // standard trainer shape (GPT-2 BPE trains on word counts, not the
    // corpus), so per-iteration cost is vocab-bounded regardless of corpus
    // size; the corpus is touched exactly once to build the histogram.
    // Each word's tokenization is a DOUBLE-space-joined symbol string
    // ("  a  b  c  ") and a merge is one literal
    // `replace(s, " a  b ", " ab ")` — under this encoding every
    // occurrence owns its boundary spaces, so the engines' left-to-right
    // non-overlapping replace IS greedy BPE exactly (the property test in
    // BpeMergesSpec pins it against a direct greedy scan; a single-space
    // two-pass scheme misaligned self-pair merges on runs ≥ 5). No
    // per-row lambda fold. Argmax per iteration is a
    // 1-ROW driver scalar (count desc, then lexicographic pair — a total,
    // engine-identical tie order); each iteration's histogram is persisted
    // and the parent unpersisted, so lineage stays flat across the loop.
    Q("bpe_merges", bpeMergesOracleSql(BpeMergeRounds)) { (s, d) =>
      // selective import: s.implicits._ would make the $ interpolator
      // ambiguous with this file's Interp
      import s.implicits.{localSeqToDatasetHolder, newProductEncoder}
      bpeTrained(s, d)._1.toDF("step", "lhs", "rhs", "merged", "n")
        .orderBy($"step")
    },

    // Apply the trained merge table: tokenize every document with the
    // BPE vocabulary bpe_merges learned — the serving half of the
    // tokenizer. Per-doc token counts come from one join of exploded doc
    // words against the memoized word→tokenization histogram (the loop's
    // final state), so application costs one explode + one vocab-keyed
    // join — no per-document merge replay. Words below the 2-char
    // training floor tokenize to 1 symbol (left join + coalesce). The
    // join side is vocab-bounded; AQE broadcasts it while it fits and
    // falls back to a word-keyed shuffle join past the threshold — the
    // right call at 100 TB where a web-scale vocab outgrows a broadcast.
    Q("bpe_encode", bpeEncodeOracleSql(BpeMergeRounds)) { (s, d) =>
      bpeTokenize(s, d, documents(s, d)).orderBy($"doc_id")
    },

    // Flesch reading ease per document — the classic readability screen.
    // All inputs are exact integer counts (words, sentence splits, vowel-
    // group syllable estimate); the score is a FIXED double expression
    // tree — literals cast to double explicitly so neither engine routes
    // through decimal — hence bit-identical. Map-only + final sort.
    Q("text_readability",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |      w -> length(w) > 0)) AS BIGINT) AS n_words,
        |    CAST(GREATEST(1, len(list_filter(string_split_regex(text, '[.!?]+'),
        |      s -> trim(s) != ''))) AS BIGINT) AS n_sentences,
        |    CAST(list_sum([GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+')))
        |      FOR w IN list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |        w -> length(w) > 0)]) AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch
        |FROM t WHERE n_words > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      // one codegen scan per document ([[graft.functions.TextStats]])
      // instead of three regex passes + an interpreted per-word lambda —
      // the oracle above still runs the regex formulation, so the hash
      // pins the scan to it
      val t = documents(s, d)
        .withColumn("__rc", graft.functions.TextStats.readabilityCol($"text"))
        .withColumn("n_words", $"__rc.n_words")
        .withColumn("n_sentences", $"__rc.n_sentences")
        .withColumn("n_syllables", $"__rc.n_syllables")
      t.filter($"n_words" > 0)
        .select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
          (lit(206.835) - lit(1.015) *
              ($"n_words".cast(DoubleType) / $"n_sentences".cast(DoubleType)) -
            lit(84.6) *
              ($"n_syllables".cast(DoubleType) / $"n_words".cast(DoubleType)))
            .as("flesch"))
        .orderBy($"doc_id")
    },

    // Incremental (cross-dataset) near-dup: a NEW batch deduped against an
    // EXISTING corpus — the daily-crawl admission shape, distinct from
    // self-dedup: candidates come only from batch⋈corpus band-bucket
    // collisions (never batch×batch or corpus×corpus), so the daily cost
    // scales with |batch|·bucket-hit-rate, not the corpus. Here the halves
    // are doc_id parity over the same table; in production the corpus side's
    // band table is a PRECOMPUTED index that the batch probes.
    Q("dedup_incremental", {
      val sigColsSql = (0 until 32)
        .map(i => s"min(${H.sqlAffine(i, "x")}) AS h$i").mkString(", ")
      val bandSql = (0 until 8).map(b =>
        s"SELECT doc_id, $b AS band, " +
          s"${H.sqlFoldHash((0 until 4).map(r => s"h${b * 4 + r}"))} AS bh FROM sig")
        .mkString(" UNION ALL ")
      val agreeSql = (0 until 32)
        .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  ${sqlShingleTok("documents")}),
         |x AS (SELECT doc_id, ${H.sqlWordHash("w")} AS x FROM tok),
         |sig AS (SELECT doc_id, $sigColsSql FROM x GROUP BY doc_id),
         |band AS ($bandSql),
         |cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |  FROM band b JOIN band c
         |  ON b.band = c.band AND b.bh = c.bh
         |  AND b.doc_id % 2 = 1 AND c.doc_id % 2 = 0)
         |SELECT batch_id, corpus_id,
         |  CAST(($agreeSql) AS DOUBLE) / 32 AS est_jac
         |FROM cand JOIN sig sa ON sa.doc_id = batch_id
         |JOIN sig sb ON sb.doc_id = corpus_id
         |WHERE CAST(($agreeSql) AS DOUBLE) / 32 >= 0.5
         |ORDER BY batch_id, corpus_id""".stripMargin
    }) { (s, d) =>
      incrementalPairs(s, d).orderBy($"batch_id", $"corpus_id")
    },

    // Corpus drift between two snapshots (doc_id-parity halves standing in
    // for yesterday/today): per-language share shift. Shares are ONE double
    // division of exact counts; delta is an IEEE subtraction of those; the
    // log-ratio goes through round(,6) — the ln() grid precedent — because
    // libm last-ulps differ between engines. Two vocabulary-sized rollups.
    Q("corpus_drift",
      """WITH a AS (SELECT lang, count(*) AS n_a FROM documents
        |  WHERE doc_id % 2 = 0 GROUP BY lang),
        |b AS (SELECT lang, count(*) AS n_b FROM documents
        |  WHERE doc_id % 2 = 1 GROUP BY lang),
        |ta AS (SELECT CAST(SUM(n_a) AS DOUBLE) AS t_a FROM a),
        |tb AS (SELECT CAST(SUM(n_b) AS DOUBLE) AS t_b FROM b)
        |SELECT COALESCE(a.lang, b.lang) AS lang,
        |  COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
        |  CAST(COALESCE(n_a, 0) AS DOUBLE) / t_a AS p_a,
        |  CAST(COALESCE(n_b, 0) AS DOUBLE) / t_b AS p_b,
        |  CAST(COALESCE(n_a, 0) AS DOUBLE) / t_a
        |    - CAST(COALESCE(n_b, 0) AS DOUBLE) / t_b AS delta,
        |  CASE WHEN COALESCE(n_a, 0) > 0 AND COALESCE(n_b, 0) > 0
        |    THEN round(ln((CAST(n_a AS DOUBLE) / t_a)
        |                / (CAST(n_b AS DOUBLE) / t_b)), 6) END AS log_ratio
        |FROM a FULL JOIN b ON a.lang = b.lang, ta, tb
        |ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      val a = docs.filter($"doc_id" % 2 === 0)
        .groupBy($"lang").agg(count(lit(1)).as("n_a"))
      val b = docs.filter($"doc_id" % 2 === 1)
        .groupBy($"lang").agg(count(lit(1)).as("n_b"))
      val ta = a.agg(sum($"n_a").cast(DoubleType).as("t_a"))
      val tb = b.agg(sum($"n_b").cast(DoubleType).as("t_b"))
      val pa = coalesce($"n_a", lit(0L)).cast(DoubleType) / $"t_a"
      val pb = coalesce($"n_b", lit(0L)).cast(DoubleType) / $"t_b"
      a.join(b, Seq("lang"), "full")
        .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
        .select($"lang",
          coalesce($"n_a", lit(0L)).as("n_a"), coalesce($"n_b", lit(0L)).as("n_b"),
          pa.as("p_a"), pb.as("p_b"), (pa - pb).as("delta"),
          when(coalesce($"n_a", lit(0L)) > 0 && coalesce($"n_b", lit(0L)) > 0,
            round(log(($"n_a".cast(DoubleType) / $"t_a") /
              ($"n_b".cast(DoubleType) / $"t_b")), 6)).as("log_ratio"))
        .orderBy($"lang")
    }
  )

  /** The module's shared-intermediate builds (memoized index/pair-graph
    * state), named so Bench can charge each to an explicit `build:*`
    * stage instead of whichever consumer query happens to run first —
    * round-7 verdict: dedup_minhash_cluster's reported time swung
    * 0.1 s ↔ 8.2 s across artifacts purely on memo-fill ordering. Each
    * entry forces one (session, dir) memo; all are idempotent cache
    * fills, so Bench runs them exactly once.
    */
  def sharedBuilds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "shingle_stats" -> ((s, d) => { docShingleStats(s, d); () }),
    // the metric-independent candidate frame both pair families project;
    // built here once so jaccard/contain build stages report their own
    // marginal (filter-only) cost. No-op on heavy-tailed corpora, where
    // the dispatch routes both families to their prefix paths instead.
    "inter_counts" -> ((s, d) =>
      if (docShingleStats(s, d).blowup <= JaccardBlowupCutover) {
        interCounts(s, d).count(); ()
      }),
    "jaccard_pairs" -> ((s, d) => { goodPairs(s, d, 0.5).count(); () }),
    "contain_pairs" -> ((s, d) => {
      goodContainPairs(s, d, 0.8).count()
      // both registry pair families are now materialized — release the
      // unthresholded parent frame they projected from
      releaseInterCounts(s, d)
    }),
    "minhash_sig" -> ((s, d) => { minhashSig(s, d).count(); () }),
    "minhash_pairs" -> ((s, d) => { minhashPairs(s, d).count(); () }),
    "incremental_sigs" -> ((s, d) => { incrementalPairs(s, d).count(); () }),
    "lsh_frame" -> ((s, d) => { lshFrame(s, d).count(); () }),
    "pq_codebook" -> ((s, d) => { trainedCodebook(s, d); () }),
    "kmeans_cells" -> ((s, d) => {
      val eq = lshFrame(s, d)
      val init = coldStartRows(eq, deriveCellCount(embCount(eq, Some((s, d)))))
      if (init.nonEmpty) { kmeansRefined(s, d, eq, init, init.head._2.length); () }
    }),
    "ivf_cell_layout" -> ((s, d) => { ivfCellLayout(s, d); () }),
    "bpe_table" -> ((s, d) => { bpeTrained(s, d)._2.count(); () }),
    "image_hash" -> ((s, d) => { imageHashFrame(s, d).count(); () }),
    "image_embed" -> ((s, d) => { imageEmbedFrame(s, d).count(); () }),
    "video_hash" -> ((s, d) => { videoHashFrame(s, d).count(); () }),
    "audio_hash" -> ((s, d) => { audioHashFrame(s, d).count(); () }))

  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
