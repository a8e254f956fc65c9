package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared core of the quality_distill_stump query and the
  * [[CurationPipeline]] distillation stages: hashed bag-of-words features,
  * the Gopher keep label, and the exact greedy split search (the histogram
  * base-learner primitive of distributed GBDT). Train-once-serve-many is
  * the point of the public API: [[train]] runs the full histogram search on
  * a (sampled) corpus and collects the ONE-row model; [[filterFrame]]
  * scores any corpus against that model by computing only the model's
  * single feature — one token pass + one per-doc aggregate, no grid, no
  * histogram — the cheap serving path a 100 TB curation run wants after
  * distilling an expensive rule on a sample.
  */
object QualityDistill {

  /** Feature-space width: B hashed word buckets + bucket B = total count. */
  val B = 16

  /** The learned stump: keep a doc iff feature(bucket) >= threshold. */
  final case class StumpModel(bucket: Long, threshold: Long, trainErr: Long)

  private def tok(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.TextStats.wordTokensCol(col("text"), 1)).as("w"))

  private def bucketOf(w: Column): Column =
    graft.functions.CrossHash.wordHash(w) % B

  /** Zero-filled (doc_id, b, x) feature frame over all B+1 features. */
  private[llm] def featFrame(docs: DataFrame): DataFrame = {
    // Dense per-doc aggregate instead of the (doc × B) zero-fill grid
    // join: the grid shape exchanged and joined B rows per document and
    // re-read the joined frame for the total row (441 MB shuffle at
    // sf10); one groupBy(doc_id) with B conditional sums produces the
    // same zero-filled rows from a doc-count-sized frame, the total is a
    // row-local sum of the dense columns, and the left join back to
    // `docs` only restores all-zero rows for documents with no tokens.
    val dense = (0 until B).map(i =>
      sum(when(col("b") === i, 1L).otherwise(0L)).as(s"x$i"))
    val byDoc = tok(docs)
      .select(col("doc_id"), bucketOf(col("w")).as("b"))
      .groupBy(col("doc_id"))
      .agg(dense.head, dense.tail: _*)
    val xs = (0 until B).map(i => coalesce(col(s"x$i"), lit(0L)))
    docs.select(col("doc_id")).join(byDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), posexplode(array(xs :+ xs.reduce(_ + _): _*)))
      .select(col("doc_id"), col("pos").cast(LongType).as("b"), col("col").as("x"))
  }

  // ─────────────── row-local (array-shaped) training frames ────────────
  // The explode→groupBy→join formulations below ([[featFrame]],
  // [[gopherLabel]], [[jointLabel]]) are kept as the REFERENCE
  // formulations — the DuckDB oracle runs their SQL twins and
  // StumpDistillSpec diffs the kernels against them — but training now
  // runs on ONE map-only scan per corpus: all B+3 features land in a
  // per-doc array ([[graft.functions.TextStats.bucketCountsCol]] +
  // [[graft.functions.TextStats.repetitionCol]]) and the label comes from
  // the one-pass [[graft.functions.TextStats.gopherStatsCol]] kernel, so
  // the per-round histogram is `posexplode → groupBy(b, x)` (partial-agg,
  // vocabulary-sized shuffle) with ZERO doc-keyed exchanges and ZERO
  // joins. r12 optimization — guide §2.3 "aggregate before you shuffle" /
  // §2.4 "remove shuffles outright": the previous shape paid 2 corpus
  // exchanges (token groupBy + zero-fill join) per feature frame and 2
  // more (gopher groupBy + label join) per training round's survivor set.

  /** Gopher keep label as row-local columns over `docs`: (y, labeled) —
    * `labeled` is the inner-join semantics of the reference formulation
    * (docs with zero `\s+`-split words have no label row and are excluded
    * from training and query output).
    */
  private[llm] def gopherLabelCols: (Column, Column) = {
    val g = graft.functions.TextStats.gopherStatsCol(col("text"))
    val nw = g.getField("n_words")
    val meanW = g.getField("sum_wlen").cast(DoubleType) / nw
    val alpha = g.getField("n_alpha").cast(DoubleType) / nw
    val y = when(nw >= 50L && nw <= 100000L &&
      meanW >= 3 && meanW <= 10 && alpha >= 0.8, 1L).otherwise(0L)
    (y, nw > 0L)
  }

  /** Joint Gopher ∧ low-repetition label, row-local (the reference
    * formulation is [[jointLabel]]).
    */
  private[llm] def jointLabelCols: (Column, Column) = {
    val (gy, labeled) = gopherLabelCols
    val r = graft.functions.TextStats.repetitionCol(col("text"))
    val repOk = r.getField("n_grams") === 0L ||
      r.getField("n_dup") * 50L <= r.getField("n_grams")
    (when(gy === 1L && repOk, 1L).otherwise(0L), labeled)
  }

  /** (doc_id, xv, y, labeled) — the stump's B+1 features as one array
    * column, Gopher label, all row-local: one codegen scan of `docs`.
    */
  private[llm] def stumpVec(docs: DataFrame): DataFrame = {
    val (y, labeled) = gopherLabelCols
    docs.select(col("doc_id"),
      graft.functions.TextStats.bucketCountsCol(col("text"), 1, B).as("xv"),
      y.as("y"), labeled.as("labeled"))
  }

  /** (doc_id, xv, y, labeled) — the cascade's B+3 features (buckets,
    * total, n_grams, n_dup) and the joint label, all row-local.
    */
  private[llm] def cascadeVec(docs: DataFrame): DataFrame = {
    val (y, labeled) = jointLabelCols
    val r = graft.functions.TextStats.repetitionCol(col("text"))
    docs.select(col("doc_id"),
      concat(graft.functions.TextStats.bucketCountsCol(col("text"), 1, B),
        array(r.getField("n_grams"), r.getField("n_dup"))).as("xv"),
      y.as("y"), labeled.as("labeled"))
  }

  /** The per-round (b, x, pos_at, n_at) histogram over a LABELED vec
    * frame: posexplode of the feature array — a map-only generate — into
    * the (b, x) partial aggregation. Same rows as
    * `featFrame(docs) JOIN label GROUP BY b, x`, minus the two doc-keyed
    * exchanges and the join.
    */
  private def histFromVec(vec: DataFrame): DataFrame =
    vec.select(col("y"), posexplode(col("xv")))
      .groupBy(col("pos").cast(LongType).as("b"), col("col").as("x"))
      .agg(sum(col("y")).as("pos_at"), count(lit(1)).as("n_at"))

  /** One-row best-split frame (b, t, e) over a labeled vec frame — the
    * same cum/argmin arithmetic as [[searchFrame]] on identical histogram
    * rows.
    */
  private[llm] def bestSplitVec(vec: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("b")).orderBy(col("x").desc)
    val cum = histFromVec(vec).select(col("b"), col("x").as("t"),
      sum(col("pos_at")).over(w).as("pos_ge"), sum(col("n_at")).over(w).as("n_ge"))
    val totPos = vec.agg(sum(col("y")).as("p"))
    // explicitly broadcast the 1-row total like bestSplitDualVec does —
    // same BroadcastNestedLoopJoin the plan audit excuses, but stated
    // rather than left to the planner's estimate (round-12 ADVICE)
    cum.crossJoin(broadcast(totPos))
      .select(col("b"), col("t"),
        ((col("n_ge") - col("pos_ge")) + (col("p") - col("pos_ge"))).as("e"))
      .orderBy(col("e"), col("b"), col("t")).limit(1)
  }

  /** Dual-direction best split over a labeled vec frame — the vec twin of
    * [[searchFrameDual]].
    */
  private[llm] def bestSplitDualVec(vec: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("b")).orderBy(col("x").desc)
    val cum = histFromVec(vec).select(col("b"), col("x").as("t"),
      sum(col("pos_at")).over(w).as("pos_ge"), sum(col("n_at")).over(w).as("n_ge"))
    val tot = vec.agg(sum(col("y")).as("p"), count(lit(1)).as("n"))
    cum.crossJoin(broadcast(tot))
      .select(col("b"), col("t"), explode(array(
        struct(((col("n_ge") - col("pos_ge")) +
          (col("p") - col("pos_ge"))).as("e"), lit(1).as("dir")),
        struct((col("pos_ge") + (col("n") - col("n_ge")) -
          (col("p") - col("pos_ge"))).as("e"), lit(0).as("dir")))).as("c"))
      .select(col("b"), col("t"), col("c.dir").as("dir"), col("c.e").as("e"))
      .orderBy(col("e"), col("b"), col("t"), col("dir").desc)
      .limit(1)
  }

  /** The Gopher keep rule as a 0/1 label — quality_gopher's expressions
    * verbatim (same op order both engines).
    */
  private[llm] def gopherLabel(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_words"),
        (sum(length(col("w"))).cast(DoubleType) / count(lit(1))).as("mean_wlen"),
        (sum(when(col("w").rlike("[a-zA-Z]"), 1).otherwise(0)).cast(DoubleType) /
          count(lit(1))).as("alpha_ratio"))
      .select(col("doc_id"),
        when(col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_wlen") >= 3 && col("mean_wlen") <= 10 &&
          col("alpha_ratio") >= 0.8, 1L).otherwise(0L).as("y"))

  /** One-row best-split frame (b, t, e): histogram over every observed
    * (feature, value), per-bucket running sums from high value down, and
    * argmin misclassification with deterministic (e, b, t) ties.
    */
  private[llm] def searchFrame(feat: DataFrame, lab: DataFrame): DataFrame = {
    val hist = feat.join(lab, "doc_id")
      .groupBy(col("b"), col("x"))
      .agg(sum(col("y")).as("pos_at"), count(lit(1)).as("n_at"))
    val w = Window.partitionBy(col("b")).orderBy(col("x").desc)
    val cum = hist.select(col("b"), col("x").as("t"),
      sum(col("pos_at")).over(w).as("pos_ge"), sum(col("n_at")).over(w).as("n_ge"))
    val totPos = lab.agg(sum(col("y")).as("p"))
    cum.crossJoin(totPos)
      .select(col("b"), col("t"),
        ((col("n_ge") - col("pos_ge")) + (col("p") - col("pos_ge"))).as("e"))
      .orderBy(col("e"), col("b"), col("t")).limit(1)
  }

  /** Train the stump on `docs` (typically a sample) — the bounded collect
    * is the one-row model, the "load the index" step of this family.
    */
  def train(docs: DataFrame): StumpModel = {
    val r = bestSplitVec(stumpVec(docs).filter(col("labeled"))).collect()
    require(r.nonEmpty, "empty corpus: no split candidates")
    StumpModel(r.head.getLong(0), r.head.getLong(1), r.head.getLong(2))
  }

  /** Serving path: keep docs whose single model feature clears the
    * threshold. ROW-LOCAL — the per-doc count is a higher-order filter
    * over the in-row token array, so the plan is a pure map: no explode,
    * no shuffle, and the same expression gates a STREAMING frame
    * unchanged (a per-row predicate needs no state or watermark). This is
    * the payoff of distilling to one feature: the expensive rule needed
    * per-doc aggregates; the served filter needs none.
    */
  def filterFrame(docs: DataFrame, m: StumpModel): DataFrame =
    docs.filter(servedFeature(m) >= m.threshold)

  /** The model's single feature as a row-local Column. */
  private[llm] def servedFeature(m: StumpModel): Column = {
    val words = graft.functions.TextStats.wordTokensCol(col("text"), 1)
    val matching =
      if (m.bucket == B.toLong) words
      else filter(words, w => bucketOf(w) === m.bucket)
    size(matching).cast(LongType)
  }

  // ────────────────────── boosted cascade (N-round residual fit) ───────
  // quality_distill_boost: iterate the histogram split search stage-wise
  // (Viola–Jones-style attentional cascade — each round trains on the
  // SURVIVORS of the previous rounds, the AND-semiring residual fit), so
  // a conjunction like Gopher ∧ low-repetition becomes learnable where a
  // single one-direction stump cannot express it. Every stage's search
  // space includes a keep-all stump (dir=ge at the subset's minimum
  // value), so composite training error is NON-INCREASING by
  // construction — the monotonicity StumpDistillSpec pins. All
  // arithmetic is exact integers; ties break on (e, b, t, dir).

  /** Extra row-local features for the cascade, past the stump's B+1:
    * trigram instance count and duplicated-trigram instance count (the
    * one-scan [[graft.functions.TextStats.repetitionCol]] counters) —
    * the cheap signals that see what unigram counts cannot.
    */
  val FGrams: Long = B + 1L
  val FDup: Long = B + 2L

  /** One cascade stage: keep iff `x_bucket >= t` (ge) / `x_bucket < t`
    * (!ge). `err` is the stage's misclassification count WITHIN its
    * training survivors.
    */
  final case class CascadeStage(bucket: Long, threshold: Long, ge: Boolean,
      err: Long)

  /** [[featFrame]] plus the trigram features — B+3 rows per doc. */
  private[llm] def featFrameExt(docs: DataFrame): DataFrame = {
    val rep = docs
      .withColumn("__r", graft.functions.TextStats.repetitionCol(col("text")))
      .select(col("doc_id"), col("__r.n_grams").as("ng"), col("__r.n_dup").as("nd"))
    featFrame(docs)
      .unionAll(rep.select(col("doc_id"), lit(FGrams).as("b"), col("ng").as("x")))
      .unionAll(rep.select(col("doc_id"), lit(FDup).as("b"), col("nd").as("x")))
  }

  /** Gopher ∧ low-repetition joint label: the stump's [[gopherLabel]]
    * AND'd with `50·n_dup <= n_grams` (trigram dup ratio ≤ 0.02; docs
    * with no trigrams pass — exact integers, no division).
    */
  private[llm] def jointLabel(docs: DataFrame): DataFrame = {
    val rep = docs
      .withColumn("__r", graft.functions.TextStats.repetitionCol(col("text")))
      .select(col("doc_id"),
        (col("__r.n_grams") === 0L ||
          col("__r.n_dup") * 50L <= col("__r.n_grams")).as("rep_ok"))
    gopherLabel(docs).join(rep, "doc_id")
      .select(col("doc_id"),
        when(col("y") === 1L && col("rep_ok"), 1L).otherwise(0L).as("y"))
  }

  /** Dual-direction best-split frame (b, t, dir, e): same histogram/cum
    * scan as [[searchFrame]], but each (b, t) emits BOTH the `x >= t`
    * error and the `x < t` error; argmin with (e, b, t, dir-desc) ties
    * (ge preferred). `dir` is 1 for ge, 0 for lt.
    */
  private[llm] def searchFrameDual(feat: DataFrame, lab: DataFrame): DataFrame = {
    val hist = feat.join(lab, "doc_id")
      .groupBy(col("b"), col("x"))
      .agg(sum(col("y")).as("pos_at"), count(lit(1)).as("n_at"))
    val w = Window.partitionBy(col("b")).orderBy(col("x").desc)
    val cum = hist.select(col("b"), col("x").as("t"),
      sum(col("pos_at")).over(w).as("pos_ge"), sum(col("n_at")).over(w).as("n_ge"))
    val tot = lab.agg(sum(col("y")).as("p"), count(lit(1)).as("n"))
    cum.crossJoin(broadcast(tot))
      .select(col("b"), col("t"), explode(array(
        struct(((col("n_ge") - col("pos_ge")) +
          (col("p") - col("pos_ge"))).as("e"), lit(1).as("dir")),
        struct((col("pos_ge") + (col("n") - col("n_ge")) -
          (col("p") - col("pos_ge"))).as("e"), lit(0).as("dir")))).as("c"))
      .select(col("b"), col("t"), col("c.dir").as("dir"), col("c.e").as("e"))
      .orderBy(col("e"), col("b"), col("t"), col("dir").desc)
      .limit(1)
  }

  /** Train the cascade: each round runs the dual split search on the
    * docs every earlier stage kept, then narrows the survivor set. Each
    * round's collect is the one-row model — the same bounded "load the
    * index" contract as [[train]].
    */
  def trainCascade(docs: DataFrame, rounds: Int = 3): Seq[CascadeStage] = {
    // one map-only scan builds every feature and the label; each round is
    // then a single job over the cached doc-count-sized frame — survivors
    // are a ROW-LOCAL predicate chain over the feature array, replacing
    // the per-round doc-keyed keep-set join of the (doc, b, x) shape
    val vec = cascadeVec(docs).filter(col("labeled")).persist()
    try {
      var pred: Column = lit(true)
      (1 to rounds).map { _ =>
        val r = bestSplitDualVec(vec.filter(pred)).collect()
        require(r.nonEmpty, "empty corpus: no split candidates")
        val st = CascadeStage(r.head.getLong(0), r.head.getLong(1),
          r.head.getInt(2) == 1, r.head.getLong(3))
        val x = element_at(col("xv"), st.bucket.toInt + 1)
        pred = pred && (if (st.ge) x >= st.threshold else x < st.threshold)
        st
      }
    } finally { vec.unpersist(); () }
  }

  /** One stage's served feature as a row-local Column. */
  private[llm] def servedFeatureAt(bucket: Long): Column =
    if (bucket == FGrams)
      graft.functions.TextStats.repetitionCol(col("text")).getField("n_grams")
    else if (bucket == FDup)
      graft.functions.TextStats.repetitionCol(col("text")).getField("n_dup")
    else servedFeature(StumpModel(bucket, 0L, 0L))

  /** The cascade's keep predicate — an AND of ≤ `rounds` row-local
    * single-feature thresholds: still a pure map (no explode, no
    * shuffle), still streaming-safe. The payoff of the cascade shape:
    * serving a 3-stage conjunction costs the same plan as serving one
    * stump.
    */
  def cascadeKeepCol(stages: Seq[CascadeStage]): Column =
    stages.map { st =>
      val f = servedFeatureAt(st.bucket)
      if (st.ge) f >= st.threshold else f < st.threshold
    }.reduce(_ && _)

  /** Serving path for the cascade — row-local, like [[filterFrame]]. */
  def filterFrameCascade(docs: DataFrame, stages: Seq[CascadeStage]): DataFrame =
    docs.filter(cascadeKeepCol(stages))
}
