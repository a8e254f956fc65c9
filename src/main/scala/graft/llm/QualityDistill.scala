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
    val r = searchFrame(featFrame(docs), gopherLabel(docs)).collect()
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
}
