package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `quality_classifier`: a TRAINED linear quality model — the
  * fastText-direction workhorse of real curation pipelines, distilling the
  * same Gopher ∧ low-repetition joint label as [[QualityDistill]]'s boosted
  * cascade into one weight vector over hashed bag-of-words features. Where
  * the cascade family covers tree-shaped models (stump → boosted AND), this
  * covers the other production shape: a single dot-product gate.
  *
  * Training is a POCKET BATCH PERCEPTRON in exact integer arithmetic, so
  * both engines replay it bit-for-bit (the `quality_distill_*` discipline):
  *
  *  1. features standardize onto an integer grid — per feature,
  *     `xs = tdiv((x − mu)·1000, rng)` with `mu = tdiv(Σx, n)` and
  *     `rng = max(1, max − min)` (bias pins at 1000) — so every
  *     standardized value sits in [−1000, 1000] and count-scale features
  *     cannot drown indicator-scale ones;
  *  2. each round scores every doc against the current weights (one
  *     doc-keyed aggregate), takes the MEAN standardized feature vector of
  *     the misclassified docs with sign 2y−1 (one feature-keyed aggregate,
  *     `tdiv(Σ±xs, n_mis)` — the deterministic batch analog of averaged
  *     SGD), and adds it to the weights;
  *  3. the POCKET keeps the weights with the lowest observed training
  *     error across all rounds, ties to the earliest round — batch
  *     perceptron oscillates on non-separable data, and the pocket rule
  *     (Gallant 1990) is the classical deterministic fix.
  *
  * `tdiv` is TRUNCATING division (Scala `Long./` ≡ DuckDB `//` — both
  * round toward zero; floor-vs-truncate on negative numerators is exactly
  * the class of silent cross-engine drift this family must not have).
  *
  * Scale shape: training runs 2 bounded-output aggregates per round over a
  * persisted (doc, feature) frame — every shuffle is doc-count- or
  * D-sized, the driver holds only the D=20 weight vector (the "load the
  * index" contract), and a 100 TB deployment trains on a sample anyway.
  * SERVING is the hot path and is one codegen scan: [[scoreCol]] computes
  * all B+1 hashed-count features in a single allocation-free pass
  * ([[graft.functions.TextStats.bucketCounts]]), the repetition features
  * ride the existing one-scan kernel, and the weights are plan literals —
  * no explode, no shuffle, streaming-safe like the cascade's AND.
  */
object QualityLinear {

  /** Update rounds; errors are evaluated before each update and once after
    * the last, so the pocket sees `Rounds + 1` candidate weight vectors
    * (w_0 .. w_Rounds).
    */
  val Rounds = 5

  /** Standardization grid: features map into [−Scale, Scale]. */
  val Scale = 1000L

  /** Feature count: B hashed buckets, total count, n_grams, n_dup, bias. */
  val D: Int = QualityDistill.B + 4

  /** Bias feature index — standardizes to the constant [[Scale]]. */
  val FBias: Long = QualityDistill.B + 3L

  /** The trained model: standardization (mu, rng), pocket weights, the
    * pocket's training error / round, and the full error trajectory
    * (err(t) = misclassifications of w_{t-1}; the spec pins pocket
    * optimality and determinism against it).
    */
  final case class LinearModel(mu: Array[Long], rng: Array[Long],
      w: Array[Long], pocketErr: Long, pocketRound: Int, errs: Seq[Long])

  private def tdiv(a: Long, b: Long): Long = a / b

  /** Truncating division as a Column — `(a − a % b) / b` with Java `%`
    * (sign of dividend) makes the numerator exactly divisible, and the
    * double division is exact because every |a| this module produces is
    * ≤ corpus_docs·Scale ≪ 2^53.
    */
  private def tdivCol(a: Column, b: Column): Column =
    ((a - a % b) / b).cast(LongType)

  /** Training feature rows: [[QualityDistill.featFrameExt]]'s B+3 features
    * plus the bias row — exactly one (doc, b) row per doc and feature.
    */
  private[llm] def featLin(docs: DataFrame): DataFrame =
    QualityDistill.featFrameExt(docs)
      .unionAll(docs.select(col("doc_id"), lit(FBias).as("b"), lit(1L).as("x")))

  /** Integer standardization stats over the feature frame: a D-row
    * bounded collect (model-sized, like the stump's 1-row split).
    */
  private[llm] def standardize(feat: DataFrame, nDocs: Long): (Array[Long], Array[Long]) = {
    val rows = feat.groupBy(col("b"))
      .agg(sum(col("x")).as("s"), max(col("x")).as("mx"), min(col("x")).as("mn"))
      .collect()
    val mu = new Array[Long](D)
    val rng = Array.fill(D)(1L)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      mu(b) = tdiv(r.getLong(1), nDocs)
      rng(b) = math.max(1L, r.getLong(2) - r.getLong(3))
    }
    (mu, rng)
  }

  private def litAt(a: Array[Long]): Column =
    element_at(array(a.toSeq.map(lit): _*), (col("b") + 1L).cast(IntegerType))

  /** Standardized feature column over a (doc_id, b, x) frame. */
  private def xsCol(mu: Array[Long], rng: Array[Long]): Column =
    when(col("b") === FBias, lit(Scale))
      .otherwise(tdivCol((col("x") - litAt(mu)) * Scale, litAt(rng)))

  /** Train the pocket perceptron. Bounded driver state: D-row stat and
    * gradient collects plus the weight vector — nothing corpus-sized.
    */
  def train(docs: DataFrame, rounds: Int = Rounds): LinearModel = {
    val spark = docs.sparkSession
    val nDocs = docs.count()
    require(nDocs > 0, "empty corpus: nothing to train on")
    val lab = graft.FrameRegistry.transient(spark, "qlin_lab",
      QualityDistill.jointLabel(docs))
    val raw = graft.FrameRegistry.transient(spark, "qlin_feat", featLin(docs))
    try trainOn(spark, lab, raw, nDocs, rounds)
    finally {
      // the ((B+4)·nDocs)-row feature frame and the label frame are pure
      // training intermediates — the model memoizes per (session, dir),
      // so nothing ever re-reads these caches; release the slots instead
      // of pinning them until transient-cap eviction (trainCascade's
      // finally discipline)
      graft.FrameRegistry.releaseFamily(spark, "qlin_feat")
      graft.FrameRegistry.releaseFamily(spark, "qlin_lab")
    }
  }

  private def trainOn(spark: org.apache.spark.sql.SparkSession,
      lab: DataFrame, raw: DataFrame, nDocs: Long, rounds: Int): LinearModel = {
    val (mu, rng) = standardize(raw, nDocs)
    // a projection over the cached raw frame — no second persist needed
    val feats = raw.select(col("doc_id"), col("b"), xsCol(mu, rng).as("xs"))
    var w = new Array[Long](D)
    var pocketErr = Long.MaxValue
    var pocketRound = 0
    var pocketW = w.clone()
    val errs = scala.collection.mutable.ArrayBuffer[Long]()
    for (t <- 1 to rounds + 1) {
      val scored = feats.groupBy(col("doc_id"))
        .agg(sum(col("xs") * litAt(w)).as("score"))
      val mis = scored.join(lab, "doc_id")
        .filter((col("score") > 0L) =!= (col("y") === 1L))
      // D rows: per-feature signed gradient sum + the misclassified count
      // (every doc carries exactly one row per feature, so any cnt is n_mis)
      val grad = feats.join(mis.select(col("doc_id"), col("y")), "doc_id")
        .groupBy(col("b"))
        .agg(sum((col("y") * 2L - 1L) * col("xs")).as("g"), count(lit(1)).as("cnt"))
        .collect()
      val nMis = if (grad.isEmpty) 0L else grad.head.getLong(2)
      errs += nMis
      if (nMis < pocketErr) { pocketErr = nMis; pocketRound = t; pocketW = w.clone() }
      if (t <= rounds && nMis > 0L) {
        val w2 = w.clone()
        grad.foreach { r => w2(r.getLong(0).toInt) += tdiv(r.getLong(1), nMis) }
        w = w2
      }
    }
    LinearModel(mu, rng, pocketW, pocketErr, pocketRound, errs.toSeq)
  }

  /** Row-local score Σ_b w_b·xs_b — ONE codegen scan: the B+1 hashed
    * counts come from a single [[graft.functions.TextStats.bucketCounts]]
    * pass (Catalyst subexpression elimination shares the array across the
    * B+1 terms), the repetition features from the shared one-scan kernel,
    * and mu/rng/w are plan literals. No explode, no shuffle — the same
    * serving contract as [[QualityDistill.cascadeKeepCol]].
    */
  def scoreCol(m: LinearModel): Column = {
    val B = QualityDistill.B
    val cnts = graft.functions.TextStats.bucketCountsCol(col("text"), 1, B)
    val rep = graft.functions.TextStats.repetitionCol(col("text"))
    def term(b: Int, x: Column): Column =
      lit(m.w(b)) * tdivCol((x - m.mu(b)) * Scale, lit(m.rng(b)))
    val bucketTerms = (0 to B).map(b => term(b, element_at(cnts, b + 1)))
    val repTerms = Seq(
      term(B + 1, rep.getField("n_grams")),
      term(B + 2, rep.getField("n_dup")))
    val bias = lit(m.w(FBias.toInt) * Scale)
    (bucketTerms ++ repTerms :+ bias).reduce(_ + _)
  }

  /** Serving filter: keep docs the trained hyperplane scores positive. */
  def filterFrame(docs: DataFrame, m: LinearModel): DataFrame =
    docs.filter(scoreCol(m) > 0L)
}
