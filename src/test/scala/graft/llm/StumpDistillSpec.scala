package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** quality_distill_stump trains an exact greedy split (the GBDT base
  * learner) against the Gopher keep label. On the driver corpus the label's
  * only binding clause is `n_words >= 50` (every doc passes the word-length
  * and alpha-ratio bands), so a correct split search must recover that rule
  * EXACTLY: the total-count feature (bucket B = 16), threshold 50, zero
  * training error, and per-doc agreement everywhere. A near-miss (err > 0,
  * or a hashed bucket chosen over the total) would mean the histogram
  * cumulative or the deterministic tie-break is wrong.
  */
class StumpDistillSpec extends AnyFunSuite with SparkTestBase {

  test("stump recovers the Gopher n_words>=50 clause with zero error") {
    val out = TextRankQueries.queries
      .find(_.name == "quality_distill_stump")
      .getOrElse(fail("quality_distill_stump not registered"))
      .fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val (b, t, err) = (out.head.getLong(1), out.head.getLong(2), out.head.getLong(3))
    info(s"learned stump: bucket=$b threshold=$t train_err=$err over ${out.length} docs")
    assert(b == 16L, s"expected the total-count feature (16), got $b")
    assert(t == 50L, s"expected threshold 50, got $t")
    assert(err == 0L)
    assert(out.forall(_.getBoolean(7)), "a doc disagrees with the stump")
  }

  test("served filter is row-local: no exchange, and agrees with training features") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = QualityDistill.train(docs)
    val served = QualityDistill.filterFrame(docs, m)
    // the one-feature serving path must not shuffle: scan → filter only
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serving path shuffles:\n$plan")
    // and must keep exactly the docs the TRAINING feature frame keeps
    val fromFeat = QualityDistill.featFrame(docs)
      .filter(col("b") === m.bucket && col("x") >= m.threshold)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = served.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == fromFeat,
      s"row-local feature drifted: only-served=${(kept -- fromFeat).take(5)} " +
        s"only-feat=${(fromFeat -- kept).take(5)}")
  }

  test("served filter admits the identical doc set on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = QualityDistill.train(docs)
    val batchKept = QualityDistill.filterFrame(docs, m)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // a row-local predicate needs no state or watermark — the property
    // that lets the distilled gate run at ingest
    val in = MemoryStream[(Long, String)]
    val gated = QualityDistill.filterFrame(
      in.toDF().toDF("doc_id", "text"), m)
    val q = gated.writeStream.format("memory").queryName("stump_out")
      .outputMode("append").start()
    try {
      val rows = docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      in.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val streamKept = spark.table("stump_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept)
    } finally q.stop()
  }

  test("boosted cascade strictly beats the single stump on the joint label") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val lab = QualityDistill.jointLabel(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1) == 1L)).toMap
    // single stump (trained on the Gopher-only label, as the registered
    // stump query does) scored against the JOINT label
    val m = QualityDistill.train(docs)
    val stumpKept = QualityDistill.filterFrame(docs, m)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val stumpErr = lab.count { case (id, y) => stumpKept.contains(id) != y }
    val stages = QualityDistill.trainCascade(docs, rounds = 3)
    val boostKept = QualityDistill.filterFrameCascade(docs, stages)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val boostErr = lab.count { case (id, y) => boostKept.contains(id) != y }
    info(s"joint-label err: stump=$stumpErr cascade=$boostErr " +
      s"(stages: ${stages.map(s => (s.bucket, s.threshold, s.ge)).mkString(", ")})")
    assert(boostErr < stumpErr,
      s"cascade ($boostErr) does not improve on the stump ($stumpErr)")
    // per-stage training error is monotonically non-increasing (keep-all
    // is always in the search space)
    val errs = stages.map(_.err)
    assert(errs == errs.sorted.reverse, s"stage errors not monotone: $errs")
  }

  test("cascade serving path is row-local: no exchange") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val stages = QualityDistill.trainCascade(docs, rounds = 3)
    val served = QualityDistill.filterFrameCascade(docs, stages)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cascade serving shuffles:\n$plan")
  }

  test("bucket_counts one-scan kernel equals the training feature frame") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val B = QualityDistill.B
    val fromKernel = docs
      .select(col("doc_id"),
        graft.functions.TextStats.bucketCountsCol(col("text"), 1, B).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val fromFeat = QualityDistill.featFrame(docs)
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        val m = rows.map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
        id -> (0 to B).map(m).toVector
      }
    assert(fromKernel == fromFeat,
      "one-scan bucket counts drifted from the explode/groupBy features")
  }

  test("pocket perceptron learns: beats both trivial baselines, pocket is the argmin") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val m = QualityLinear.train(docs)
    val lab = QualityDistill.jointLabel(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1) == 1L)).toMap
    val n = lab.size.toLong
    val nPos = lab.count(_._2).toLong
    info(s"errs=${m.errs} pocket=(${m.pocketErr}, round ${m.pocketRound}) " +
      s"baselines: all-neg=$nPos all-pos=${n - nPos}")
    // round 1 scores everything 0 under w_0 = 0 → predicts all-negative
    assert(m.errs.head == nPos, "w0 must be the all-negative predictor")
    assert(m.pocketErr == m.errs.min, "pocket is not the trajectory argmin")
    assert(m.pocketRound == m.errs.indexOf(m.errs.min) + 1, "pocket tie-break")
    assert(m.pocketErr < math.min(nPos, n - nPos),
      s"model (${m.pocketErr}) does not beat the trivial baselines")
    // the cascade expresses axis thresholds exactly, so it should stay
    // ahead — report both so the artifact records the gap
    val stages = QualityDistill.trainCascade(docs, rounds = 3)
    val boostKept = QualityDistill.filterFrameCascade(docs, stages)
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val boostErr = lab.count { case (id, y) => boostKept.contains(id) != y }
    info(s"joint-label err: linear=${m.pocketErr} cascade=$boostErr of $n")
    // determinism: retraining replays the identical trajectory and weights
    val m2 = QualityLinear.train(docs)
    assert(m2.errs == m.errs && m2.w.toSeq == m.w.toSeq,
      "training is not deterministic across runs")
  }

  test("linear serving is row-local (no exchange) and equals the feature-frame score") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val m = QualityLinear.train(docs)
    val served = QualityLinear.filterFrame(docs, m)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"linear serving shuffles:\n$plan")
    // row-local score == the training-representation score: rebuild the
    // standardized features the way train() does and dot them with w
    val feat = QualityLinear.featLin(docs).collect()
    val scores = feat.groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> rows.map { r =>
        val b = r.getLong(1).toInt
        val xs =
          if (b == QualityLinear.FBias.toInt) QualityLinear.Scale
          else (r.getLong(2) - m.mu(b)) * QualityLinear.Scale / m.rng(b)
        m.w(b) * xs
      }.sum
    }
    val servedKept = served.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val featKept = scores.filter(_._2 > 0L).keySet
    assert(servedKept == featKept,
      s"row-local score drifted: only-served=${(servedKept -- featKept).take(5)} " +
        s"only-feat=${(featKept -- servedKept).take(5)}")
  }

  test("sample-trained linear model serves like the full-trained one (100 TB shape)") {
    import org.apache.spark.sql.functions._
    // the deployment contract QualityLinear's module doc promises: train
    // the pocket perceptron on a deterministic 20% sample, serve the
    // whole corpus — keep/drop decisions must agree with full-corpus
    // training on the overwhelming majority of docs
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val sample = docs.filter(
      graft.functions.CrossHash.affine(2, col("doc_id")) % 100 < 20)
    val nSample = sample.count()
    val n = docs.count()
    assert(nSample > 0 && nSample < n)
    val mFull = QualityLinear.train(docs)
    val mSamp = QualityLinear.train(sample)
    val kFull = QualityLinear.filterFrame(docs, mFull)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val kSamp = QualityLinear.filterFrame(docs, mSamp)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val agree = all.count(id => kFull.contains(id) == kSamp.contains(id))
    val pct = agree.toDouble / all.size
    info(f"sample-trained agreement: $agree of ${all.size} (${pct * 100}%.1f%%)")
    assert(pct >= 0.90,
      f"sample-trained model diverged from full-trained: ${pct * 100}%.1f%% agreement")
    // and the pipeline stage wires the same sampled-training shape
    val piped = CurationPipeline(docs).filterLinear(sample)
    assert(piped.lineage.exists(_.startsWith("filterLinear(")))
    val pipedKept = piped.result.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(pipedKept == kSamp, "pipeline stage drifted from filterFrame")
  }
}
