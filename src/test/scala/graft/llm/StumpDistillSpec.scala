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
}
