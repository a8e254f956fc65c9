package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

/** Bounds check for the one rows-only query: HLL++ sketches are
  * engine-specific (hence no DuckDB hash oracle), but the estimate must
  * track the exact distinct count within the sketch's relative standard
  * deviation (Spark default rsd = 0.05; 4σ bound leaves no flake room).
  */
class ApproxDistinctSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact distincts within 4x rsd per group") {
    val q = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(q.keySet == exact.keySet)
    for ((flag, (ep, eo)) <- exact) {
      val (ap, ao) = q(flag)
      val tol = 4 * 0.05
      assert(math.abs(ap - ep).toDouble / ep <= tol,
        s"$flag parts: approx=$ap exact=$ep off by ${math.abs(ap - ep).toDouble / ep}")
      assert(math.abs(ao - eo).toDouble / eo <= tol,
        s"$flag orders: approx=$ao exact=$eo off by ${math.abs(ao - eo).toDouble / eo}")
    }
  }

  test("agg_hll_union merged estimate tracks exact and the direct sketch") {
    val merged = graft.SparkEntry.queries("agg_hll_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // merging invalidates the sketch's HIP estimator (the union falls back
    // to the composite estimate), so the merged value is NOT bit-equal to
    // the direct one-level sketch — both must only stay inside the
    // lgK=12 error envelope (~1.6% rse; 5% leaves no flake room) of exact.
    val direct = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    for ((flag, eo) <- exact) {
      assert(math.abs(merged(flag) - eo).toDouble / eo <= 0.05,
        s"$flag: merged=${merged(flag)} exact=$eo")
      assert(math.abs(merged(flag) - direct(flag)).toDouble / eo <= 0.05,
        s"$flag: merged=${merged(flag)} direct=${direct(flag)}")
    }
    // determinism: same input → same merged estimate, run-to-run
    val again = graft.SparkEntry.queries("agg_hll_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == merged)
  }

  test("approx_count_distinct is deterministic run-to-run (no RNG state)") {
    val a = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf).collect().toSeq
    val b = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
