package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

/** Bounds checks for the HLL sketch family. The registry queries now carry
  * a driver-checkable contract (exact counts + estimate-within-envelope
  * booleans the oracle pins `true`), so this spec does two jobs: bound the
  * RAW estimates directly (the registry surface no longer exposes them),
  * and assert the contract booleans actually come out true.
  */
class ApproxDistinctSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact distincts within 4x rsd per group") {
    val q = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"))
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
    // and the registry query's contract booleans agree
    val contract = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf).collect()
    assert(contract.nonEmpty)
    contract.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)}: contract booleans false — sketch outside envelope")
    }
  }

  test("agg_hll_union merged estimate tracks exact and the direct sketch") {
    // merging invalidates the sketch's HIP estimator (the union falls back
    // to the composite estimate), so the merged value is NOT bit-equal to
    // the direct one-level sketch — both must only stay inside the
    // lgK=12 error envelope (~1.6% rse; 5% leaves no flake room) of exact.
    def mergedEst = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")).as("m"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = mergedEst
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
    assert(mergedEst == merged)
    // registry contract: exact counts match, union_ok true everywhere
    val contract = graft.SparkEntry.queries("agg_hll_union")(spark, sf).collect()
    contract.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), s"${r.getString(0)} exact_orders")
      assert(r.getBoolean(3), s"${r.getString(0)}: union_ok false")
    }
  }

  test("approx_count_distinct is deterministic run-to-run (no RNG state)") {
    val a = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf).collect().toSeq
    val b = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("KMV theta estimates land within the K=64 error envelope") {
    // exact: 150 click users, 150 view users, full overlap at this sf
    val r = graft.SparkEntry.queries("agg_kmv_theta")(spark, sf).collect().head
    val (ec, ev, eu, ei) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val exact = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    // KMV rse ≈ 1/sqrt(K−2) ≈ 12.7%; allow 3σ
    val tol = 3.0 / math.sqrt(62)
    Seq("click" -> ec, "view" -> ev, "union" -> eu, "inter" -> ei).foreach {
      case (name, est) =>
        assert(math.abs(est - exact) / exact <= tol,
          s"$name: est=$est exact=$exact off by ${math.abs(est - exact) / exact}")
    }
  }

  test("KMV intersection follows the sketch algebra on disjoint key ranges") {
    import graft.functions.{CrossHash => H}
    import spark.implicits._
    // synthetic: A = 0..999, B = 500..1499 → |A∩B| = 500, |A∪B| = 1500
    val a = (0L until 1000L).toDF("x").select(H.affine(0, col("x")).as("h"))
    val b = (500L until 1500L).toDF("x").select(H.affine(0, col("x")).as("h"))
    def kmv(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("h")).limit(64)
    val ku = kmv(a.union(b).distinct())
    val m = ku.join(kmv(a), "h").join(kmv(b), "h").count()
    val hku = ku.agg(max(col("h"))).collect().head.getLong(0)
    val estU = 63.0 * H.P1 / hku
    val estI = m.toDouble / 64 * estU
    info(s"est_union=$estU est_inter=$estI (true 1500 / 500)")
    assert(math.abs(estU - 1500) / 1500 <= 3.0 / math.sqrt(62))
    // intersection inherits Jaccard binomial noise on top of the union
    // estimate — use a wider 0.5-relative envelope
    assert(math.abs(estI - 500) / 500 <= 0.5, s"est_inter=$estI")
  }
}
