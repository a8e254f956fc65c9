package graft.operators

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-3 analytics operators that the DuckDB hash-match
  * can't express: sketch one-sidedness, sampling quotas, bloom-vs-exact
  * equivalence, fill semantics, and the distributed-vs-driver clustering
  * equality.
  */
class AnalyticsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("count-min estimates never underestimate (one-sided error)") {
    val rows = run("agg_count_min").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("est")
      assert(est >= exact, s"suppkey ${r.get(0)}: est $est < exact $exact")
    }
  }

  test("stratified sample takes exactly ceil(n/5) per stratum, deterministically") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val expected = cust.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> (r.getLong(1) + 4) / 5).toMap
    val got = run("sample_stratified").groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // seeded hash ⇒ identical membership across runs
    val a = run("sample_stratified").collect().map(_.getLong(0)).toSeq
    val b = run("sample_stratified").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("bloom-filtered join returns exactly the unfiltered join result") {
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 480000),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    val bloomed = run("join_bloom").collect()
    assert(bloomed.toSeq == plain.toSeq)
  }

  test("histogram buckets partition the table and bound their extrema") {
    val rows = run("agg_histogram").collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("cnt")).sum == total)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = r.getAs[Double]("lo")
      val hi = r.getAs[Double]("hi")
      assert(lo <= hi)
      // bucket = cents div 5e6 ⇒ [b*50000, (b+1)*50000) dollars
      assert(lo >= b * 50000.0 - 0.01 && hi < (b + 1) * 50000.0)
    }
  }

  test("ts_resample emits a dense grid with forward-filled values") {
    val rows = run("ts_resample").collect()
    assert(rows.length == 3 * 720) // 3 users × 30 days × 24 h
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      var seen = false
      rs.sortBy(_.getAs[java.sql.Timestamp]("hr").getTime).foreach { r =>
        val n = r.getAs[Long]("n")
        if (n > 0) seen = true
        val filled = !r.isNullAt(r.fieldIndex("v_fill"))
        // null only before the first observed hour; non-null ever after
        assert(filled == seen, s"fill/seen mismatch at $r")
      }
    }
  }

  test("funnel conversions never exceed views") {
    run("events_funnel").collect().foreach { r =>
      assert(r.getAs[Long]("n_conv") <= r.getAs[Long]("n_views"))
    }
  }

  test("distributed label propagation equals the driver union-find clustering") {
    val a = run("dedup_cluster").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = run("dedup_cluster_dist").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("decontaminate_spans finds every doc sharing a 5-token span with the benchmark set") {
    // brute-force reference: materialize raw 5-token spans as STRINGS (not
    // hashes) and intersect — catches both hash-formula drift and misses
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect()
    val spans = docs.map { case (id, ws) =>
      id -> ws.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSeq
    }
    val bench = spans.filter(_._1 < 10).flatMap(_._2).toSet
    val expected = spans.filter(_._1 >= 10)
      .map { case (id, ss) => id -> ss.count(bench.contains) }
      .filter(_._2 > 0).toMap
    val got = run("decontaminate_spans").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_hits")).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, n) => assert(n == expected(id), s"doc $id") }
  }
}
