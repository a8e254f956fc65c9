package graft.operators

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the statistics/sequence queries beyond the DuckDB hash gate:
  * the hand-rolled moment formulas must agree with Spark's native
  * estimators (they use different association orders, so agreement is
  * within float tolerance, not bit-exact — the hash gate covers bit
  * exactness of OUR formula, this covers its mathematical correctness),
  * and sessionization must partition events exactly.
  */
class StatQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_corr matches Spark's native corr/covar/regr within 1e-6 relative") {
    val ours = run("agg_corr").collect()
      .map(r => r.getString(0) -> r).toMap
    val native = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("corr"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("covar_pop"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("covar_samp"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("slope"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("intercept"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ours.keySet == native.keySet && ours.nonEmpty)
    for ((k, n) <- native; o = ours(k);
         c <- Seq("corr", "covar_pop", "covar_samp", "slope", "intercept")) {
      val (a, b) = (o.getAs[Double](c), n.getAs[Double](c))
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
        s"$k.$c: ours $a vs native $b")
    }
  }

  test("agg_moments matches Spark's native skewness/kurtosis within 1e-6") {
    val ours = run("agg_moments").collect().map(r => r.getString(0) -> r).toMap
    val native = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("skew"), kurtosis(col("l_quantity")).as("kurt"),
        avg(col("l_quantity")).as("mean_qty"))
      .collect().map(r => r.getString(0) -> r).toMap
    for ((k, n) <- native; o = ours(k); c <- Seq("skew", "kurt", "mean_qty")) {
      val (a, b) = (o.getAs[Double](c), n.getAs[Double](c))
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
        s"$k.$c: ours $a vs native $b")
    }
  }

  test("sessionize partitions every event into exactly one session, gaps respected") {
    val sessions = run("sessionize").collect()
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == nEvents)
    // within a user, sessions are disjoint in time, ordered, and separated
    // by > 30 min (end of one to start of the next)
    sessions.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("sess"))
      sorted.foreach(s =>
        assert(!s.getAs[java.sql.Timestamp]("session_end")
          .before(s.getAs[java.sql.Timestamp]("session_start"))))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapUs = (b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime) * 1000L
          assert(gapUs > 30L * 60 * 1000 * 1000,
            s"sessions ${a.getAs[Long]("sess")}/${b.getAs[Long]("sess")} gap $gapUs us")
        case _ =>
      }
    }
  }

  test("events_transitions counts sum to n_events - n_users_with_events") {
    val total = run("events_transitions").agg(sum("n")).collect()(0).getLong(0)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expected)
  }

  test("ts_interpolate: observed hours keep their value; gaps lie between brackets") {
    val rows = run("ts_interpolate").collect()
    assert(rows.length == 3 * 30 * 24)
    // every interpolated value is within [min, max] of the user's observed
    // values — linear interpolation never extrapolates outside the hull
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val vs = rs.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
      if (vs.nonEmpty) {
        val (lo, hi) = (vs.min, vs.max)
        vs.foreach(v => assert(v >= lo - 1e-9 && v <= hi + 1e-9))
      }
    }
  }
}
