package graft.sources.shardpack

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The z-order layout must deliver what it claims on REAL scans: the box
  * query's range reads prune shards through the footer key envelopes (the
  * `shardsPruned` custom metric — the same evidence surface as the
  * point-lookup pruning test in ShardpackDataSourceSpec), and the pruned
  * physical path returns exactly the rows a plain filter over the source
  * table produces.
  */
class ZOrderLayoutSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("box query result is identical to the plain-filter result") {
    import org.apache.spark.sql.functions._
    val boxed = graft.sources.ShardpackQueries
      .zorderBoxFrame(spark, dir, 40, 80, 100, 300)
      .groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = 1704067200000000L
    val direct = graft.Tables.events(spark, dir)
      .select(col("user_id"),
        floor((unix_micros(col("ts")) - lit(base)) / lit(3.6e9))
          .cast("long").as("hr"))
      .filter(col("user_id").between(40, 80) && col("hr").between(100, 300))
      .groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(boxed == direct,
      s"layout path diverged: only-boxed=${(boxed -- direct).take(5)} " +
        s"only-direct=${(direct -- boxed).take(5)}")
    assert(direct.nonEmpty, "fixture box must select rows")
  }

  test("the box's range reads prune most shards at PLANNING time") {
    val df = graft.sources.ShardpackQueries
      .zorderBoxFrame(spark, dir, 40, 80, 100, 300)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected shardpack BatchScanExec leaves")
    // with the sidecar index the non-intersecting shards are never even
    // SCHEDULED — the planned-task count is the pruning evidence (per-task
    // footer pruning via shardsPruned only mops up index-less stragglers);
    // this is the cost model that matters: a box query's task count must
    // scale with the box, not with the table
    val planned = scans.map(_.inputRDD.getNumPartitions).sum
    val perScanShards = new java.io.File(
      s"/tmp/graft-shardpack/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/events_z")
      .listFiles().count(_.getName.endsWith(".shardpack"))
    val naive = scans.length * perScanShards
    info(s"${scans.length} range scans x $perScanShards shards: " +
      s"planned $planned tasks (naive $naive)")
    assert(perScanShards >= 8,
      s"fixture must roll enough shards to measure pruning ($perScanShards)")
    // the box covers ~7% of the (user, hour) space; planning must schedule
    // well under half of the naive shard visits
    assert(planned * 2 < naive,
      s"planning-time pruning too weak: $planned of $naive")
  }
}
