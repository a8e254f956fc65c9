package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The cell-partitioned IVF layout must deliver what it claims: the
  * probed search reads ONLY the probed cells' files (directory-level
  * partition pruning — the "probe prunes files, not rows" contract), and
  * the physically different path returns exactly the in-memory
  * sim_ann_ivf result (both run against the shared oracle, but the
  * row-for-row equality here localizes a divergence to the layout path
  * without waiting for the driver gate).
  */
class CellLayoutSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def query(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("partitioned search reads only the probed cells' files") {
    val df = query("sim_ann_ivf_partitioned")
    val rows = df.collect() // execute so the scan's metrics are populated
    // inputFiles lists the RELATION's files (pre-pruning); the executed
    // scan's own metrics are the proof of what was actually read
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the executed plan"))
    val partitionsRead = scan.metrics("numPartitions").value
    val filesRead = scan.metrics("numFiles").value
    // nprobe = 2 and the layout writes one file per cell: exactly two
    // cell directories / files may be touched
    assert(partitionsRead == 2,
      s"probe must touch exactly 2 cell partitions, touched $partitionsRead")
    assert(filesRead == 2,
      s"probe must read exactly 2 files (one per probed cell), read $filesRead")
    // and the probed rows' cells are within the probed set
    assert(rows.map(_.getLong(2)).toSet.size <= 2,
      s"result spans more cells than probed: ${rows.map(_.getLong(2)).toSet}")
  }

  test("partition pruning is in the plan, not an after-scan filter") {
    val plan = query("sim_ann_ivf_partitioned")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell predicate must be a partition filter:\n$plan")
  }

  test("layout path and in-memory path return identical rows") {
    val mem = query("sim_ann_ivf").collect().toSeq
    val part = query("sim_ann_ivf_partitioned").collect().toSeq
    assert(mem == part,
      s"physical paths diverged:\n  mem=$mem\n  part=$part")
  }
}
