package graft

import org.scalatest.funsuite.AnyFunSuite

/** The everyday enforcer for [[Plans]]' `"sf0.01"` section: every
  * registered query's physical-plan fingerprint (join strategies,
  * exchange count, codegen spans, pushed filters, scale warns) is diffed
  * against the committed PLANS.json — a broadcast→SMJ demotion, a lost
  * pushdown, or a new exchange fails THIS test instead of waiting for a
  * bench read (VERDICT r9 #6).
  *
  * Rebaseline after a DELIBERATE plan change with:
  * {{{ SPARK_GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanFingerprintSpec" }}}
  * which rewrites only this section (PlanAudit's main owns the bench-scale
  * sections). Fingerprints are computed on the SECOND invocation per query
  * so memoized intermediates plan as their steady-state cached reads.
  */
class PlanFingerprintSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"

  test("physical-plan fingerprints match PLANS.json [sf0.01]") {
    val fps = SparkEntry.all.map { q =>
      q.fn(spark, sfDir) // first call fills session memos
      q.name -> PlanAudit.fingerprint(q.fn(spark, sfDir)).render
    }.toMap
    if (sys.env.get("SPARK_GRAFT_REGEN_PLANS").contains("1")) {
      Plans.saveSection("sf0.01", fps)
      info(s"rebaselined sf0.01 section of ${Plans.DefaultPath}")
    } else {
      val drifts = Plans.diff("sf0.01", fps)
      assert(drifts.isEmpty,
        "plan drift vs PLANS.json (rebaseline with SPARK_GRAFT_REGEN_PLANS=1 " +
          "after verifying the change is deliberate):\n" +
          drifts.map { case (q, got, want) =>
            s"  $q\n    now: $got\n    was: $want"
          }.mkString("\n"))
    }
  }

  test("sf1 section is armed and covers every registered query") {
    // AQE join-strategy flips (broadcast→SMJ demotions) happen at scale
    // boundaries sf0.01 can't see (VERDICT r10 #5). The sf1 fingerprints
    // are OWNED by PlanAudit's main over testdata-sf1 (recomputing them
    // here would re-run every memo build at sf1 on each `sbt test`);
    // this case pins the cheap invariant that catches the silent failure
    // mode — a query added or renamed without its sf1 plan recorded, or
    // a stale entry surviving a rename. Drift within an armed section is
    // PlanAudit's job: `runMain graft.PlanAudit testdata-sf1` prints it,
    // SPARK_GRAFT_REGEN_PLANS=1 rebaselines after a deliberate change.
    val sf1 = Plans.load().getOrElse("testdata-sf1", Map.empty)
    assert(sf1.nonEmpty, "testdata-sf1 section of PLANS.json not armed")
    val registered = SparkEntry.all.map(_.name).toSet
    val missing = registered -- sf1.keySet
    val stale = sf1.keySet -- registered
    assert(missing.isEmpty, s"queries with no sf1 fingerprint: ${missing.toSeq.sorted}")
    assert(stale.isEmpty, s"sf1 fingerprints for unregistered queries: ${stale.toSeq.sorted}")
  }

  test("diff flags planted regressions: demotion, new query, stale entry") {
    val committed = Plans.load().getOrElse("sf0.01", Map.empty)
    assume(committed.nonEmpty, "sf0.01 section not armed")
    val some = committed.keys.head
    // a demoted join / extra exchange must surface as drift
    val doctored = committed + (some -> "exch=99 wsc=0 joins=SortMergeJoin push=[] warns=")
    assert(Plans.diff("sf0.01", doctored).exists(_._1 == some))
    // an unrecorded new query must surface
    assert(Plans.diff("sf0.01", committed + ("brand_new_query" -> "exch=0"))
      .exists(_._1 == "brand_new_query"))
    // a committed entry whose query vanished must surface
    assert(Plans.diff("sf0.01", committed - some).exists(_._1 == some))
    // and the identity map must not
    assert(Plans.diff("sf0.01", committed).isEmpty)
  }
}
