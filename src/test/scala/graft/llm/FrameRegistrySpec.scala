package graft.llm

import graft.{FrameRegistry, SparkTestBase, Tables}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-frame lifecycle registry (VERDICT r9 #5): session memo
  * families register centrally, per-call frames live in bounded transient
  * families with oldest-first eviction, and the whole footprint is
  * reportable — so the memo family can keep growing without growing an
  * unaccounted cache.
  */
class FrameRegistrySpec extends AnyFunSuite with SparkTestBase {

  private def frame(n: Int) = spark.range(n).select(col("id"))

  test("tracked slots are idempotent and release by family") {
    val a = FrameRegistry.tracked(spark, "spec_fam", frame(10), "a")
    assert(a.storageLevel.useMemory)
    // re-registering the slot releases the previous occupant
    val a2 = FrameRegistry.tracked(spark, "spec_fam", frame(20), "a")
    assert(!a.storageLevel.useMemory && a2.storageLevel.useMemory)
    FrameRegistry.tracked(spark, "spec_fam", frame(30), "b")
    assert(FrameRegistry.report(spark).count(_._1 == "spec_fam") == 2)
    assert(FrameRegistry.releaseFamily(spark, "spec_fam") == 2)
    assert(!a2.storageLevel.useMemory)
    assert(FrameRegistry.report(spark).forall(_._1 != "spec_fam"))
  }

  test("transient families stay bounded: oldest evicted past the cap") {
    val frames = (0 until FrameRegistry.TransientCap + 2).map { i =>
      FrameRegistry.transient(spark, "spec_transient", frame(100 + i))
    }
    val live = FrameRegistry.report(spark).count(_._1 == "spec_transient")
    assert(live == FrameRegistry.TransientCap, s"family holds $live frames")
    // the two OLDEST were the ones released — unpersist degrades to
    // recompute, so the early frames still answer correctly
    assert(!frames(0).storageLevel.useMemory)
    assert(!frames(1).storageLevel.useMemory)
    assert(frames.last.storageLevel.useMemory)
    assert(frames(0).count() == 100)
    FrameRegistry.releaseFamily(spark, "spec_transient")
  }

  test("dsir_accept per-call frames land in the bounded transient family") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val tgt = docs.filter(col("doc_id") % 7 === 0)
    for (_ <- 1 to FrameRegistry.TransientCap + 2) {
      val scored = TextRankQueries.dsirScoredFrame(
        TextRankQueries.wordTok(docs), TextRankQueries.wordTok(tgt))
      TextRankQueries.dsirAcceptFrame(scored).count()
    }
    val live = FrameRegistry.report(spark).count(_._1 == "dsir_accept")
    assert(live <= FrameRegistry.TransientCap,
      s"dsir_accept family grew to $live live frames")
    FrameRegistry.releaseFamily(spark, "dsir_accept")
  }

  test("releaseSlot frees one dir's frame and leaves siblings cached") {
    val a = FrameRegistry.tracked(spark, "spec_slot", frame(10), "dirA")
    val b = FrameRegistry.tracked(spark, "spec_slot", frame(20), "dirB")
    assert(FrameRegistry.releaseSlot(spark, "spec_slot", "dirA"))
    assert(!a.storageLevel.useMemory, "released slot still cached")
    assert(b.storageLevel.useMemory, "sibling dir's cache was dropped")
    assert(!FrameRegistry.releaseSlot(spark, "spec_slot", "dirA"),
      "double release reported a live slot")
    FrameRegistry.releaseFamily(spark, "spec_slot")
  }

  test("mixed tracked+transient family: eviction skips tracked slots") {
    // a family that receives BOTH lifecycles must neither crash the
    // eviction tag parse nor lose its memo entries to age eviction
    val memo = FrameRegistry.tracked(spark, "spec_mixed", frame(7), "dirA")
    (0 until FrameRegistry.TransientCap + 2).foreach { i =>
      FrameRegistry.transient(spark, "spec_mixed", frame(50 + i))
    }
    assert(memo.storageLevel.useMemory, "tracked memo slot was evicted")
    val live = FrameRegistry.report(spark).count(_._1 == "spec_mixed")
    assert(live == FrameRegistry.TransientCap + 1,
      s"family holds $live frames (want cap + the tracked slot)")
    FrameRegistry.releaseFamily(spark, "spec_mixed")
  }

  test("report carries a usable size estimate and the total is queryable") {
    FrameRegistry.tracked(spark, "spec_size", frame(100000), "big")
      .count() // materialize the cache
    val sz = FrameRegistry.report(spark).find(_._1 == "spec_size").get._3
    assert(sz > 0L, "cached frame reports zero bytes")
    assert(FrameRegistry.totalPersistedMb(spark) > 0.0)
    FrameRegistry.releaseFamily(spark, "spec_size")
  }
}
