package graft.llm

import graft.{SparkEntry, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

/** Pins dsir_resample's Bernoulli acceptance rule to a driver-side replay
  * of its own contract: accept doc i iff
  * `hash(doc_id) * Z * 10 < wgrid_i * n * P`, with wgrid the 1e-6-grid
  * importance weight exp(logratio) derived from dsir_score's output. The
  * spec recomputes the accepted set in plain Scala from the REGISTERED
  * dsir_score frame and requires the per-source (n_kept, weight_kept)
  * rollup to match exactly — so the query can't drift from the scoring
  * query it claims to resample against, and the 128-bit boundary
  * arithmetic is checked against BigInt (no precision cap in the model).
  */
class DsirResampleSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val byName = SparkEntry.all.map(q => q.name -> q).toMap

  test("acceptance set replays exactly from dsir_score's weights") {
    val scores = byName("dsir_score").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sources = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val P = BigInt(1000000007L)
    val wgrid = scores.map { case (id, lr) =>
      id -> BigInt(math.round(math.exp(lr) * 1000000L))
    }
    val z = wgrid.values.sum
    val n = BigInt(wgrid.size)
    val accepted = wgrid.filter { case (id, w) =>
      (BigInt(id) * 2654435761L % P) * z * 10 < w * n * P
    }

    val expected = accepted.toSeq
      .groupBy { case (id, _) => sources(id) }
      .map { case (src, docs) =>
        src -> ((docs.size.toLong, docs.map(_._2).sum))
      }

    val got = byName("dsir_resample").fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), BigInt(r.getLong(4))))).toMap
    assert(got === expected)
  }

  test("selectDsir pipeline stage keeps exactly the query's draw (A/B pin)") {
    // same corpus, same target (src0), same num/den as dsir_resample →
    // the pipeline gate must keep exactly the docs the query accepts;
    // replay the acceptance from dsir_score's weights as the referee
    val docs = graft.Tables.documents(spark, sf)
    val kept = CurationPipeline(docs)
      .selectDsir(docs.filter(org.apache.spark.sql.functions.col("source") === "src0"))
      .result.select("doc_id").collect().map(_.getLong(0)).toSet

    val scores = byName("dsir_score").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val P = BigInt(1000000007L)
    val wgrid = scores.map { case (id, lr) =>
      id -> BigInt(math.round(math.exp(lr) * 1000000L))
    }
    val z = wgrid.values.sum
    val n = BigInt(wgrid.size)
    val expected = wgrid.filter { case (id, w) =>
      (BigInt(id) * 2654435761L % P) * z * 10 < w * n * P
    }.keySet
    assert(kept === expected)
  }

  test("the kept mixture tilts toward the target stratum") {
    val rows = byName("dsir_resample").fn(spark, sf).collect()
    val rates = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    // src0 IS the target distribution: its keep rate must sit at the top
    // of the composition (ties allowed at this corpus size — 500 docs);
    // its total kept WEIGHT must be strictly the largest, since weight is
    // what the draw is proportional to.
    assert(rates("src0") === rates.values.max)
    val weights = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(weights("src0") === weights.values.max)
    assert(weights.count { case (_, w) => w == weights("src0") } === 1)
    // E[kept] = n/10 up to p-clipping: the realized draw stays in a wide
    // deterministic band around the 10% budget.
    val kept = rows.map(_.getLong(2)).sum
    val total = rows.map(_.getLong(1)).sum
    assert(kept * 20 >= total && kept * 5 <= total,
      s"kept $kept of $total outside [5%, 20%]")
  }
}
