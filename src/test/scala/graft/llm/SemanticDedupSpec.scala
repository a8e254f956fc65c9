package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantic dedup (SemDeDup) on the planted-cluster fixture
  * ([[PlantedEmbeddings]]): 50 planted clusters of 20 near-identical
  * members (intra cosine ≈ 0.86 ≫ the 0.4 threshold, inter ≈ 0), so the
  * operator must collapse most of each cluster onto its lowest member —
  * the positive control the isotropic driver fixture cannot provide
  * (there, near-dup pairs are rare and the dup set is tiny).
  *
  * What a correct SemDeDup guarantees here:
  *  - dups point at a SEMANTIC twin: dup_of shares the planted label
  *    (a cross-label dup_of would mean the cells mix unrelated docs);
  *  - most redundancy is removed: with 20-member clusters, the keep set
  *    shrinks toward one representative per cluster per k-means cell.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("planted-semdedup").toString
    PlantedEmbeddings.write(spark, d)
    d
  }

  test("planted clusters collapse to their lowest member, within-label") {
    import spark.implicits._
    val out = LlmQueries.queries.find(_.name == "dedup_semantic")
      .getOrElse(fail("dedup_semantic not registered")).fn(spark, dir)
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"label")
    val joined = out.join(labels, "vec_id")
      .join(labels.select($"vec_id".as("dup_of"), $"label".as("dup_label")),
        Seq("dup_of"), "left")
      .select($"vec_id", $"is_dup", $"dup_of", $"label", $"dup_label")
      .collect()
    val n = joined.length
    val dups = joined.filter(_.getBoolean(1))
    info(s"planted fixture: $n rows, ${dups.length} marked dup")
    assert(n == 1000)
    // duplicates overwhelmingly point at a same-label representative.
    // Not ALL: 50 random unit seeds in 64 dims produce ~1 seed pair with
    // cosine ≥ 0.4 by chance (inter-seed cosine is ≈ N(0, 1/√64), so 0.4
    // is 3.2σ × 1225 pairs) — members of such a pair legitimately dedup
    // across labels. On this fixed seed that is 21 of 930 dup rows.
    val crossLabel = dups.count(r => r.getInt(3) != r.getInt(4))
    assert(crossLabel <= dups.length / 20,
      s"$crossLabel of ${dups.length} dups cross planted labels")
    // most of the 19-per-cluster redundancy is removed (clusters that
    // straddle a k-means cell boundary keep one representative per cell)
    assert(dups.length >= 800, s"only ${dups.length} of ~950 dups found")
    // representatives precede their duplicates (greedy-by-id determinism)
    assert(dups.forall(r => r.getLong(2) < r.getLong(0)))
  }

  /** The SemDeDup scale contract: the within-cell stage is all-pairs per
    * cell, so with K DERIVED from the corpus at a fixed target mean cell
    * population (K = ceil(n/c̄)) the total pair volume must stay LINEAR
    * in n — Σ_cell C(c,2) ≤ 2·n·c̄. A fixed-K scheme is quadratic
    * (Σ ≈ n²/2K) and breaks this bound as n grows: at n=4000, c̄=50,
    * fixed K=16 gives ≈ 498k pairs vs the 400k bound, while derived
    * K=80 lands ≈ 100k. Both the absolute bound and the growth ratio
    * (≤ 6× for 4× data; quadratic would be 16×) are pinned.
    */
  test("within-cell pair volume stays linear as the corpus grows (derived K)") {
    import org.apache.spark.sql.functions.{col, count, lit}
    import graft.functions.VectorFns
    val targetPop = 50L
    val volumes = Seq(1000, 4000).map { n =>
      val d = Files.createTempDirectory(s"semdedup-scale-$n").toString
      PlantedEmbeddings.write(spark, d, nClusters = n / 20, perCluster = 20)
      val eq = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("v"))
        .withColumn("n2", VectorFns.qnorm2(col("v")))
      assert(LlmQueries.deriveCellCount(n, targetPop) ==
        math.max(16, ((n + targetPop - 1) / targetPop).toInt))
      val out = LlmQueries.semanticDedupFrame(eq, 0.4, None, targetPop)
      val cells = out.groupBy(col("cell")).agg(count(lit(1)).as("c")).collect()
      val pairs = cells.map { r => val c = r.getLong(1); c * (c - 1) / 2 }.sum
      info(s"n=$n: ${cells.length} cells used, pair volume $pairs")
      (n.toLong, pairs)
    }
    volumes.foreach { case (n, p) =>
      assert(p <= 2L * n * targetPop,
        s"n=$n: within-cell pair volume $p exceeds the linear bound ${2L * n * targetPop}")
    }
    val Seq((_, p1), (_, p4)) = volumes
    assert(p4 <= 6 * p1,
      s"pair volume grew ${p4.toDouble / p1}× for 4× data — super-linear")
  }
}
