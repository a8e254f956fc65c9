package graft.llm

import org.apache.spark.sql.SparkSession

/** Test fixture (FIXTURES.md family B): an `embeddings.parquet` with PLANTED
  * cluster structure — `nClusters` unit-norm Gaussian seed directions, each
  * emitting `perCluster` members (seed + `sigma`·Gaussian perturbation,
  * re-normalized). Cluster assignment is interleaved (`vec_id % nClusters`)
  * so the registry's cold-start IVF centroids (vec_id < 16) land in 16
  * DIFFERENT clusters, and the fixed query vector (vec_id = 1) has
  * `perCluster − 1` true near neighbors. `sigma` is per-dimension, so the
  * perpendicular perturbation norm is ≈ σ·√dim and intra-cluster cosine
  * ≈ 1/(1+σ²·dim) ≫ inter-cluster ≈ 0 ± 1/√dim: at the default σ=0.05,
  * dim=64 that is ≈ 0.86 vs ≈ 0 — tight enough that the 6-plane LSH
  * Hamming-2 ball captures the cluster (pairwise angle ≈ √2·arctan(σ√dim)
  * ≈ 31°, per-plane split probability ≈ 31/180 ≈ 0.17, P(Hamming ≤ 2 of 6)
  * ≈ 0.93), yet diffuse enough that the recall-vs-radius curve is a real
  * curve rather than a constant 1.
  *
  * The driver's synthetic embeddings are isotropic — on them ANY bucketing
  * scheme's recall ≈ cells probed / cells total (the sim_ann_recall
  * diagnosis), so they cannot distinguish a working ANN index from a broken
  * one. This fixture is the positive control: recall must approach 1 at
  * modest probe counts, and a bucketing bug shows up as recall ≈ coverage.
  */
object PlantedEmbeddings {

  def write(spark: SparkSession, dir: String, nClusters: Int = 50,
      perCluster: Int = 20, dim: Int = 64, sigma: Double = 0.05,
      seed: Long = 7L): Unit = {
    val rnd = new scala.util.Random(seed)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val seeds = Array.fill(nClusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val n = nClusters * perCluster
    val rows = (0 until n).map { id =>
      val c = id % nClusters
      val emb = unit(seeds(c).map(x => x + sigma * rnd.nextGaussian()))
      (id.toLong, emb.map(_.toFloat), c)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
