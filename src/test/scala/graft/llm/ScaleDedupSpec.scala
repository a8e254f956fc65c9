package graft.llm

import graft.{SparkEntry, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components: O(log n) convergence on the
  * graph shape that defeats label propagation (a long path), agreement with
  * a driver union-find on random graphs, and agreement with the registered
  * clustering queries on the real near-dup graph.
  */
class ScaleDedupSpec extends AnyFunSuite with SparkTestBase {

  private def cc(edges: Seq[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    ScaleDedup.connectedComponents(edges.toDF("a", "b"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("high-diameter path collapses in O(log n) rounds, not O(diameter)") {
    // path 0-1-…-128: label propagation needs 128 rounds; star contraction
    // must finish within 15 double-rounds or the labels come out wrong
    val path = (0L until 128L).map(i => (i, i + 1))
    val got = cc(path, maxRounds = 15)
    assert(got.keySet == (0L to 128L).toSet)
    assert(got.values.forall(_ == 0L))
  }

  test("random graphs agree with a driver union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      parent(x) = r; r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min-root canonical labels (union-find roots are min by construction
    // of the merge rule above)
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    assert(cc(edges) == expected)
  }

  test("star contraction agrees with the registered clustering queries") {
    val sf = "/root/testdata/sf0.001"
    val viaLabelProp = SparkEntry.queries("dedup_cluster_dist")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    import org.apache.spark.sql.functions.col
    val pairs = LlmQueries.jaccardPairs(graft.Tables.documents(spark, sf), 0.5)
      .select(col("a_id"), col("b_id"))
    val viaStars = ScaleDedup.connectedComponents(pairs)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaStars == viaLabelProp.sortBy(_._1))
    assert(viaStars.nonEmpty)
  }
}
