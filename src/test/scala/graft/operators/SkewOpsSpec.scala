package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Salting must change the partitioning, never the result. */
class SkewOpsSpec extends AnyFunSuite with SparkTestBase {

  private def skewed = {
    import spark.implicits._
    // 10k rows of one hot key + a uniform tail
    ((1 to 10000).map(i => (1L, i.toDouble)) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, i.toDouble)))
      .toDF("k", "v")
  }

  private def dim = {
    import spark.implicits._
    (1L to 60L).map(k => (k, s"name_$k")).toDF("dk", "name")
  }

  test("salted join equals plain join") {
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = SkewOps.saltedJoin(skewed, dim, "k", "dk", 8)
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
      .orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join spreads a hot key over multiple partitions") {
    val joined = SkewOps.saltedJoin(skewed, dim, "k", "dk", 8)
    val hotPartitions = joined.filter(col("k") === 1L)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(hotPartitions > 1,
      s"hot key stayed on $hotPartitions partition(s) — salt had no effect")
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum"))
      .orderBy("k").collect()
    val salted = SkewOps.saltedCountSum(skewed, "k", "v", 8)
      .orderBy("k").collect()
    assert(salted.toSeq == direct.toSeq)
  }
}
