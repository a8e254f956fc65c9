package graft.sources.shardpack

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** v3 stats envelopes: per-shard key Bloom filters. The scenario range
  * stats cannot help: a HASH-distributed layout where every shard's
  * [minKey, maxKey] spans the whole key space, so a point lookup is a
  * candidate everywhere — the Bloom must prune all non-holders, and a
  * v2/v1/foreign envelope must keep exactly its old behavior.
  */
class BloomEnvelopeSpec extends AnyFunSuite with SparkTestBase {

  private def writeHashLayout(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("bloom-env").toString
    import spark.implicits._
    // repartition by key hash: every partition (→ shard) holds keys from
    // across the whole range — envelopes all overlap
    (0 until n).map(i => f"key$i%05d").toDF("key")
      .select($"key", lit(null).cast("binary").as("metadata"),
        array(struct(lit("f").as("file_name"), lit("text/plain").as("content_type"),
          lit("").as("encoding"), $"key".cast("binary").as("data"))).as("entries"))
      .repartition(4, $"key")
      .write.format("shardpack").mode("append").save(dir)
    dir
  }

  private def lookupMetrics(dir: String, key: String): (Long, Long) = {
    val df = spark.read.format("shardpack").load(dir)
      .filter(col("key") === key).select("key")
    val found = df.collect().length
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head
    (found.toLong, scan.metrics("shardsPruned").value)
  }

  test("bloom round-trips through the envelope with range and user meta") {
    val keys = (0 until 1000).map(i => s"k$i")
    val bloom = ShardpackFormat.KeyBloom.build(keys.map(ShardpackFormat.KeyBloom.hash2))
    val user = """{"a":1}""".getBytes("UTF-8")
    val env = ShardpackFormat.ShardStats.wrapWithBloom("k0", "k999", bloom, user)
    val (range, meta) = ShardpackFormat.ShardStats.unwrap(env)
    assert(range.contains(("k0", "k999")))
    assert(new String(meta, "UTF-8") == """{"a":1}""")
    val b = ShardpackFormat.ShardStats.unwrapBloom(env).get
    assert(keys.forall(b.mightContain), "a member tested negative")
    val fp = (0 until 10000).count(i => b.mightContain(s"absent$i"))
    info(s"false-positive rate: $fp / 10000")
    assert(fp < 300, s"fp rate too high: $fp/10000")
    // v2 and foreign envelopes carry no bloom
    assert(ShardpackFormat.ShardStats.unwrapBloom(
      ShardpackFormat.ShardStats.wrap("a", "b", user)).isEmpty)
    assert(ShardpackFormat.ShardStats.unwrapBloom(user).isEmpty)
  }

  test("point lookup on a hash layout prunes every non-holding shard") {
    val dir = writeHashLayout(2000)
    val shards = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".shardpack"))
    assert(shards >= 4, s"expected >= 4 shards, got $shards")
    // absent key: every shard's range covers it; only the Bloom can (and
    // must) prune all of them
    val (n0, pruned0) = lookupMetrics(dir, "key99999")
    assert(n0 == 0)
    assert(pruned0 == shards, s"absent-key lookup pruned $pruned0 of $shards")
    // present key: found, and at most the holder (plus rare false
    // positives) escapes pruning
    val (n1, pruned1) = lookupMetrics(dir, "key01234")
    assert(n1 == 1)
    assert(pruned1 >= shards - 2, s"present-key lookup pruned $pruned1 of $shards")
  }

  test("mayContain honors the bloom on overlapping ranges") {
    val keys = (0 until 100).map(i => s"k$i")
    val bloom = ShardpackFormat.KeyBloom.build(keys.map(ShardpackFormat.KeyBloom.hash2))
    val env = ShardpackFormat.ShardStats.wrapWithBloom("a", "zzz", bloom, null)
    assert(ShardpackFormat.ShardStats.mayContain(env, Set("k5")))
    // inside the range but not in the shard: bloom says definitely-not
    assert(!ShardpackFormat.ShardStats.mayContain(env, Set("k5-absent")))
    // v2 fallback: range-only behavior unchanged
    val v2 = ShardpackFormat.ShardStats.wrap("a", "zzz", null)
    assert(ShardpackFormat.ShardStats.mayContain(v2, Set("k5-absent")))
  }
}
