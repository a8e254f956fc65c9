package graft.sources.shardpack

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Tests for the bucket-level operations: directory packing (spec CLI),
  * keyed delete via rewrite, columnar aligned join, and read-time overlay.
  */
class ShardpackOpsSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String = Files.createTempDirectory("spops").toString

  private def writeDocs(dir: String, rows: (String, String)*): Unit = {
    import spark.implicits._
    rows.toSeq.toDF("key", "body")
      .select($"key", lit(null).cast("binary").as("metadata"),
        array(struct(lit("body.txt").as("file_name"), lit("text/plain").as("content_type"),
          lit("").as("encoding"), encode($"body", "UTF-8").as("data"))).as("entries"))
      .write.format("shardpack").mode("append").save(dir)
  }

  test("pack: directory of raw files becomes one record per file") {
    val in = tmp()
    Files.write(Paths.get(in, "a.txt"), "alpha".getBytes)
    Files.write(Paths.get(in, "b.json"), """{"x":1}""".getBytes)
    Files.write(Paths.get(in, "c.bin"), Array[Byte](1, 2, 3))
    val out = tmp() + "/packed"
    ShardpackOps.pack(spark, in, out, compression = "gzip")
    val back = spark.read.format("shardpack").load(out)
      .select(col("key"),
        col("entries").getItem(0).getField("content_type").as("ct"),
        col("entries").getItem(0).getField("data").as("data"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq("a.txt", "b.json", "c.bin"))
    assert(back.map(_._2).toSeq == Seq("text/plain", "application/json", "application/octet-stream"))
    assert(new String(back(0)._3) == "alpha")
    assert(back(2)._3.toSeq == Seq[Byte](1, 2, 3))
  }

  test("deleteKeys removes exactly the named keys, preserving co-located records") {
    val dir = tmp() + "/docs"
    // single shard file → all keys co-located (the reference's delete would
    // have destroyed every record in the shard; bucket.rs:174-179)
    import spark.implicits._
    Seq(("k1", "one"), ("k2", "two"), ("k3", "three"), ("k4", "four"))
      .toDF("key", "body")
      .coalesce(1)
      .select($"key", lit(null).cast("binary").as("metadata"),
        array(struct(lit("body.txt").as("file_name"), lit("text/plain").as("content_type"),
          lit("").as("encoding"), encode($"body", "UTF-8").as("data"))).as("entries"))
      .write.format("shardpack").mode("append").save(dir)
    ShardpackOps.deleteKeys(spark, dir, Seq("k2", "k4"))
    val left = spark.read.format("shardpack").load(dir)
      .select("key").collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("k1", "k3"))
  }

  test("deleteKeys rewrites only shards whose key range intersects the delete set") {
    val dir = tmp() + "/pruned"
    // two shards with disjoint key ranges (separate writes → separate files)
    writeDocs(dir, ("a1", "one"), ("a2", "two"))
    writeDocs(dir, ("z1", "three"), ("z2", "four"))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(HadoopConfs.session())
    val before = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    val zShardsBefore = before.keySet.filter { name =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, name))
      val in = fs.open(st.getPath)
      val f = try ShardpackFormat.readFooter(st.getLen, (pos, len) => {
        val b = new Array[Byte](len); in.readFully(pos, b); b
      }) finally in.close()
      ShardpackFormat.ShardStats.unwrap(f.shardMetadata)._1.exists(_._1.startsWith("z"))
    }
    ShardpackOps.deleteKeys(spark, dir, Seq("a2"))
    val after = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    // the z-range shard file is untouched (same name, same mtime)
    zShardsBefore.foreach { name =>
      assert(after.contains(name), s"unaffected shard $name was rewritten")
      assert(after(name) == before(name), s"unaffected shard $name was modified")
    }
    val left = spark.read.format("shardpack").load(dir)
      .select("key").collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("a1", "z1", "z2"))
  }

  test("compact merges small shards, preserves records, leaves full shards alone") {
    val dir = tmp() + "/docs"
    // 6 separate appends → ≥6 small shard files (streaming-epoch shape)
    (1 to 6).foreach(i => writeDocs(dir, (s"k$i", s"body-$i"), (s"k$i-b", s"extra-$i")))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(HadoopConfs.session())
    val before = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
    assert(before.length >= 6)
    val expect = spark.read.format("shardpack").load(dir)
      .select(col("key"), col("entries").getItem(0).getField("data").as("d"))
      .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1)))).sorted
    val compacted = ShardpackOps.compact(spark, dir, minFill = 0.5)
    assert(compacted == before.length)
    val after = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
    assert(after.length < before.length)
    val back = spark.read.format("shardpack").load(dir)
      .select(col("key"), col("entries").getItem(0).getField("data").as("d"))
      .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1)))).sorted
    assert(back.toSeq == expect.toSeq)
    // an already-full shard (above minFill·cap) must not be touched: compact
    // again with a tiny cap so every existing shard counts as "full"
    val untouched = after.map(_.getPath.getName).toSet
    assert(ShardpackOps.compact(spark, dir, minFill = 0.5, shardCap = 16) == 0)
    val names2 = ShardpackDataSource
      .listShards(fs, new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName).toSet
    assert(names2 == untouched)
  }

  test("a scan planned against generation N completes on N while compact publishes N+1") {
    val dir = tmp() + "/docs"
    (1 to 5).foreach(i => writeDocs(dir, (f"k$i%02d", s"body-$i")))
    val expected = (1 to 5).map(i => f"k$i%02d")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(HadoopConfs.session())
    val genN = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
    assert(genN.length >= 5)

    // capture the stale plan: force input-partition planning (the shard
    // listing is resolved HERE, against generation N)
    val staleRdd = spark.read.format("shardpack").load(dir)
      .select("key").queryExecution.toRdd
    assert(staleRdd.partitions.nonEmpty)

    // generation swap with a grace period: N is tombstoned, not deleted
    assert(ShardpackOps.compact(spark, dir, graceMs = 600000L) == genN.length)

    // a FRESH plan sees exactly generation N+1 — never a mix with the
    // tombstoned shards still physically present next to it
    val freshShards = ShardpackDataSource
      .listShards(fs, new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(freshShards.length < genN.length)
    assert(freshShards.toSet.intersect(genN.toSet).isEmpty)
    val freshKeys = spark.read.format("shardpack").load(dir)
      .select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(freshKeys == expected, s"fresh read mixed generations: $freshKeys")

    // the STALE plan still completes and returns exactly generation N's
    // rows: its planned files are intact for the length of the grace
    val staleKeys = staleRdd.map(_.copy()).collect()
      .map(_.getUTF8String(0).toString).sorted.toSeq
    assert(staleKeys == expected, s"stale plan diverged: $staleKeys")

    // raw dir listing shows both generations coexisting under the manifest
    val physical = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.endsWith(ShardpackDataSource.FileSuffix))
    assert(physical.toSet == genN.toSet ++ freshShards.toSet)
  }

  test("vacuum reclaims tombstoned shards only after their grace deadline") {
    val dir = tmp() + "/docs"
    (1 to 4).foreach(i => writeDocs(dir, (s"k$i", s"body-$i")))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(HadoopConfs.session())
    val d = new org.apache.hadoop.fs.Path(dir)
    val genN = ShardpackDataSource.listShards(fs, d).map(_.getPath.getName).toSet
    assert(ShardpackOps.compact(spark, dir, graceMs = 600000L) == genN.size)

    // deadline far in the future: vacuum must not touch the retired bytes
    assert(ShardpackOps.vacuum(dir, olderThanMs = 0L) == 0)
    val phys1 = fs.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(ShardpackDataSource.FileSuffix)).toSet
    assert(genN.subsetOf(phys1), "vacuum deleted shards inside their grace window")

    // force-expire the deadlines, then vacuum reclaims exactly those files
    // and drops the manifest
    val ts = ShardpackDataSource.readTombstones(fs, d)
    assert(ts.keySet == genN)
    ShardpackDataSource.writeTombstones(fs, d, ts.map { case (k, _) => k -> 0L })
    assert(ShardpackOps.vacuum(dir, olderThanMs = 0L) == genN.size)
    val phys2 = fs.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(ShardpackDataSource.FileSuffix)).toSet
    assert(phys2.intersect(genN).isEmpty, "expired tombstoned shards survived vacuum")
    assert(ShardpackDataSource.readTombstones(fs, d).isEmpty)
    // rows unaffected throughout
    assert(spark.read.format("shardpack").load(dir).count() == 4)
  }

  test("alignedJoin merges per-column shardpacks into one entry list") {
    val leftDir = tmp() + "/left"
    val rightDir = tmp() + "/right"
    writeDocs(leftDir, ("k1", "left-1"), ("k2", "left-2"))
    writeDocs(rightDir, ("k1", "right-1"), ("k2", "right-2"))
    val joined = ShardpackOps.alignedJoin(Seq(
      spark.read.format("shardpack").load(leftDir),
      spark.read.format("shardpack").load(rightDir)))
    val rows = joined.select(col("key"), size(col("entries")).as("n"),
        col("entries").getItem(1).getField("data").cast("string").as("second"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(("k1", 2, "right-1"), ("k2", 2, "right-2")))
  }

  test("merge upserts: updates replace matched keys, new keys append, unhit shards untouched") {
    val dir = tmp() + "/merged"
    // two shards with disjoint key ranges (separate writes → separate files)
    writeDocs(dir, ("a1", "one"), ("a2", "two"))
    writeDocs(dir, ("z1", "three"), ("z2", "four"))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(HadoopConfs.session())
    val before = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    val zShardsBefore = before.keySet.filter { name =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, name))
      val in = fs.open(st.getPath)
      val f = try ShardpackFormat.readFooter(st.getLen, (pos, len) => {
        val b = new Array[Byte](len); in.readFully(pos, b); b
      }) finally in.close()
      ShardpackFormat.ShardStats.unwrap(f.shardMetadata)._1.exists(_._1.startsWith("z"))
    }
    import spark.implicits._
    def updateDf(rows: (String, String)*) = rows.toSeq.toDF("key", "body")
      .select($"key", lit(null).cast("binary").as("metadata"),
        array(struct(lit("body.txt").as("file_name"), lit("text/plain").as("content_type"),
          lit("").as("encoding"), encode($"body", "UTF-8").as("data"))).as("entries"))
    // a2 updated (hits the a-shard), m1 brand new (hits nothing)
    ShardpackOps.merge(spark, dir, updateDf(("a2", "two-v2"), ("m1", "new")))
    val back = spark.read.format("shardpack").load(dir)
      .select(col("key"), col("entries").getItem(0).getField("data").cast("string").as("body"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(back.toSeq == Seq(("a1", "one"), ("a2", "two-v2"), ("m1", "new"),
      ("z1", "three"), ("z2", "four")))
    // the z-range shard was never rewritten (same name, same mtime)
    val after = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    zShardsBefore.foreach { name =>
      assert(after.contains(name), s"unhit shard $name was rewritten")
      assert(after(name) == before(name), s"unhit shard $name was modified")
    }
    // insert-only merge (no envelope hit) appends without touching anything
    val namesBefore = after.keySet
    ShardpackOps.merge(spark, dir, updateDf(("m2", "new-2")))
    val names2 = ShardpackDataSource
      .listShards(fs, new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName).toSet
    assert(namesBefore.subsetOf(names2))
    assert(spark.read.format("shardpack").load(dir).count() == 6)
    // duplicate update keys are rejected loudly, bucket unchanged
    val ex = intercept[IllegalArgumentException] {
      ShardpackOps.merge(spark, dir, updateDf(("d1", "x"), ("d1", "y")))
    }
    assert(ex.getMessage.contains("key-unique"))
    assert(spark.read.format("shardpack").load(dir).count() == 6)
  }

  test("deleteRange expires exactly the half-open key range, pruning unhit shards") {
    val dir = tmp() + "/ranged"
    writeDocs(dir, ("a1", "one"), ("a2", "two"), ("a3", "three"))
    writeDocs(dir, ("z1", "four"), ("z2", "five"))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(HadoopConfs.session())
    val before = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    val zShards = before.keySet.filter { name =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, name))
      val in = fs.open(st.getPath)
      val f = try ShardpackFormat.readFooter(st.getLen, (pos, len) => {
        val b = new Array[Byte](len); in.readFully(pos, b); b
      }) finally in.close()
      ShardpackFormat.ShardStats.unwrap(f.shardMetadata)._1.exists(_._1.startsWith("z"))
    }
    ShardpackOps.deleteRange(spark, dir, "a2", "a4") // half-open: a2, a3 out; a1 stays
    val left = spark.read.format("shardpack").load(dir)
      .select("key").collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("a1", "z1", "z2"))
    val after = ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    zShards.foreach { name =>
      assert(after.contains(name) && after(name) == before(name),
        s"out-of-range shard $name was rewritten")
    }
    // a no-hit range touches nothing
    val names = after.keySet
    ShardpackOps.deleteRange(spark, dir, "m0", "m9")
    assert(ShardpackDataSource.listShards(fs, new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet == names)
  }

  test("merge equals the keep∖updates ∪ updates model on random key sets (scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val keyGen = Gen.chooseNum(0, 30).map(i => f"k$i%02d")
    val gen = for {
      baseKeys <- Gen.containerOf[Set, String](keyGen)
      updKeys <- Gen.containerOf[Set, String](keyGen)
    } yield (baseKeys, updKeys)
    def df(rows: Seq[(String, String)]) = rows.toDF("key", "body")
      .select($"key", lit(null).cast("binary").as("metadata"),
        array(struct(lit("b.txt").as("file_name"), lit("text/plain").as("content_type"),
          lit("").as("encoding"), encode($"body", "UTF-8").as("data"))).as("entries"))
    (0 until 8).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (bk, uk) =>
        val dir = tmp() + s"/m$i"
        if (bk.nonEmpty)
          df(bk.toSeq.sorted.map(k => k -> s"base-$k")).coalesce(2)
            .write.format("shardpack").mode("append").save(dir)
        ShardpackOps.merge(spark, dir, df(uk.toSeq.sorted.map(k => k -> s"upd-$k")))
        val expect = ((bk -- uk).map(k => k -> s"base-$k") ++
          uk.map(k => k -> s"upd-$k")).toSeq.sorted
        val back = spark.read.format("shardpack").load(dir)
          .select(col("key"), col("entries").getItem(0).getField("data").cast("string"))
          .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
        assert(back == expect, s"seed=$i base=$bk upd=$uk")
      }
    }
  }

  test("overlay: updated records win per key, others pass through") {
    val baseDir = tmp() + "/base"
    val overDir = tmp() + "/over"
    writeDocs(baseDir, ("k1", "v1"), ("k2", "v2"), ("k3", "v3"))
    writeDocs(overDir, ("k2", "v2-updated"))
    val merged = ShardpackOps.overlay(
      spark.read.format("shardpack").load(baseDir),
      spark.read.format("shardpack").load(overDir))
    val rows = merged
      .select(col("key"), col("entries").getItem(0).getField("data").cast("string").as("body"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("k1", "v1"), ("k2", "v2-updated"), ("k3", "v3")))
  }
}
