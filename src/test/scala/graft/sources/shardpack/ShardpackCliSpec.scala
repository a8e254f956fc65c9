package graft.sources.shardpack

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The argv surface of the spec's `shardpack` tool
  * (`/root/reference/docs/draft.md:136-148`): flag parsing is strict, and
  * `create` round-trips files → shards → read-back including the
  * shard-level `--metadata` pairs and the `--record-size-limit` filter.
  */
class ShardpackCliSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("parseSize accepts bare bytes and binary units, rejects junk") {
    assert(ShardpackCli.parseSize("123") == 123L)
    assert(ShardpackCli.parseSize("4KB") == 4096L)
    assert(ShardpackCli.parseSize("2MB") == 2L << 20)
    assert(ShardpackCli.parseSize("1gb") == 1L << 30)
    intercept[IllegalArgumentException](ShardpackCli.parseSize("1.5GB"))
    intercept[IllegalArgumentException](ShardpackCli.parseSize("GB"))
    intercept[IllegalArgumentException](ShardpackCli.parseSize("10TB"))
  }

  test("strict flag parsing: unknown flag, missing value, duplicate, bad metadata") {
    intercept[IllegalArgumentException](
      ShardpackCli.run(spark, Seq("create", "--input", "x", "--output", "y",
        "--record-size-limt", "1GB"))) // the typo the scaladoc warns about
    intercept[IllegalArgumentException](
      ShardpackCli.run(spark, Seq("create", "--input")))
    intercept[IllegalArgumentException](
      ShardpackCli.run(spark, Seq("create", "--input", "a", "--input", "b",
        "--output", "y")))
    intercept[IllegalArgumentException](
      ShardpackCli.run(spark, Seq("create", "--input", "x", "--output", "y",
        "--metadata", "noequals")))
    intercept[IllegalArgumentException](
      ShardpackCli.run(spark, Seq("create", "--input", "x", "--output", "y",
        "--compression", "brotli")))
    intercept[IllegalArgumentException](ShardpackCli.run(spark, Seq("frobnicate")))
    intercept[IllegalArgumentException](ShardpackCli.run(spark, Seq.empty))
    // a flag must not swallow the NEXT flag as its value: the error names
    // the flag whose value is missing, not a downstream required flag
    val e = intercept[IllegalArgumentException](
      ShardpackCli.run(spark, Seq("create", "--input", "--output", "y")))
    assert(e.getMessage.contains("missing value for --input"), e.getMessage)
  }

  test("create packs a directory, honors --record-size-limit, stamps --metadata") {
    val in = tmp("cli-in")
    Files.write(java.nio.file.Paths.get(in, "a.txt"), "hello".getBytes)
    Files.write(java.nio.file.Paths.get(in, "b.json"), "{\"k\":1}".getBytes)
    Files.write(java.nio.file.Paths.get(in, "big.bin"), new Array[Byte](5000))
    val out = tmp("cli-out")
    ShardpackCli.run(spark, Seq("create", "--input", in, "--output", out,
      "--record-size-limit", "4KB", "--compression", "lz4",
      "--metadata", "creator=MyName", "--metadata", "training=true"))

    val back = spark.read.format("shardpack").load(out)
    import org.apache.spark.sql.functions._
    val keys = back.select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(keys == Seq("a.txt", "b.json"), // big.bin over the 4KB limit
      s"unexpected keys: $keys")
    val entries = back.filter(col("key") === "b.json")
      .selectExpr("entries[0].content_type", "entries[0].data").head()
    assert(entries.getString(0) == "application/json")
    assert(new String(entries.getAs[Array[Byte]](1)) == "{\"k\":1}")

    // shard-level user metadata: footer envelope carries the sorted-JSON
    // pairs; read back via the same unwrap path shardpack_metadata uses
    val shard = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".shardpack")).head
    val raf = new java.io.RandomAccessFile(shard, "r")
    val footer = try ShardpackFormat.readFooter(raf.length(), (off, len) => {
      val buf = new Array[Byte](len); raf.seek(off); raf.readFully(buf); buf
    }) finally raf.close()
    val user = new String(ShardpackFormat.ShardStats.unwrap(footer.shardMetadata)._2)
    assert(user == """{"creator":"MyName","training":"true"}""", user)
  }

  test("delete verb removes keys through the CLI") {
    val in = tmp("cli-in2")
    Files.write(java.nio.file.Paths.get(in, "x.txt"), "x".getBytes)
    Files.write(java.nio.file.Paths.get(in, "y.txt"), "y".getBytes)
    val out = tmp("cli-out2")
    ShardpackCli.run(spark, Seq("create", "--input", in, "--output", out))
    ShardpackCli.run(spark, Seq("delete", "--dir", out, "--keys", "x.txt"))
    val keys = spark.read.format("shardpack").load(out)
      .select("key").collect().map(_.getString(0)).toSeq
    assert(keys == Seq("y.txt"))
  }

  test("zorder rewrites a bucket Morton-clustered on two SQL dims") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmp("cli-z-in"); val out = tmp("cli-z-out")
    // keys kXXX_YYY carry the two dims; metadata unused
    val rows = for (x <- 0 until 20; y <- 0 until 20)
      yield f"k$x%03d_$y%03d"
    rows.toDF("key")
      .select($"key", lit(null).cast("binary").as("metadata"),
        array(struct(lit("f").as("file_name"), lit("text/plain").as("content_type"),
          lit("").as("encoding"), $"key".cast("binary").as("data"))).as("entries"))
      .repartition(4)
      .write.format("shardpack").mode("append").save(dir)
    ShardpackCli.run(spark, Seq("zorder", "--dir", dir, "--output", out,
      "--x", "CAST(substring(key, 2, 3) AS INT)",
      "--y", "CAST(substring(key, 6, 3) AS INT)"))
    val back = spark.read.format("shardpack").load(out)
      .select("key").collect().map(_.getString(0))
    assert(back.length == rows.length)
    // every key = 8-hex morton prefix + "_" + original key, and the morton
    // prefix decodes back to the dims the expression extracted
    back.foreach { k =>
      assert(k.matches("[0-9a-f]{8}_k\\d{3}_\\d{3}"), k)
      val code = java.lang.Long.parseLong(k.substring(0, 8), 16)
      val orig = k.substring(9)
      assert(ZOrder.mortonX(code) == orig.substring(1, 4).toLong, k)
      assert(ZOrder.mortonY(code) == orig.substring(5, 8).toLong, k)
    }
    // missing required dims stay loud
    intercept[IllegalArgumentException](
      ShardpackCli.run(spark, Seq("zorder", "--dir", dir, "--output", out)))
  }
}
