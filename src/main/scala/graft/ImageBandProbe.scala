package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-bucket density probe for `dedup_image` — the measurement behind
  * the hot-bucket dispatch (VERDICT r11 #2): the band self-join evaluates
  * `bit_count(xor) <= 3` over every pair of DISTINCT hashes sharing a
  * 16-bit band value, so its CPU is Σ_buckets k² — quadratic wherever a
  * (band, value) bucket grows with the corpus. This probe records, per
  * scale dir:
  *
  *  - docs, distinct hashes;
  *  - flat 4×16-bit banding: bucket count, max/p99 bucket size, Σk²
  *    (the candidate volume the current join evaluates);
  *  - sub-banded keys (band b + 12-bit sub-band of the other 48 bits —
  *    the pigeonhole-exact refinement: ≤3 differing bits outside the
  *    shared band leave ≥1 of 4 sub-bands equal): same stats, i.e. the
  *    candidate volume the refined join would evaluate;
  *  - true neighbor pairs (Hamming ≤ 3 over distinct hashes, unordered)
  *    — the irreducible work an exact per-hash min must do.
  *
  * Usage: runMain graft.ImageBandProbe <sfDir> [<sfDir> ...]
  */
object ImageBandProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ImageBandProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // scan-split sizing for local[32] over single-file tables: the split
      // is min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism)),
      // so the 4 MiB default open cost leaves a <128 MiB single-file scan
      // in 1-2 partitions and every map-only kernel (the image/video codec
      // round-trips especially) nearly serial. 128 KiB reflects local-FS
      // open cost and spreads any >4 MiB file across the cores; on a real
      // cluster the input arrives as many files and this knob is moot.
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (d <- args) {
      val hashed = graft.llm.LlmQueries.imageHashFrame(spark, d)
      val nDocs = hashed.count()
      val hg = hashed.groupBy($"h").agg(min($"doc_id").as("mdoc"))
      val nHashes = hg.count()

      // flat 16-bit banding (the shipped join's key)
      val bands = hg.select($"h", explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          shiftright($"h", b * 16).bitwiseAND(lit(65535L)).as("bv"))): _*)).as("e"))
        .select($"h", $"e.b".as("b"), $"e.bv".as("bv"))
      val flat = bands.groupBy($"b", $"bv").agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("buckets"), max($"k").as("maxK"),
          expr("percentile_approx(k, 0.99)").as("p99K"),
          sum($"k" * $"k").as("sumK2")).head()

      // sub-banded keys: (b, bv, sb, 12-bit slice of the other 48 bits)
      val sub = bands
        .withColumn("r",
          // the three non-b bands packed into 48 bits, low to high
          expr("""CASE b
            WHEN 0 THEN (h >> 16) & 281474976710655
            WHEN 1 THEN (h & 65535) | (((h >> 32) & 4294967295) << 16)
            WHEN 2 THEN (h & 4294967295) | (((h >> 48) & 65535) << 32)
            ELSE h & 281474976710655 END"""))
        .select($"h", $"b", $"bv", explode(array((0 until 4).map(sb =>
          struct(lit(sb).as("sb"),
            shiftright($"r", sb * 12).bitwiseAND(lit(4095L)).as("sbv"))): _*)).as("e"))
        .select($"b", $"bv", $"e.sb".as("sb"), $"e.sbv".as("sbv"))
        .groupBy($"b", $"bv", $"sb", $"sbv").agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("buckets"), max($"k").as("maxK"),
          expr("percentile_approx(k, 0.99)").as("p99K"),
          sum($"k" * $"k").as("sumK2")).head()

      // third refinement level: within (b, bv, sb, sbv) the remaining 36
      // bits carry <=3 errors -> one of 4 9-bit sub-sub-bands equal
      val sub3 = bands
        .withColumn("r",
          expr("""CASE b
            WHEN 0 THEN (h >> 16) & 281474976710655
            WHEN 1 THEN (h & 65535) | (((h >> 32) & 4294967295) << 16)
            WHEN 2 THEN (h & 4294967295) | (((h >> 48) & 65535) << 32)
            ELSE h & 281474976710655 END"""))
        .select($"h", $"b", $"bv", $"r", explode(array((0 until 4).map(sb =>
          struct(lit(sb).as("sb"),
            shiftright($"r", sb * 12).bitwiseAND(lit(4095L)).as("sbv"))): _*)).as("e"))
        .select($"h", $"b", $"bv", $"e.sb".as("sb"), $"e.sbv".as("sbv"),
          // the 36 bits of r outside sub-band sb, packed low to high
          expr("""CASE e.sb
            WHEN 0 THEN (r >> 12) & 68719476735
            WHEN 1 THEN (r & 4095) | (((r >> 24) & 16777215) << 12)
            WHEN 2 THEN (r & 16777215) | (((r >> 36) & 4095) << 24)
            ELSE r & 68719476735 END""").as("r2"))
        .select($"b", $"bv", $"sb", $"sbv", explode(array((0 until 4).map(s3 =>
          struct(lit(s3).as("s3"),
            shiftright($"r2", s3 * 9).bitwiseAND(lit(511L)).as("s3v"))): _*)).as("e2"))
        .select($"b", $"bv", $"sb", $"sbv", $"e2.s3".as("s3"), $"e2.s3v".as("s3v"))
        .groupBy($"b", $"bv", $"sb", $"sbv", $"s3", $"s3v").agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("buckets"), max($"k").as("maxK"),
          expr("percentile_approx(k, 0.99)").as("p99K"),
          sum($"k" * $"k").as("sumK2")).head()

      // the five hottest flat buckets, to see what the degenerate band
      // values actually are
      val top = bands.groupBy($"b", $"bv").agg(count(lit(1)).as("k"))
        .orderBy(desc("k")).limit(5).collect()
        .map(r => s"(b=${r.getInt(0)},bv=${r.getLong(1)},k=${r.getLong(2)})")
        .mkString(" ")

      // true Hamming<=3 unordered neighbor pairs over distinct hashes
      // (via the flat band join, deduped on the pair)
      val truePairs = bands.as("a").join(bands.as("b2"),
          col("a.b") === col("b2.b") && col("a.bv") === col("b2.bv") &&
            col("a.h") < col("b2.h"))
        .filter(bit_count(col("a.h").bitwiseXOR(col("b2.h"))) <= 3)
        .select(col("a.h"), col("b2.h")).distinct().count()

      // anchor-K bucket probing: each member vs the bucket's K smallest
      // (mdoc, h) anchors — exact for buckets <= K, bounded above. Report
      // candidate volume and how many hashes' rep differs from exact.
      val bandsM = hg.select($"h", $"mdoc", explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          shiftright($"h", b * 16).bitwiseAND(lit(65535L)).as("bv"))): _*)).as("e"))
        .select($"h", $"mdoc", $"e.b".as("b"), $"e.bv".as("bv"))
      val repExact = bandsM.as("a").join(bandsM.as("b2"),
          col("a.b") === col("b2.b") && col("a.bv") === col("b2.bv"))
        .filter(bit_count(col("a.h").bitwiseXOR(col("b2.h"))) <= 3)
        .groupBy(col("a.h").as("h")).agg(min(col("b2.mdoc")).as("rep"))
      for (k <- Seq(64, 128)) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"b", $"bv").orderBy($"mdoc", $"h")
        val anchors = bandsM.withColumn("rn", row_number().over(w))
          .filter($"rn" <= k).drop("rn")
        val cand = bandsM.as("a").join(anchors.as("an"),
          col("a.b") === col("an.b") && col("a.bv") === col("an.bv"))
        val candVol = cand.count()
        val repK = cand
          .filter(bit_count(col("a.h").bitwiseXOR(col("an.h"))) <= 3)
          .select(col("a.h").as("h"), col("an.mdoc").as("m"))
          .union(hg.select($"h", $"mdoc".as("m")))
          .groupBy($"h").agg(min($"m").as("repk"))
        val nDiff = repExact.join(repK, Seq("h"))
          .filter($"rep" =!= $"repk").count()
        println(s"[imageprobe]   anchorK=$k dir=$d candVol=$candVol " +
          s"repDiffHashes=$nDiff of $nHashes")
      }

      println(s"[imageprobe] dir=$d docs=$nDocs hashes=$nHashes " +
        s"flat{buckets=${flat.getLong(0)} maxK=${flat.getLong(1)} " +
        s"p99K=${flat.get(2)} sumK2=${flat.getLong(3)}} " +
        s"sub{buckets=${sub.getLong(0)} maxK=${sub.getLong(1)} " +
        s"p99K=${sub.get(2)} sumK2=${sub.getLong(3)}} " +
        s"sub3{buckets=${sub3.getLong(0)} maxK=${sub3.getLong(1)} " +
        s"p99K=${sub3.get(2)} sumK2=${sub3.getLong(3)}} " +
        s"top=$top truePairs=$truePairs")
    }
    spark.stop()
  }
}
