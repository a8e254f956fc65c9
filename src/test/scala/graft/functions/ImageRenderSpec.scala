package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The row-local rendering kernels behind `build:image_hash` /
  * `build:video_hash`, and the bounded anchor probing behind
  * `dedup_image`:
  *
  *  - [[ImageRender.grayHist]]/[[ImageRender.videoGrayHist]] must equal
  *    the explode → groupBy formulation they replaced (the DuckDB oracle
  *    still runs that formulation — these are the same-arithmetic pins);
  *  - [[MinKPairs]] must keep exactly the K lexicographically-smallest
  *    pairs under any reduce/merge split (map-side combinability);
  *  - anchor-K `dedup_image` must EQUAL the exact all-pairs formulation
  *    wherever every (band, value) bucket is ≤ K — the dispatch's
  *    correctness contract (approximation only ever touches hot buckets).
  */
class ImageRenderSpec extends AnyFunSuite with SparkTestBase {

  private val P1 = CrossHash.P1

  private def polyHash(w: String): Long = {
    var h = 0L
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      h = (h * 131L + cp) % P1
      i += Character.charCount(cp)
    }
    h
  }

  /** Reference replica of the explode formulation: distinct word
    * trigrams over the single-space split, hash-bucketed mod 256.
    */
  private def refGray(text: String): Array[Int] = {
    val ws = text.split(" ", -1)
    if (ws.length < 3) return Array.emptyIntArray
    val tris = (0 until ws.length - 2).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").distinct
    val cnt = new Array[Int](256)
    tris.foreach(t => cnt((polyHash(t) % 256).toInt) += 1)
    cnt.map(c => math.min(255, c * 16))
  }

  private def refVideoGray(text: String, frames: Int): Array[Int] = {
    val ws = text.split(" ", -1)
    if (ws.length < 3) return Array.emptyIntArray
    val tris = (0 until ws.length - 2).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").distinct
    val cnt = new Array[Int](frames * 256)
    for (f <- 0 until frames; t <- tris) {
      val x = polyHash(t)
      cnt(f * 256 + (((x * CrossHash.affineA(f) + CrossHash.affineB(f)) % P1) % 256).toInt) += 1
    }
    cnt.map(c => math.min(255, c * 16))
  }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",                       // <3 tokens -> no shingles
    "",                          // empty
    "x y z",                     // exactly one trigram
    "r1 r1 r1 r1 r1 r1",        // repeated token -> one distinct trigram
    ("tok " * 300).trim)         // long doc, bucket clamping territory

  test("grayHist equals the explode formulation") {
    for (t <- texts)
      assert(ImageRender.grayHist(t).sameElements(refGray(t)), s"drift on '$t'")
  }

  test("videoGrayHist equals the per-frame affine explode formulation") {
    for (t <- texts)
      assert(ImageRender.videoGrayHist(t, 4).sameElements(refVideoGray(t, 4)),
        s"drift on '$t'")
  }

  test("gray_hist column kernel matches the Scala kernel through codegen") {
    import spark.implicits._
    val df = texts.toDF("text")
    val got = df.select(ImageRender.grayHistCol($"text")).collect()
      .map(_.getSeq[Int](0).toArray)
    texts.zip(got).foreach { case (t, g) =>
      assert(g.sameElements(ImageRender.grayHist(t)))
    }
  }

  test("MinKPairs keeps the K smallest pairs under any reduce/merge split") {
    val k = 5
    val agg = new MinKPairs(k)
    val rnd = new scala.util.Random(1234)
    val data = Array.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
    val expected = data.toSeq.distinct.sorted.take(k) // ties collapse identically
    // NOTE: duplicates are kept by the buffer (the band frame never emits
    // them — h is unique per bucket), so feed distinct pairs
    val distinctData = data.distinct
    val whole = distinctData.foldLeft(agg.zero)(agg.reduce)
    assert(whole == distinctData.toSeq.sorted.take(k))
    // split-and-merge at every cut point
    for (cut <- Seq(0, 1, 50, distinctData.length)) {
      val (l, r) = distinctData.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m == distinctData.toSeq.sorted.take(k), s"cut=$cut")
    }
    assert(expected == distinctData.toSeq.sorted.take(k))
  }

  test("anchor-K dedup_image equals the exact all-pairs formulation at sf0.001") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val hashed = graft.llm.LlmQueries.imageHashFrame(spark, sf)
    val hg = hashed.groupBy($"h").agg(min($"doc_id").as("mdoc"))
    val bands = hg.select($"h", $"mdoc",
      explode(array((0 until 4).map(b => struct(lit(b).as("b"),
        shiftright($"h", b * 16).bitwiseAND(lit(65535L)).as("bv"))): _*)).as("e"))
      .select($"h", $"mdoc", $"e.b".as("b"), $"e.bv".as("bv"))
    // precondition of the equality: every bucket fits inside the anchor set
    val maxBucket = bands.groupBy($"b", $"bv").agg(count(lit(1)).as("k"))
      .agg(max($"k")).head().getLong(0)
    assert(maxBucket <= 128, s"test corpus outgrew the anchor cap: $maxBucket")
    val exact = bands.as("a").join(bands.as("b2"),
        col("a.b") === col("b2.b") && col("a.bv") === col("b2.bv"))
      .filter(bit_count(col("a.h").bitwiseXOR(col("b2.h"))) <= 3)
      .groupBy(col("a.h").as("h")).agg(min(col("b2.mdoc")).as("rep"))
    val exactOut = hashed.join(exact, Seq("h"))
      .select($"doc_id", $"rep".as("rep_id"), ($"rep" < $"doc_id").as("is_dup"))
    val registered = graft.SparkEntry.queries("dedup_image")(spark, sf)
    assert(registered.exceptAll(exactOut).isEmpty &&
      exactOut.exceptAll(registered).isEmpty,
      "anchor-K output drifted from exact on a corpus with no hot buckets")
  }
}
