package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins bpe_merges' greedy-merge semantics on a fixture where the
  * subtleties actually bite:
  *
  *  - overlap: merging (a,a) into "aaa" must give greedy "aa a", not
  *    "a aa" or a double-merge "aa aa";
  *  - consecutive occurrences: "abab" must merge BOTH (a,b) pairs in one
  *    round (under the double-space encoding each occurrence owns its
  *    boundary spaces, so one replace suffices);
  *  - composite merges: round 3 merges two earlier merge outputs
  *    (ab + ab), the part a single-pass pair count can't produce;
  *  - ties: rounds 5/6 break an n=1 tie lexicographically;
  *  - exhaustion: the fixture runs dry after 6 merges; the query must
  *    emit the truncated table, not throw on an empty argmax.
  *
  * bpe_encode then applies the trained vocabulary: fully-merged words
  * count 1 token, and sub-2-char words (outside the training histogram)
  * fall back to 1 symbol via the left-join coalesce.
  */
class BpeMergesSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("bpe-docs").toString
    import spark.implicits._
    // histogram: "abab" ×3, "aaa" ×2, "xyz" ×1 (plus 1-char words that
    // stay below the 2-char training floor).
    // round 1: (a,b) n=6   → abab becomes " ab ab "
    // round 2: (a,a) n=4   → aaa becomes " aa a " (greedy overlap)
    // round 3: (ab,ab) n=3 → " abab "
    // round 4: (aa,a) n=2  → " aaa "
    // round 5: (x,y) n=1   — tie with (y,z), lexicographic lhs wins
    // round 6: (xy,z) n=1  → " xyz "; then no pairs remain
    Seq((1L, "abab abab abab"), (2L, "aaa aaa"), (3L, "a b c xyz"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("greedy merges, composite symbols, tie-break, early exhaustion") {
    val rows = graft.SparkEntry.queries("bpe_merges")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "a", "b", "ab", 6L),
      (2, "a", "a", "aa", 4L),
      (3, "ab", "ab", "abab", 3L),
      (4, "aa", "a", "aaa", 2L),
      (5, "x", "y", "xy", 1L),
      (6, "xy", "z", "xyz", 1L)),
      s"merge table diverged from greedy BPE: ${rows.toSeq}")
  }

  test("single replace under double-space encoding == greedy merge scan") {
    // the query's merge step is ONE literal `replace(s, " a  b ", " ab ")`
    // over the double-space-joined symbol string; this property pins it
    // against a direct greedy left-to-right scan across random words and
    // random merge sequences (not just argmax merges), including the
    // self-pair run shapes ("bbbbb") that broke the earlier single-space
    // two-pass scheme (misaligned merge at run offset 3 — seed 196 below
    // was the original counterexample)
    def greedy(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def viaReplace(syms: Vector[String], a: String, b: String): Vector[String] = {
      val pat = s" $a  $b "; val rep = s" $a$b "
      ("  " + syms.mkString("  ") + "  ").replace(pat, rep)
        .trim.split("  ").filter(_.nonEmpty).toVector
    }
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.chooseNum(1, 14)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (seed <- 0 until 200) {
      var word = wordGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .map(_.toString).toVector
      // up to 5 random merges chained on the greedy result
      var step = 0
      while (step < 5 && word.length >= 2) {
        val pairs = word.zip(word.tail).distinct
        val (a, b) = pairs((seed * 31 + step) % pairs.length)
        val g = greedy(word, a, b)
        val r = viaReplace(word, a, b)
        assert(g == r,
          s"divergence at seed=$seed step=$step merging ($a,$b) on $word:\n" +
            s"  greedy=$g\n  replace=$r")
        word = g
        step += 1
      }
    }
  }

  test("encode applies the trained vocabulary; sub-floor words count 1") {
    val rows = graft.SparkEntry.queries("bpe_encode")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (1L, 3L, 3L), // three fully-merged "abab" words, 1 token each
      (2L, 2L, 2L), // two fully-merged "aaa" words
      (3L, 4L, 4L)), // a/b/c below the floor (1 each) + merged "xyz"
      s"encode diverged: ${rows.toSeq}")
  }
}
