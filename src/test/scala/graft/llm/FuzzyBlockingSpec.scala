package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Planted-mutation recall test for dedup_fuzzy's two-pass blocking.
  * Round 6 blocked on the 16-char normalized prefix only, with a
  * documented miss: pairs mutated inside the first 16 normalized chars
  * never became candidates. The suffix pass closes exactly that hole —
  * this spec plants one pair per escape route and one that legitimately
  * stays missed (edited in BOTH 16-char windows).
  */
class FuzzyBlockingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("fuzzy-docs").toString
    val base = ("the quick brown fox jumps over the lazy dog " * 5).trim
    def mutateAt(s: String, i: Int): String =
      s.substring(0, i) + "zzz" + s.substring(i + 3)
    val rows = Seq(
      // prefix-mutated pair: first 3 normalized chars edited — only the
      // suffix key can block these together (the round-6 miss)
      (100L, base),
      (101L, mutateAt(base, 0)),
      // mid-mutated pair: prefix AND suffix keys both intact
      (200L, base + " extra tail marker alpha"),
      (201L, mutateAt(base, 50) + " extra tail marker alpha"),
      // suffix-mutated pair (within the 200-char verify window): the
      // prefix key blocks these — symmetric coverage
      (300L, base),
      (301L, mutateAt(base, 190)),
      // edited in BOTH windows: legitimately missed by two-pass blocking
      (400L, base + " beta gamma delta"),
      (401L, mutateAt(mutateAt(base, 0), 190) + " beta gamma delta"),
      // unrelated doc: must pair with nothing
      (500L, "completely different content " * 10))
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'test' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("two-pass blocking catches prefix-, mid- and suffix-window mutations") {
    val pairs = graft.SparkEntry.queries("dedup_fuzzy")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)),
      s"prefix-mutated pair missed — suffix pass not working: $pairs")
    assert(pairs.contains((200L, 201L)), s"mid-mutated pair missed: $pairs")
    assert(pairs.contains((300L, 301L)), s"suffix-mutated pair missed: $pairs")
    // base-vs-base duplicates across plants (100/300 share text) are fine;
    // what must NOT appear: the unrelated doc, or >20-distance pairs
    assert(!pairs.exists(p => p._1 == 500L || p._2 == 500L),
      s"unrelated doc paired: $pairs")
  }
}
