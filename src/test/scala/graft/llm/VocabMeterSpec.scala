package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the broadcast-vocab serving paths of quality_perplexity,
  * quality_rarity and tfidf_topterms ROW-IDENTICAL to the join paths
  * they dispatch away from — including the 1e-6 xent grid, HALF_UP
  * 6-place tf-idf rounding, the (score desc, term asc) top-3 tie cut,
  * and zero-token-document dropping. The corpus mixes duplicate words,
  * single-word docs, unicode noise, sub-3-char tokens, and empty docs.
  */
class VocabMeterSpec extends AnyFunSuite with SparkTestBase {

  private def docs: DataFrame = {
    import spark.implicits._
    val pool = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "the", "and", "rare", "word", "xy", "a", "中文", "Kelvin")
    val texts = (0 until 120).map { i =>
      (0 until (i % 23)).map(j => pool(((i * 37 + j * 11) % pool.size + pool.size) % pool.size))
        .mkString(" ")
    } ++ Seq("", "   ", "xy a b", "alpha", "alpha alpha alpha",
      "ALPHA Beta GAMMA", "rare", "the. and! rare?")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("broadcast vocab stats exist for the test corpus and count the vocabulary") {
    val st = TextRankQueries.vocabStatsOf(docs)
    assert(st.nonEmpty)
    val (bc, tot, n) = st.get
    assert(n == docs.count())
    // tot = all minLen-3 tokens; cross-check against the exploded frame
    assert(tot == TextRankQueries.wordTok(docs).count())
    assert(!bc.value.isEmpty)
  }

  test("perplexityFrame broadcast path equals the xent join path row-for-row") {
    val d = docs
    val tk = TextRankQueries.wordTok(d)
    val a = rows(TextRankQueries.perplexityFrame(d, tk, TextRankQueries.vocabStatsOf(d)))
    val b = rows(TextRankQueries.perplexityFrame(d, tk, None))
    assert(a == b, s"perplexity A/B mismatch: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
  }

  test("rarityFrame broadcast path equals the countDistinct join path row-for-row") {
    val d = docs
    val tk = TextRankQueries.wordTok(d)
    val a = rows(TextRankQueries.rarityFrame(d, tk, TextRankQueries.vocabStatsOf(d)))
    val b = rows(TextRankQueries.rarityFrame(d, tk, None))
    assert(a == b, s"rarity A/B mismatch: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
  }

  test("tfidfFrame broadcast path equals the window join path row-for-row") {
    val d = docs
    val tk = TextRankQueries.wordTok(d)
    val a = rows(TextRankQueries.tfidfFrame(d, tk, TextRankQueries.vocabStatsOf(d)))
    val b = rows(TextRankQueries.tfidfFrame(d, tk, None))
    assert(a == b, s"tfidf A/B mismatch: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
  }

  test("past the cutover the dispatch stays on the join path") {
    assert(TextRankQueries.vocabStatsOf(docs, cutover = 1L).isEmpty)
  }
}
