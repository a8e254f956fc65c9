package graft.functions

import java.util.Locale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The two one-pass text-scan expressions (ReadabilityCounts, BpeMeter)
  * replaced regex formulations whose DuckDB twins still run in the
  * oracle SQL — so each scan must equal the regex reference model on
  * arbitrary input, not just the gated corpora. The reference models here
  * are the literal pre-rewrite Spark formulations re-run in plain JVM
  * regex (`[^a-z]+` word split over lower(text), `[aeiouy]+` runs,
  * `[.!?]+` sentence split with space-trim).
  *
  * Known, accepted divergence (documented on TextStats): code points
  * whose lowercase is a MULTI-char expansion (e.g. U+0130) fold
  * differently under per-code-point Character.toLowerCase than under
  * string-level lower(); such characters cannot appear as [a-z] content
  * in either engine and are excluded from the generator.
  */
class TextScanExprSpec extends AnyFunSuite with SparkTestBase {

  private def refReadability(text: String): (Long, Long, Long) = {
    val words = text.toLowerCase(Locale.ROOT).split("[^a-z]+", -1).filter(_.nonEmpty)
    val nWords = words.length.toLong
    val nSyllables = words.map(w =>
      math.max(1L, "[aeiouy]+".r.findAllIn(w).length.toLong)).sum
    val nSentences = math.max(1L,
      text.split("[.!?]+", -1).count(_.exists(_ != ' ')).toLong)
    (nWords, nSentences, nSyllables)
  }

  private def refMeter(text: String, vocab: Map[String, Long]): (Long, Long) = {
    val ws = text.toLowerCase(Locale.ROOT).split("[^a-z]+", -1).filter(_.nonEmpty)
    (ws.length.toLong, ws.map(w => vocab.getOrElse(w, 1L)).sum)
  }

  private def corpus: Seq[String] = {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      10 -> Gen.alphaChar,
      3 -> Gen.oneOf(' ', '.', '!', '?', ',', ';', '\n', '\t'),
      2 -> Gen.numChar,
      1 -> Gen.oneOf('é', 'ß', '中', 'K', 'Ø', 'ø'))
    val gen = Gen.listOf(charGen).map(_.mkString)
    (0 until 200).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", "   ", "...", "a", "A.b!C?d", ". leading", "trailing.",
        "no sentence separators at all", "!!!", " . ! ? ", "yyyy", "rhythm",
        "a.b", "ab..cd", "tab\there.and!more?", "K.kelvin")
  }

  test("TextStats.readability equals the regex reference on arbitrary strings") {
    corpus.foreach { s =>
      val got = TextStats.readability(s)
      val (w, sen, syl) = refReadability(s)
      assert((got(0), got(1), got(2)) == ((w, sen, syl)),
        s"readability mismatch on ${s.take(60).mkString}: got ${got.toSeq}, want ($w,$sen,$syl)")
    }
  }

  test("ReadabilityCounts codegen path matches the reference through a DataFrame") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rows = docs.toDF("id", "text")
      .select($"id", TextStats.readabilityCol($"text").as("rc"))
      .select($"id", $"rc.n_words", $"rc.n_sentences", $"rc.n_syllables")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    docs.foreach { case (i, t) =>
      assert(rows(i) == refReadability(t), s"codegen mismatch on doc $i: '${t.take(60)}'")
    }
  }

  test("BpeMeter.meter equals the split+lookup reference, seen and unseen words") {
    val vocabPairs = corpus.flatMap(
      _.toLowerCase(Locale.ROOT).split("[^a-z]+", -1).filter(_.nonEmpty))
      .distinct.zipWithIndex.collect { case (w, i) if i % 3 != 0 => // leave 1/3 unseen
        w -> ((i % 7) + 2L)
      }
    val vocab = vocabPairs.toMap
    val jmap = new java.util.HashMap[String, java.lang.Long]()
    vocabPairs.foreach { case (w, t) => jmap.put(w, java.lang.Long.valueOf(t)) }
    corpus.foreach { s =>
      val got = BpeMeter.meter(s, jmap)
      assert((got(0), got(1)) == refMeter(s, vocab),
        s"meter mismatch on '${s.take(60)}'")
    }
  }

  private def refRepetition(text: String): (Long, Long) = {
    // the oracle formulation: single-space split KEEPING empties, trigram
    // = tokens i..i+2 joined by ' ', count instances and dup instances
    val ws = text.split(" ", -1)
    if (ws.length < 3) return (0L, 0L)
    val grams = (0 until ws.length - 2).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
    val byGram = grams.groupBy(identity).view.mapValues(_.size.toLong)
    (grams.size.toLong, byGram.values.filter(_ > 1).sum)
  }

  test("TextStats.repetition equals the split+group reference, empties included") {
    val cases = corpus ++ Seq(
      "a b c a b c a b c",       // repeated trigrams
      "a  b  c",                 // empty tokens between double spaces
      " a b",                    // leading space -> empty first token
      "a b ", "a b", "  ",       // trailing empty / too few tokens / all-empty
      "x x x x x",               // self-similar run
      "a b c")
    cases.foreach { s =>
      val got = TextStats.repetition(s)
      assert((got(0), got(1)) == refRepetition(s),
        s"repetition mismatch on '${s.take(60)}'")
    }
  }

  test("TextStats.wordTrigrams equals the split+join reference, empties included") {
    val cases = corpus ++ Seq("a b c a b c", "a  b  c", " a b c ", "x y", "", "a b c")
    cases.foreach { s =>
      val ws = s.split(" ", -1)
      val want =
        if (ws.length < 3) Seq.empty
        else (0 until ws.length - 2).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
      val got = TextStats.wordTrigrams(s).map(_.toString).toSeq
      assert(got == want, s"trigram mismatch on '${s.take(60)}'")
    }
  }

  test("WordTrigrams codegen path explodes like the transform chain") {
    import spark.implicits._
    val docs = (corpus ++ Seq("a b c d", "one two", " x y z"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val viaExpr = docs.toDF("id", "text")
      .select($"id", explode(TextStats.wordTrigramsCol($"text")).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaChain = docs.toDF("id", "text")
      .withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 3)
      .select($"id", explode(transform(sequence(lit(0), size($"ws") - 3),
        i => concat_ws(" ", slice($"ws", i + 1, lit(3))))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(viaExpr == viaChain)
  }

  test("RepetitionCounts codegen path matches the reference through a DataFrame") {
    import spark.implicits._
    val docs = (corpus ++ Seq("a b c a b c a b c", "a  b  c d", " a b c "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rows = docs.toDF("id", "text")
      .select($"id", TextStats.repetitionCol($"text").as("r"))
      .select($"id", $"r.n_grams", $"r.n_dup")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (i, t) =>
      assert(rows(i) == refRepetition(t), s"codegen mismatch on doc $i: '${t.take(60)}'")
    }
  }

  private def refWordTokens(text: String, minLen: Int): Seq[String] =
    text.toLowerCase(Locale.ROOT).split("[^a-z]+", -1).filter(_.length >= minLen).toSeq

  test("TextStats.wordTokens equals the split+filter reference at every minLen") {
    for (s <- corpus; minLen <- 1 to 3) {
      val got = TextStats.wordTokens(s, minLen).map(_.toString).toSeq
      val want = refWordTokens(s, minLen)
      assert(got == want,
        s"wordTokens($minLen) mismatch on '${s.take(60)}': got $got, want $want")
    }
  }

  test("WordTokens codegen path explodes like the regex split chain") {
    import spark.implicits._
    for (minLen <- Seq(1, 2, 3)) {
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("id", "text")
      val a = df.select($"id",
          explode(TextStats.wordTokensCol($"text", minLen)).as("w"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val b = df.select($"id",
          explode(filter(split(lower($"text"), "[^a-z]+"),
            w => length(w) >= minLen)).as("w"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(a == b, s"WordTokens explode A/B mismatch at minLen=$minLen")
    }
  }

  test("TextStats.wordBigrams equals adjacent joins over the token reference") {
    for (s <- corpus; minLen <- 1 to 3) {
      val toks = refWordTokens(s, minLen)
      val want = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
      val got = TextStats.wordBigrams(s, minLen).map(_.toString).toSeq
      assert(got == want,
        s"wordBigrams($minLen) mismatch on '${s.take(60)}': got $got, want $want")
    }
  }

  test("WordBigrams codegen path explodes like the transform chain") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val a = df.select($"id",
        explode(TextStats.wordBigramsCol($"text", 3)).as("bg"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val ws = filter(split(lower($"text"), "[^a-z]+"), w => length(w) >= 3)
    val b = df.select($"id", ws.as("__ws"))
      .filter(size($"__ws") >= 2)
      .select($"id", explode(transform(sequence(lit(0), size($"__ws") - 2),
        i => concat(element_at($"__ws", i + 1), lit(" "),
          element_at($"__ws", i + 2)))).as("bg"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b, "WordBigrams explode A/B mismatch")
  }

  test("TextStats.lettersPrefix equals the regexp_replace+substring reference") {
    for (s <- corpus; n <- Seq(1, 16, 200)) {
      val want = s.toLowerCase(Locale.ROOT).replaceAll("[^a-z]", "").take(n)
      val got = TextStats.lettersPrefix(s, n).toString
      assert(got == want,
        s"lettersPrefix($n) mismatch on '${s.take(60)}': got '$got', want '$want'")
    }
  }

  test("LettersPrefix codegen path matches the regex chain through a DataFrame") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val a = df.select($"id", TextStats.lettersPrefixCol($"text", 200).as("nrm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = df.select($"id",
        substring(regexp_replace(lower($"text"), "[^a-z]", ""), 1, 200).as("nrm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "LettersPrefix A/B mismatch vs regexp_replace chain")
  }

  test("distinct word_trigrams explodes like the array_distinct transform chain") {
    import spark.implicits._
    val docs = (corpus ++ Seq("a b c a b c a b c", "x y z x y z w"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val a = df.select($"doc_id", explode(array_distinct(
        TextStats.wordTrigramsCol($"text"))).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = df.withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 3)
      .select($"doc_id", explode(array_distinct(
        transform(sequence(lit(0), size($"ws") - 3),
          i => concat_ws(" ", slice($"ws", i + 1, lit(3)))))).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b, "distinct-shingle explode A/B mismatch vs the original chain")
  }

  test("BpeMeterExpr codegen path matches the reference through a DataFrame") {
    import spark.implicits._
    val vocab = Map("alpha" -> 3L, "beta" -> 2L, "rhythm" -> 4L)
    val jmap = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (w, t) => jmap.put(w, java.lang.Long.valueOf(t)) }
    val bc = spark.sparkContext.broadcast(jmap)
    val docs = Seq("alpha beta gamma", "Alpha! rhythm? x", "", "...", "中 alpha中beta")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rows = docs.toDF("id", "text")
      .select($"id", BpeMeter.meterCol($"text", bc).as("m"))
      .select($"id", $"m.n_words", $"m.n_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (i, t) =>
      assert(rows(i) == refMeter(t, vocab), s"codegen mismatch on doc $i: '$t'")
    }
  }
}
