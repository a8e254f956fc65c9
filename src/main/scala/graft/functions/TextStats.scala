package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass readability counters for `text_readability`: word, sentence,
  * and syllable counts in a single scan of the document string.
  *
  * The higher-order-function formulation this replaces ran THREE regex
  * passes per document (`split(lower(text), "[^a-z]+")`,
  * `split(text, "[.!?]+")`, and a per-word `regexp_extract_all` under an
  * interpreted `aggregate` lambda) — the registry's second-worst sf1→sf10
  * map-only time grower (14.9×). Semantics are pinned to the regex
  * formulation the DuckDB oracle still runs:
  *
  *  - words   = maximal runs of characters that lowercase into [a-z]
  *              (the `[^a-z]+` split over `lower(text)`);
  *  - syllables = per word, max(1, count of maximal [aeiouy]+ runs);
  *  - sentences = max(1, segments of the ORIGINAL text split on
  *              `[.!?]+` runs whose space-trim is non-empty — i.e.
  *              containing any char that is not ' ').
  *
  * Case folding is per code point (Character.toLowerCase), matching the
  * engines' string-level lower() for every single-code-point mapping;
  * the handful of multi-char expansions (e.g. U+0130) would diverge, but
  * cannot survive either engine's `[a-z]` class as more than a word
  * break and do not occur in the gated corpora (hash-checked at
  * sf0.01/sf1/sf10).
  */
object TextStats {

  /** Returns {n_words, n_sentences, n_syllables}. Called from generated
    * code via the object's static forwarder — the loop stays inside the
    * whole-stage-codegen'd operator with zero regex machinery.
    */
  def readability(s: String): Array[Long] = {
    var nWords = 0L
    var nSentences = 0L
    var nSyllables = 0L
    var inWord = false
    var inVowelRun = false
    var wordSyllables = 0L
    var segHasNonSpace = false
    var prevWasSentSep = false
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      val isLetter = lc >= 'a' && lc <= 'z'
      if (isLetter) {
        if (!inWord) { inWord = true; wordSyllables = 0L; inVowelRun = false }
        val isVowel = lc == 'a' || lc == 'e' || lc == 'i' || lc == 'o' ||
          lc == 'u' || lc == 'y'
        if (isVowel && !inVowelRun) wordSyllables += 1L
        inVowelRun = isVowel
      } else if (inWord) {
        nWords += 1L
        nSyllables += math.max(1L, wordSyllables)
        inWord = false
      }
      val isSentSep = cp == '.' || cp == '!' || cp == '?'
      if (isSentSep) {
        if (!prevWasSentSep) {
          if (segHasNonSpace) nSentences += 1L
          segHasNonSpace = false
        }
      } else if (cp != ' ') {
        segHasNonSpace = true
      }
      prevWasSentSep = isSentSep
      i += Character.charCount(cp)
    }
    if (inWord) { nWords += 1L; nSyllables += math.max(1L, wordSyllables) }
    if (segHasNonSpace) nSentences += 1L
    Array(nWords, math.max(1L, nSentences), nSyllables)
  }

  /** Column wrapper: a struct (n_words, n_sentences, n_syllables). */
  def readabilityCol(text: Column): Column =
    Bridge.column(ReadabilityCounts(Bridge.expression(text)))

  /** Within-document trigram repetition counters for `quality_repetition`:
    * {n_grams, n_dup} in one scan, where n_grams is the document's word-
    * trigram INSTANCE count and n_dup the instances whose trigram occurs
    * more than once in the same document.
    *
    * The grouped formulation this replaces shuffled every (doc_id, gram)
    * row — ~59M 30-byte strings at sf10 — for a statistic that is
    * row-LOCAL: no cross-document state exists. Semantics pinned to the
    * oracle's formulation: tokens are `string_split(text, ' ')` on the
    * SINGLE-space separator with empties kept (len = spaces + 1), and
    * gram i is tokens i..i+2 joined by ' ' — which, under single-space
    * split + single-space join, is exactly the original substring from
    * token i's start to token i+2's end, so the scan takes substrings
    * instead of rebuilding strings.
    */
  def repetition(s: String): Array[Long] = {
    val len = s.length
    // token start offsets: 0 and every position after a space
    var spaces = 0
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') spaces += 1; i += 1 }
    if (spaces < 2) return Array(0L, 0L) // < 3 tokens: no trigrams
    val starts = new Array[Int](spaces + 1)
    var t = 1
    i = 0
    while (i < len) { if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val nTokens = spaces + 1
    val counts = new java.util.HashMap[String, Int]()
    var g = 0
    while (g + 2 < nTokens) {
      val end = if (g + 3 < nTokens) starts(g + 3) - 1 else len
      val gram = s.substring(starts(g), end)
      counts.merge(gram, 1, (a, b) => a + b)
      g += 1
    }
    var nDup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > 1) nDup += c }
    Array((nTokens - 2).toLong, nDup)
  }

  /** Column wrapper: a struct (n_grams, n_dup). */
  def repetitionCol(text: Column): Column =
    Bridge.column(RepetitionCounts(Bridge.expression(text)))

  /** All word trigrams of a document in one scan, for
    * `explode(word_trigrams(text))` shapes (`ngram_counts`): the
    * `split → transform(sequence) → slice → concat_ws` chain evaluated
    * five interpreted-tree nodes and three allocations per gram; under
    * single-space split + single-space join each trigram is an exact
    * SUBSTRING of the original text (see [[repetition]]), so this builds
    * the array with one substring per gram. Documents with fewer than
    * three tokens return an empty array — `explode` then drops them,
    * exactly like the `size(ws) >= 3` pre-filter it replaces.
    */
  def wordTrigrams(s: String): Array[UTF8String] = {
    val len = s.length
    var spaces = 0
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') spaces += 1; i += 1 }
    if (spaces < 2) return Array.empty
    val starts = new Array[Int](spaces + 1)
    var t = 1
    i = 0
    while (i < len) { if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val nTokens = spaces + 1
    val out = new Array[UTF8String](nTokens - 2)
    var g = 0
    while (g + 2 < nTokens) {
      val end = if (g + 3 < nTokens) starts(g + 3) - 1 else len
      out(g) = UTF8String.fromString(s.substring(starts(g), end))
      g += 1
    }
    out
  }

  /** Column wrapper: array<string> of the document's word trigrams. */
  def wordTrigramsCol(text: Column): Column =
    Bridge.column(WordTrigrams(Bridge.expression(text)))

  /** Lowercased a–z word tokens of at least `minLen` chars in one scan:
    * the `split(lower(text), "[^a-z]+")` + length-filter chain that every
    * unigram tokenizer in the registry runs (TF-IDF/BM25/perplexity
    * tokens at minLen 3, the BPE histograms at 2, the distill features at
    * 1) costs a full regex pass plus a second filter pass per document —
    * the `build:word_tok` memo fill alone was 24 s at sf10. A token is a
    * maximal run of code points whose [[Character.toLowerCase]] lands in
    * [a-z]; the same single-code-point folding caveat as [[readability]]
    * applies and is pinned by the same spec. Empty tokens (which the
    * regex split emits at separator boundaries) never materialize, so
    * `minLen = 1` is exactly the `w != ""` filter.
    */
  def wordTokens(s: String, minLen: Int): Array[UTF8String] = {
    val out = new java.util.ArrayList[UTF8String]()
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (lc >= 'a' && lc <= 'z') sb.append(lc.toChar)
      else {
        if (sb.length >= minLen) out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length >= minLen) out.add(UTF8String.fromString(sb.toString))
    out.toArray(new Array[UTF8String](out.size))
  }

  /** Column wrapper: array<string> of lowercased a–z tokens, length ≥
    * `minLen`.
    */
  def wordTokensCol(text: Column, minLen: Int): Column =
    Bridge.column(WordTokens(Bridge.expression(text), minLen))

  /** One-pass hashed-bucket unigram counts: `buckets + 1` longs — counts
    * of [[wordTokens]] tokens by `wordHash(w) % buckets` in slots
    * 0..buckets−1, total token count in the last slot. The serving kernel
    * of the linear quality classifier ([[graft.llm.QualityLinear]]): the
    * tokenize + hash + count pipeline that the training feature frame
    * runs as explode→groupBy collapses to ONE allocation-free scan per
    * document (tokens are hashed incrementally as the scan folds their
    * code points — no token string ever materializes), so scoring a
    * corpus against broadcast weights is a pure codegen map. Hash
    * arithmetic is [[CrossHash.wordHash]]'s verbatim (tokens are a–z
    * runs, so the per-char fold sees exactly the token's code points).
    */
  def bucketCounts(s: String, minLen: Int, buckets: Int): Array[Long] = {
    val out = new Array[Long](buckets + 1)
    var h = 0L
    var tokLen = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (lc >= 'a' && lc <= 'z') {
        h = (h * 131L + lc) % 1000000007L
        tokLen += 1
      } else {
        if (tokLen >= minLen) { out((h % buckets).toInt) += 1L; out(buckets) += 1L }
        h = 0L
        tokLen = 0
      }
      i += Character.charCount(cp)
    }
    if (tokLen >= minLen) { out((h % buckets).toInt) += 1L; out(buckets) += 1L }
    out
  }

  /** Column wrapper: array<bigint> of `buckets` hashed token counts plus
    * the total in the last slot.
    */
  def bucketCountsCol(text: Column, minLen: Int, buckets: Int): Column =
    Bridge.column(BucketCounts(Bridge.expression(text), minLen, buckets))

  /** Adjacent-token bigrams over [[wordTokens]] in one scan — the
    * `transform(sequence(...), i -> concat(element_at ws i, ' ',
    * element_at ws i+1))` chain costs two interpreted array probes plus a
    * three-part concat per gram (measured 50.5 s at sf10 for
    * quality_bigram); this allocates exactly one UTF8String per gram off
    * the already-tokenized array. Documents with fewer than two tokens
    * return an empty array — `explode` drops them like the
    * `size(ws) >= 2` pre-filter it replaces.
    */
  def wordBigrams(s: String, minLen: Int): Array[UTF8String] = {
    val toks = wordTokens(s, minLen)
    if (toks.length < 2) return Array.empty
    val sep = UTF8String.fromString(" ")
    val out = new Array[UTF8String](toks.length - 1)
    var i = 0
    while (i + 1 < toks.length) {
      out(i) = UTF8String.concatWs(sep, toks(i), toks(i + 1))
      i += 1
    }
    out
  }

  /** Column wrapper: array<string> of adjacent lowercased-token bigrams. */
  def wordBigramsCol(text: Column, minLen: Int): Column =
    Bridge.column(WordBigrams(Bridge.expression(text), minLen))

  /** One-pass Gopher-rule counters: the five per-document statistics the
    * quality family's label and the `quality_gopher` query aggregate from
    * TWO explode→groupBy passes (`split(text, "\\s+")` words and
    * `split(text, "\n")` lines) — ~2 corpus-sized doc-keyed exchanges per
    * training run — for values that are row-LOCAL. Semantics pinned to the
    * expression formulation the DuckDB oracle still runs (GopherStatsSpec
    * diffs them element-wise):
    *
    *  - words    = maximal runs of code points outside Java regex `\s`
    *               (exactly `[ \t\n\x0B\f\r]` — NOT the wider
    *               Character.isWhitespace set; \x0B spelled out — a
    *               literal VT char sat invisibly here before, reading
    *               as if \s excluded it), i.e. the non-empty
    *               elements of `split(text, "\\s+")`;
    *  - sum_wlen = Σ length(word) in CODE POINTS (Spark `length`);
    *  - n_alpha  = words containing ≥1 ASCII letter (`rlike "[a-zA-Z]"`);
    *  - n_lines  = elements of `split(text, "\n")` — newline count + 1,
    *               empty segments INCLUDED (the query has no line filter);
    *  - n_bullet = lines matching `^\s*[-*]` — optional `\s` run then a
    *               literal '-' or '*'.
    */
  def gopherStats(s: String): Array[Long] = {
    var nWords = 0L; var sumWlen = 0L; var nAlpha = 0L
    var nLines = 1L; var nBullet = 0L
    var runLen = 0L; var hasAlpha = false
    // bullet scanner state: 0 = in leading \s of the line, 1 = decided
    var lineState = 0
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (isWs) {
        if (runLen > 0L) {
          nWords += 1L; sumWlen += runLen
          if (hasAlpha) nAlpha += 1L
          runLen = 0L; hasAlpha = false
        }
      } else {
        runLen += 1L
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z'))
          hasAlpha = true
      }
      if (cp == '\n') {
        nLines += 1L
        lineState = 0
      } else if (lineState == 0) {
        if (cp == '-' || cp == '*') { nBullet += 1L; lineState = 1 }
        // \s\n\f\r can't appear mid-line except \t and ' ' — any
        // regex-\s char keeps the scanner in the leading-run state
        else if (!isWs) lineState = 1
      }
      i += Character.charCount(cp)
    }
    if (runLen > 0L) {
      nWords += 1L; sumWlen += runLen
      if (hasAlpha) nAlpha += 1L
    }
    Array(nWords, sumWlen, nAlpha, nLines, nBullet)
  }

  /** Column wrapper: a struct (n_words, sum_wlen, n_alpha, n_lines,
    * n_bullet).
    */
  def gopherStatsCol(text: Column): Column =
    Bridge.column(GopherStats(Bridge.expression(text)))

  /** First `n` lowercased letters of the document in one scan — the fuzzy
    * skeleton `substring(regexp_replace(lower(text), "[^a-z]", ""), 1, n)`
    * without the two intermediate full-length strings; the scan stops as
    * soon as `n` letters are collected, so a 100 KB document pays for its
    * first ~n letters, not its length. Same folding caveat as
    * [[wordTokens]].
    */
  def lettersPrefix(s: String, n: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    val len = s.length
    while (i < len && sb.length < n) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (lc >= 'a' && lc <= 'z') sb.append(lc.toChar)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column wrapper: the first `n` lowercased letters of the text. */
  def lettersPrefixCol(text: Column, n: Int): Column =
    Bridge.column(LettersPrefix(Bridge.expression(text), n))
}

case class WordTrigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_trigrams requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "word_trigrams"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextStats.wordTrigrams(input.asInstanceOf[UTF8String].toString)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.TextStats.wordTrigrams($c.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordTrigrams =
    copy(child = newChild)
}

case class RepetitionCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_counts requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_dup", LongType, nullable = false)))

  override def prettyName: String = "repetition_counts"

  override def nullSafeEval(input: Any): Any = {
    val a = TextStats.repetition(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](a(0), a(1)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.TextStats.repetition($c.toString());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$arr[0], $arr[1]});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}

case class ReadabilityCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"readability_counts requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("n_syllables", LongType, nullable = false)))

  override def prettyName: String = "readability_counts"

  override def nullSafeEval(input: Any): Any = {
    val a = TextStats.readability(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.TextStats.readability($c.toString());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$arr[0], $arr[1], $arr[2]});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ReadabilityCounts =
    copy(child = newChild)
}

case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_stats requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_wlen", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false)))

  override def prettyName: String = "gopher_stats"

  override def nullSafeEval(input: Any): Any = {
    val a = TextStats.gopherStats(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2), a(3), a(4)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.TextStats.gopherStats($c.toString());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$arr[0], $arr[1], $arr[2], $arr[3], $arr[4]});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

case class WordTokens(child: Expression, minLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_tokens requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "word_tokens"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextStats.wordTokens(input.asInstanceOf[UTF8String].toString, minLen)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.TextStats.wordTokens($c.toString(), $minLen));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

case class WordBigrams(child: Expression, minLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_bigrams requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "word_bigrams"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextStats.wordBigrams(input.asInstanceOf[UTF8String].toString, minLen)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.TextStats.wordBigrams($c.toString(), $minLen));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

case class LettersPrefix(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"letters_prefix requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "letters_prefix"

  override def nullSafeEval(input: Any): Any =
    TextStats.lettersPrefix(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TextStats.lettersPrefix($c.toString(), $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): LettersPrefix =
    copy(child = newChild)
}

case class BucketCounts(child: Expression, minLen: Int, buckets: Int)
    extends UnaryExpression {

  require(buckets > 0, "bucket_counts needs at least one bucket")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bucket_counts requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    LongType, containsNull = false)

  override def prettyName: String = "bucket_counts"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextStats.bucketCounts(input.asInstanceOf[UTF8String].toString, minLen, buckets))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextStats.bucketCounts($c.toString(), $minLen, $buckets));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BucketCounts =
    copy(child = newChild)
}
