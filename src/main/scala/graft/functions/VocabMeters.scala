package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-vocabulary serving scans for the corpus-statistics text
  * quality family (`quality_perplexity`, `quality_rarity`,
  * `tfidf_topterms`): per-document scores in ONE codegen scan of the text
  * against a broadcast word → (count, doc-frequency) table — the same
  * broadcast-vs-join dispatch [[BpeMeter]] gives `bpe_encode`, applied to
  * the unigram-LM scorers.
  *
  * The join formulations these replace explode every token occurrence,
  * group to per-(doc, word) counts, and hash-join the vocab dim — a
  * (doc_id, w) exchange per query (156/117/400 MB at sf10). While the
  * vocabulary fits an executor broadcast the whole score is row-local;
  * past the cutover the vocab-keyed join paths remain the scale story.
  *
  * Semantics pinned to the join paths (VocabMeterSpec A/B, and the
  * DuckDB oracles still run the join formulation):
  *  - tokens are maximal [a-z] runs of `lower(text)` with length ≥ 3
  *    (exactly [[TextStats.wordTokens]] at minLen 3);
  *  - words missing from the stats table contribute nothing (the inner
  *    join drops them; cannot occur when the table is built from the
  *    same corpus, mirrored for safety);
  *  - every float step replays the join path's expression tree: the
  *    per-word xent term is `(m * ln(c / tot)) * -1e6` snapped HALF_UP
  *    to the 1e-6 integer grid and summed as long; the tf-idf score is
  *    `tf * ln(n / df)` rounded HALF_UP to 6 places.
  */
object VocabMeters {

  /** Per-doc word → occurrence count over [a-z]-run tokens of length ≥ 3. */
  private def docCounts(s: String): java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    var sb: java.lang.StringBuilder = null
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (lc >= 'a' && lc <= 'z') {
        if (sb == null) sb = new java.lang.StringBuilder(16)
        sb.appendCodePoint(lc)
      } else {
        if (sb != null && sb.length >= 3) {
          val cnt = m.get(sb.toString)
          if (cnt == null) m.put(sb.toString, Array(1L)) else cnt(0) += 1L
        }
        if (sb != null) sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb != null && sb.length >= 3) {
      val cnt = m.get(sb.toString)
      if (cnt == null) m.put(sb.toString, Array(1L)) else cnt(0) += 1L
    }
    m
  }

  private def snap0(x: Double): Long =
    JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP).doubleValue().toLong

  /** Returns {n_words, g_sum, df_sum} over vocab-matched tokens: the
    * inputs of the xent (perplexity) and mean-df (rarity) scores. Static
    * forwarder target for codegen.
    */
  def sums(s: String, stats: java.util.HashMap[String, Array[Long]],
      tot: Long): Array[Long] = {
    var nWords = 0L
    var gSum = 0L
    var dfSum = 0L
    val it = docCounts(s).entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cd = stats.get(e.getKey)
      if (cd != null) {
        val m = e.getValue()(0)
        nWords += m
        gSum += snap0((m * Math.log(cd(0) / tot.toDouble)) * -1000000L)
        dfSum += m * cd(1)
      }
    }
    Array(nWords, gSum, dfSum)
  }

  /** Returns the top-`k` (term, tf, df, score) rows by (score desc, term
    * asc) — tfidf_topterms' per-document slice. Static forwarder target.
    */
  def tfidfTop(s: String, stats: java.util.HashMap[String, Array[Long]],
      nDocs: Long, k: Int): GenericArrayData = {
    val entries = new java.util.ArrayList[(String, Long, Long, Double)]()
    val it = docCounts(s).entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cd = stats.get(e.getKey)
      if (cd != null) {
        val tf = e.getValue()(0)
        val score = JBigDecimal.valueOf(tf * Math.log(nDocs / cd(1).toDouble))
          .setScale(6, RoundingMode.HALF_UP).doubleValue()
        entries.add((e.getKey, tf, cd(1), score))
      }
    }
    entries.sort((a, b) => {
      val c = java.lang.Double.compare(b._4, a._4)
      if (c != 0) c else a._1.compareTo(b._1)
    })
    val n = math.min(k, entries.size)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val (t, tf, df, sc) = entries.get(i)
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(t), tf, df, sc))
      i += 1
    }
    new GenericArrayData(out)
  }

  type Stats = Broadcast[java.util.HashMap[String, Array[Long]]]

  def sumsCol(text: Column, stats: Stats, tot: Long): Column =
    Bridge.column(TokenVocabSums(Bridge.expression(text), stats, tot))

  def tfidfTopCol(text: Column, stats: Stats, nDocs: Long, k: Int): Column =
    Bridge.column(TfidfTopTerms(Bridge.expression(text), stats, nDocs, k))
}

case class TokenVocabSums(child: Expression, stats: VocabMeters.Stats,
    tot: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_vocab_sums requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("df_sum", LongType, nullable = false)))

  override def prettyName: String = "token_vocab_sums"

  override def nullSafeEval(input: Any): Any = {
    val a = VocabMeters.sums(
      input.asInstanceOf[UTF8String].toString, stats.value, tot)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("vocabStats", stats,
      classOf[Broadcast[java.util.HashMap[String, Array[Long]]]].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.VocabMeters.sums($c.toString(),
         |  (java.util.HashMap) $bc.value(), ${tot}L);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$arr[0], $arr[1], $arr[2]});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenVocabSums =
    copy(child = newChild)
}

case class TfidfTopTerms(child: Expression, stats: VocabMeters.Stats,
    nDocs: Long, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tfidf_top_terms requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("df", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "tfidf_top_terms"

  override def nullSafeEval(input: Any): Any =
    VocabMeters.tfidfTop(
      input.asInstanceOf[UTF8String].toString, stats.value, nDocs, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("vocabStats", stats,
      classOf[Broadcast[java.util.HashMap[String, Array[Long]]]].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.VocabMeters.tfidfTop($c.toString(),
         |  (java.util.HashMap) $bc.value(), ${nDocs}L, $k);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TfidfTopTerms =
    copy(child = newChild)
}
