package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-vocabulary BPE metering: per-document (n_words, n_tokens) in
  * ONE codegen scan of the text against a broadcast word→token-count
  * table — the serving path `bpe_encode` dispatches to while the trained
  * vocabulary fits an executor broadcast.
  *
  * The join formulation this replaces (explode every word occurrence,
  * hash-join the vocab dim, re-aggregate by doc_id) pays a per-occurrence
  * row + join probe + a doc_id exchange; this is a stateless map with
  * zero shuffle. Semantics are pinned to the join path (and the DuckDB
  * oracle): words are maximal runs of characters that lowercase into
  * [a-z] (`split(lower(text), "[^a-z]+")`, empties dropped), each word
  * contributes its trained token count or 1 when unseen/below the 2-char
  * training floor. Documents with zero words produce n_words = 0 — the
  * caller filters them, matching the explode path dropping the group.
  */
object BpeMeter {

  /** Returns {n_words, n_tokens}. Static forwarder target for codegen. */
  def meter(s: String, vocab: java.util.HashMap[String, java.lang.Long]): Array[Long] = {
    var nWords = 0L
    var nTokens = 0L
    var sb: java.lang.StringBuilder = null
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (lc >= 'a' && lc <= 'z') {
        if (sb == null) sb = new java.lang.StringBuilder(16)
        sb.appendCodePoint(lc)
      } else if (sb != null && sb.length > 0) {
        nWords += 1L
        val t = vocab.get(sb.toString)
        nTokens += (if (t == null) 1L else t.longValue())
        sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb != null && sb.length > 0) {
      nWords += 1L
      val t = vocab.get(sb.toString)
      nTokens += (if (t == null) 1L else t.longValue())
    }
    Array(nWords, nTokens)
  }

  def meterCol(text: Column,
      vocab: Broadcast[java.util.HashMap[String, java.lang.Long]]): Column =
    Bridge.column(BpeMeterExpr(Bridge.expression(text), vocab))
}

case class BpeMeterExpr(child: Expression,
    vocab: Broadcast[java.util.HashMap[String, java.lang.Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_meter requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  override def prettyName: String = "bpe_meter"

  override def nullSafeEval(input: Any): Any = {
    val a = BpeMeter.meter(input.asInstanceOf[UTF8String].toString, vocab.value)
    new GenericInternalRow(Array[Any](a(0), a(1)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bpeVocab", vocab,
      classOf[Broadcast[java.util.HashMap[String, java.lang.Long]]].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.BpeMeter.meter($c.toString(),
         |  (java.util.HashMap) $bc.value());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$arr[0], $arr[1]});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMeterExpr =
    copy(child = newChild)
}
