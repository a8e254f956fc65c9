package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-scan stopword-lexicon language vote for `lang_id` /
  * `doc_lang_confusion`: returns the argmax (score, lang) struct over the
  * given lexicons in a single pass over the document.
  *
  * The higher-order formulation this replaces ran one interpreted
  * `aggregate` lambda PER LANGUAGE, each testing every space-token against
  * a 5-literal `isin` — |langs| passes over the token array and
  * |langs|·|lexicon| comparisons per token, all outside codegen
  * (doc_lang_confusion was 15.5 s at sf10 on that shape alone). Here each
  * token is one hash lookup into a word → lang-indices table and the
  * argmax folds into the same pass.
  *
  * Semantics pinned to the original (`LangVotesSpec` A/B):
  *  - tokens are `split(text, ' ')` single-space segments; empty segments
  *    match no lexicon (exactly `isin`'s behavior on "");
  *  - the result is `greatest(struct(score_l, l) for l in langs)` — max
  *    score, ties to the lexicographically LARGEST language code (langs
  *    must be passed sorted ascending; the scan keeps the last max).
  */
case class LangVotes(child: Expression, lexicons: Seq[(String, Seq[String])])
    extends UnaryExpression {

  require(lexicons == lexicons.sortBy(_._1),
    "LangVotes lexicons must be sorted ascending by language code " +
      "(tie-break order of the greatest(struct) it replaces)")

  @transient private lazy val langNames: Array[UTF8String] =
    lexicons.map { case (l, _) => UTF8String.fromString(l) }.toArray

  @transient private lazy val wordLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    lexicons.zipWithIndex.foreach { case ((_, stops), li) =>
      stops.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(li) else prev :+ li)
      }
    }
    m
  }

  @transient private lazy val maxWordLen: Int =
    lexicons.flatMap(_._2).map(_.length).max

  /** Single pass: token scores + argmax. Public: called from generated
    * code through a reference object.
    */
  def score(s: String): InternalRow = {
    val n = lexicons.length
    val counts = new Array[Int](n)
    val len = s.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start && i - start <= maxWordLen) {
          val hit = wordLangs.get(s.substring(start, i))
          if (hit != null) {
            var k = 0
            while (k < hit.length) { counts(hit(k)) += 1; k += 1 }
          }
        }
        start = i + 1
      }
      i += 1
    }
    // langs ascend, so >= keeps the LAST max — the largest language code,
    // matching greatest(struct(score, lang))'s field-order comparison
    var bi = 0
    var bs = counts(0)
    var k = 1
    while (k < n) { if (counts(k) >= bs) { bs = counts(k); bi = k }; k += 1 }
    new GenericInternalRow(Array[Any](bs, langNames(bi)))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_votes requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("score", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  override def prettyName: String = "lang_votes"

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("langVotes", this, classOf[LangVotes].getName)
      s"${ev.value} = $ref.score($c.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): LangVotes =
    copy(child = newChild)
}

object LangVotes {
  /** Column wrapper: a struct (score, lang) — the winning vote. */
  def langVotesCol(text: Column, lexicons: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangVotes(Bridge.expression(text), lexicons))
}
