package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the EXACT-INTEGER vector kernels behind
  * the quantized (`ARRAY<BIGINT>`) embedding path: dot, squared norm,
  * squared L2 distance. Semantically identical to the
  * `aggregate`/`zip_with` higher-order formulations they replace in
  * [[VectorFns]] (same Long arithmetic, same null-on-length-mismatch), but
  * evaluated as one tight primitive loop per vector instead of one boxed
  * lambda dispatch per ELEMENT — and with `doGenCode` so top-level uses
  * stay inside whole-stage codegen. Inside higher-order lambdas (the IVF
  * argmax over a centroid array) they run interpreted, but still one
  * `while` loop per centroid rather than 64 interpreted closures.
  *
  * Measured motivation: sim_ann_ivf's 16-centroid assignment over 20k sf1
  * vectors spent ~5 s in interpreted HOF evaluation; the exact same plan
  * with these kernels is ~6× faster (BASELINE.md round-6 note). This is
  * SURVEY.md §4.2 preference-order (b) — a custom `Expression` only for
  * the proven hot scalar, mirroring [[VecCosine]] on the float path.
  */
sealed trait QVecTypes { self: Expression =>
  protected def checkLongArrays(ts: Seq[DataType]): TypeCheckResult =
    if (ts.forall { case ArrayType(LongType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> arguments, got " +
          ts.map(_.sql).mkString(", "))
}

/** Exact Σ aᵢ·bᵢ over two BIGINT arrays; null if lengths differ. */
case class QVecDot(left: Expression, right: Expression)
    extends BinaryExpression with QVecTypes {

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "qvec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L; var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Exact Σ aᵢ² over a BIGINT array. */
case class QVecNorm2(child: Expression)
    extends UnaryExpression with QVecTypes {

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArrays(Seq(child.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "qvec_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0L; var i = 0
    while (i < x.numElements()) {
      val v = x.getLong(i); acc += v * v; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.QVecNorm2.eval($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QVecNorm2 {
  /** Static helper the generated code calls — keeps codegen trivial. */
  def eval(x: ArrayData): Long = {
    var acc = 0L; var i = 0
    while (i < x.numElements()) {
      val v = x.getLong(i); acc += v * v; i += 1
    }
    acc
  }
}

/** Exact Σ (aᵢ−bᵢ)² over two BIGINT arrays; null if lengths differ. */
case class QVecDist2(left: Expression, right: Expression)
    extends BinaryExpression with QVecTypes {

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "qvec_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L; var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i); acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
