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

/** Exact Σ aᵢ·bᵢ over two BIGINT arrays; null if lengths differ or any
  * element is null (matching `aggregate(zip_with(...))`, where a null
  * element poisons the running sum).
  */
case class QVecDot(left: Expression, right: Expression)
    extends BinaryExpression with QVecTypes {

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  // Length mismatch / null elements yield null even for non-nullable
  // children (e.g. two array literals in pure SQL via qvec_dot).
  override def nullable: Boolean = true
  override def prettyName: String = "qvec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i); i += 1
    }
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
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Exact Σ aᵢ² over a BIGINT array; null if any element is null (matching
  * `aggregate(transform(...))`).
  *
  * Codegen inlines the loop directly — an earlier revision called a
  * companion-object `eval` helper, but Scala emits no static forwarder for
  * it (the case class inherits `Expression.eval(InternalRow)` under the
  * same name), so janino failed to resolve the call and the ENTIRE
  * containing stage silently fell back to interpreted execution.
  * QVecCodegenSpec pins compilation so this class of bug cannot recur.
  */
case class QVecNorm2(child: Expression)
    extends UnaryExpression with QVecTypes {

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArrays(Seq(child.dataType))
  override def dataType: DataType = LongType
  // A null element yields null even for a non-nullable child.
  override def nullable: Boolean = true
  override def prettyName: String = "qvec_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0L; var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i); acc += v * v; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $v = $a.getLong($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact Σ (aᵢ−bᵢ)² over two BIGINT arrays; null if lengths differ or any
  * element is null.
  */
case class QVecDist2(left: Expression, right: Expression)
    extends BinaryExpression with QVecTypes {

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArrays(Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  // Length mismatch / null elements yield null even for non-nullable children.
  override def nullable: Boolean = true
  override def prettyName: String = "qvec_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
