package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: cosine similarity of two `ARRAY<FLOAT>`
  * embedding columns, with whole-stage codegen (`doGenCode` emits a tight
  * primitive loop over the packed float arrays — no boxing, no lambda
  * dispatch per element, unlike the `zip_with`/`aggregate` higher-order
  * formulation in [[VectorFns]]).
  *
  * This is the preference-order step (b) of SURVEY.md §4.2 — a custom
  * `Expression` for the one scalar in the ANN hot path that built-ins can't
  * express efficiently; everything else in the engine stays on built-in
  * functions. Returns NaN for zero-norm inputs, null on null/length-mismatch
  * inputs (standard SQL null propagation).
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_cosine requires two ARRAY<FLOAT> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    if (x.length != y.length) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VecCosine {
  /** Column-API entry point. */
  def vec_cosine(a: Column, b: Column): Column =
    Bridge.column(VecCosine(Bridge.expression(a), Bridge.expression(b)))

  /** Register `vec_cosine` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => VecCosine(exprs.head, exprs(1)), "built-in")
}

/** Session registration for the exact-integer kernels, mirroring
  * [[VecCosine.register]] — `qvec_dot` / `qvec_norm2` / `qvec_dist2` over
  * `ARRAY<BIGINT>` in pure SQL.
  */
object QVecSql {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "qvec_dot", exprs => QVecDot(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "qvec_norm2", exprs => QVecNorm2(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "qvec_dist2", exprs => QVecDist2(exprs.head, exprs(1)), "built-in")
  }
}

/** SparkSessionExtensions hook: `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` (or `.withExtensions`) injects the
  * engine's native functions into every session.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => VecCosine(exprs.head, exprs(1))))
    Seq(
      ("qvec_dot", classOf[QVecDot].getName,
        (exprs: Seq[Expression]) => QVecDot(exprs.head, exprs(1))),
      ("qvec_norm2", classOf[QVecNorm2].getName,
        (exprs: Seq[Expression]) => QVecNorm2(exprs.head)),
      ("qvec_dist2", classOf[QVecDist2].getName,
        (exprs: Seq[Expression]) => QVecDist2(exprs.head, exprs(1)))
    ).foreach { case (name, cls, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls, name), builder))
    }
  }
}
