package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{PolyHash, VecCosine}

/** SparkSessionExtensions entry point: makes the engine's native Catalyst
  * expressions available to PURE SQL users —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) registers:
  *
  *   - `vec_cosine(a, b)` — the whole-stage-codegen cosine over two
  *     `ARRAY<FLOAT>` columns ([[graft.functions.VecCosine]]), so SQL-only
  *     similarity queries get the tight primitive loop instead of a
  *     higher-order-function chain.
  *   - `poly_hash(s[, base, mod])` — the cross-engine character-polynomial
  *     hash ([[graft.functions.PolyHash]]) under the dedup family,
  *     defaulting to the [[graft.functions.CrossHash]] base/modulus.
  *
  * This is the (c) extension path of SURVEY.md §4.2 made concrete at its
  * smallest useful size: no custom rules or strategies are needed (the
  * built-in planner handles every declared operator), but the extension
  * hook is wired and spec-tested so new expressions drop in at zero cost.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vec_cosine takes 2 arguments, got ${children.length}")
        VecCosine(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        def lit(e: Expression): Long = e match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"poly_hash base/mod must be integer literals, got $other")
        }
        children match {
          case Seq(s) => PolyHash(s, 131L, graft.functions.CrossHash.P1)
          case Seq(s, b, m) => PolyHash(s, lit(b), lit(m))
          case _ => throw new IllegalArgumentException(
            s"poly_hash takes 1 or 3 arguments, got ${children.length}")
        }
      }))
  }
}
