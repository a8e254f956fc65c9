package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VecCosine

/** SparkSessionExtensions entry point: makes the engine's native Catalyst
  * expressions available to PURE SQL users —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) registers:
  *
  *   - `vec_cosine(a, b)` — the whole-stage-codegen cosine over two
  *     `ARRAY<FLOAT>` columns ([[graft.functions.VecCosine]]), so SQL-only
  *     similarity queries get the tight primitive loop instead of a
  *     higher-order-function chain.
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
  }
}
