package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The per-row kernel of [[graft.llm.VectorIndex.assignCellsJoin]]'s
  * coarse-quantizer probe, held outside the expression so generated code
  * can call it through the object's static forwarder (the QVecNorm2
  * lesson: a name that collides with an inherited member gets no
  * forwarder and silently de-compiles the whole stage).
  */
object CoarseProbeKernel {

  /** The broadcast coarse-quantizer state as parallel primitive arrays —
    * one unboxed struct per executor instead of a Tuple3 per group per
    * row.
    */
  final case class Groups(gids: Array[Long], vecs: Array[Array[Long]],
      n2s: Array[Long])

  def pack(coarse: Array[(Long, Array[Long], Long)]): Groups =
    Groups(coarse.map(_._1), coarse.map(_._2), coarse.map(_._3))

  /** Top-`probe` group ids by descending cosine, ties to the smaller gid
    * — the EXACT (cos, −gid) order of the probeUdf closure this replaces
    * (CellAssignCutoverSpec pins A/B row-identity): same Double op order
    * (dot → /(√n2·√gn2)), same total ordering on doubles
    * (`java.lang.Double.compare`, what Scala's tuple `.sorted` used).
    * Selection is repeated-min (O(probe·K1), zero allocation beyond the
    * output) instead of a full sort — identical output because the
    * comparator is a total order.
    */
  def topGids(g: Groups, v: ArrayData, n2: Long, probe: Int): ArrayData = {
    val va = v.toLongArray()
    val n = g.gids.length
    val negCos = new Array[Double](n)
    var i = 0
    while (i < n) {
      val gv = g.vecs(i)
      var dot = 0L
      var j = 0
      while (j < va.length) { dot += va(j) * gv(j); j += 1 }
      negCos(i) = -(dot.toDouble /
        (math.sqrt(n2.toDouble) * math.sqrt(g.n2s(i).toDouble)))
      i += 1
    }
    val k = math.min(probe, n)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < k) {
      var best = -1
      var i2 = 0
      while (i2 < n) {
        if (!taken(i2)) {
          if (best < 0) best = i2
          else {
            val c = java.lang.Double.compare(negCos(i2), negCos(best))
            if (c < 0 || (c == 0 && g.gids(i2) < g.gids(best))) best = i2
          }
        }
        i2 += 1
      }
      taken(best) = true
      out(r) = g.gids(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for the coarse-probe argmax on the
  * cell-assignment cutover path: `(v ARRAY<BIGINT>, n2 BIGINT) →
  * ARRAY<BIGINT>` of the row's top-`probe` coarse-group ids, scored
  * against the BROADCAST group state (an `addReferenceObj` handle — never
  * a plan literal, which is the whole point of the frame-held-centroid
  * path). Replaces the interpreted per-row ScalaUDF (`probeUdf`): no
  * encoder boxing per element, and top-level uses stay inside whole-stage
  * codegen. The branch only engages past 65536 centroids ≈ 130M+
  * embeddings, exactly where per-row interpreted overhead matters most.
  */
case class CoarseProbe(left: Expression, right: Expression,
    bc: Broadcast[CoarseProbeKernel.Groups], probe: Int)
    extends BinaryExpression {

  require(probe > 0, "coarse_probe needs probe >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"coarse_probe requires (ARRAY<BIGINT>, BIGINT), got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "coarse_probe"

  override def nullSafeEval(v: Any, n2: Any): Any =
    CoarseProbeKernel.topGids(bc.value, v.asInstanceOf[ArrayData],
      n2.asInstanceOf[Long], probe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n2) => {
      val ref = ctx.addReferenceObj("coarseProbeBc", bc,
        classOf[Broadcast[CoarseProbeKernel.Groups]].getName)
      s"""
         |${ev.value} = graft.functions.CoarseProbeKernel.topGids(
         |  (graft.functions.CoarseProbeKernel.Groups) $ref.value(), $v, $n2, $probe);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
