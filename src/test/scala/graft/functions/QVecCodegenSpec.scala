package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins that the QVec kernels actually COMPILE under whole-stage codegen.
  *
  * This is the failure class hash-green correctness cannot catch: round 6
  * shipped a `QVecNorm2.doGenCode` that referenced a companion-object
  * `eval` for which Scala emits no static forwarder — janino failed to
  * resolve it, the WHOLE generated stage failed to compile, and Spark
  * silently fell back to interpreted execution for every plan containing a
  * top-level `qvec_norm2` (the ANN family's hottest stages), with results
  * staying bit-identical. A plan-string check ("*(1) Project") does not
  * catch this either: the codegen markers are printed before compilation,
  * and the fallback happens at runtime inside `WholeStageCodegenExec`.
  *
  * The reliable pin is `spark.sql.codegen.fallback=false`: with fallback
  * disabled, a janino compile failure propagates and fails the query, so
  * "executes and returns the right values" proves the stage compiled.
  */
class QVecCodegenSpec extends AnyFunSuite with SparkTestBase {

  private def withNoCodegenFallback[T](body: => T): T = {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  test("all three kernels compile inside a whole-stage codegen stage") {
    withNoCodegenFallback {
      import spark.implicits._
      val df = Seq(
        (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
        (Array(-200000000L, 200000000L), Array(200000000L, -200000000L)),
        (Array.empty[Long], Array.empty[Long])
      ).toDF("a", "b")
        // without this, ConvertToLocalRelation folds the projection at
        // optimize time and no codegen stage exists to compile
        .repartition(2)
      val q = df.select(
        VectorFns.qdot($"a", $"b").as("d"),
        VectorFns.qnorm2($"a").as("n"),
        VectorFns.qdist2($"a", $"b").as("l"))
      // materialize FIRST (fallback=false turns a janino failure into a
      // thrown exception here), then check the final adaptive plan — AQE
      // only instantiates the codegen stages on execution
      val rows = q.collect().sortBy(r => if (r.isNullAt(1)) -1L else r.getLong(1))
      // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
      val finalPlan = q.queryExecution.executedPlan.toString
      assert(finalPlan.contains("*(1) Project [qvec_dot"), finalPlan)
      assert(rows.length == 3)
      assert(rows(0).getLong(0) == 0L && rows(0).getLong(1) == 0L && rows(0).getLong(2) == 0L)
      assert(rows(1).getLong(0) == 32L && rows(1).getLong(1) == 14L && rows(1).getLong(2) == 27L)
    }
  }

  test("coarse_probe compiles inside a whole-stage codegen stage") {
    withNoCodegenFallback {
      import org.apache.spark.sql.graftbridge.Bridge
      import spark.implicits._
      val groups = CoarseProbeKernel.pack(Array(
        (0L, Array(1L, 0L), 1L),
        (1L, Array(0L, 1L), 1L),
        (2L, Array(1L, 1L), 2L)))
      val bc = spark.sparkContext.broadcast(groups)
      val df = Seq(
        (1L, Array(10L, 0L), 100L),
        (2L, Array(0L, 7L), 49L),
        (3L, Array(5L, 5L), 50L)
      ).toDF("vec_id", "v", "n2").repartition(2)
      val q = df.select($"vec_id",
        Bridge.column(CoarseProbe(
          Bridge.expression($"v"), Bridge.expression($"n2"), bc, 2)).as("g"))
      val got = q.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      val finalPlan = q.queryExecution.executedPlan.toString
      assert(finalPlan.contains("*(1) Project"), finalPlan)
      assert(finalPlan.contains("coarse_probe"), finalPlan)
      // row 1 is the x-axis: group 0 (cos 1), then the diagonal group 2
      assert(got(1L) == Vector(0L, 2L))
      assert(got(2L) == Vector(1L, 2L))
      // the diagonal row: group 2 is parallel (cos 1); groups 0 and 1 tie
      // at equal cosine and the tie breaks to the smaller gid
      assert(got(3L) == Vector(2L, 0L))
    }
  }

  test("null handling compiles and matches interpreted semantics") {
    withNoCodegenFallback {
      // length mismatch and null ELEMENTS both yield null, from generated
      // code, including the pure-SQL literal case ADVICE flagged (non-null
      // children + nullable result used to emit `false = true;` pre-fix)
      QVecSql.register(spark)
      val r = spark.sql(
        "SELECT qvec_dot(array(1L,2L), array(1L,2L,3L)) AS mm, " +
          "qvec_dot(array(1L, CAST(null AS BIGINT)), array(3L,4L)) AS ne, " +
          "qvec_norm2(array(1L, CAST(null AS BIGINT))) AS nn, " +
          "qvec_dist2(array(1L, CAST(null AS BIGINT)), array(3L,4L)) AS nd, " +
          "qvec_dot(array(1L,2L), array(3L,4L)) AS ok").head()
      assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      assert(r.getLong(4) == 11L)
    }
  }
}
