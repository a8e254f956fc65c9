package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `vec_cosine` reaches pure SQL through SparkSessionExtensions: a session
  * built with the extension resolves the function in `spark.sql`, on the
  * same SparkContext as the shared test session.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("extension-registered vec_cosine works from pure SQL") {
    val base = spark // ensure the shared context exists
    val prior = SparkSession.getDefaultSession
    try {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val extended = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate() // new session over the existing SparkContext
      val r = extended.sql(
        """SELECT vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c1,
          |       vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |                  CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)) AS c0
          |""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1)) < 1e-12)
      // poly_hash: SQL result equals the reference JVM fold
      val h = extended.sql("SELECT poly_hash('spark') AS h, poly_hash('spark', 137, 998244353) AS h2").head()
      val ref = "spark".foldLeft(0L)((a, c) => (a * 131L + c.toInt) % 1000000007L)
      val ref2 = "spark".foldLeft(0L)((a, c) => (a * 137L + c.toInt) % 998244353L)
      assert(h.getLong(0) == ref && h.getLong(1) == ref2)
      // (no cross-session isolation assert: VecCosineSpec may have
      // registered the same name on the shared session in a full run)
      assert(base ne extended)
    } finally {
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
