package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

/** JSONL (newline-delimited JSON) corpus interchange — the de-facto LLM
  * training-corpus format. Spark's native json source IS JSONL (one object
  * per line, splittable at any line boundary, so a 100 TB corpus scans with
  * one task per split like parquet — just without column pruning/pushdown,
  * which is why the pipeline's canonical storage stays parquet/shardpack
  * and JSONL is the ingest/export boundary).
  */
class JsonlSourceSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("documents round-trip through JSONL losslessly with an explicit schema") {
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    docs.write.mode("overwrite").json(dir)
    // explicit schema: JSONL carries no types, inference would widen ints —
    // the read contract at scale is always schema-first
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JSONL read composes with the relational surface (filter + agg parity)") {
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    def rollup(d: org.apache.spark.sql.DataFrame) =
      d.filter(length(col("text")) >= 100).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang")).collect().toSeq
    assert(rollup(back) == rollup(docs))
  }
}
