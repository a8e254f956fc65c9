package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VectorFns.quantize

/** [[VectorIndex]]'s scale contract is that encode/assign are pure
  * projections against broadcast-literal index state — which makes them
  * valid micro-batch transforms with NO streaming-specific code. This spec
  * pins that: the same `encode`/`assignCells` calls run over a parquet
  * `readStream` produce byte-identical codes/err/cell to the batch run —
  * the "train the index offline, apply it to the ingest stream" deployment
  * shape of a production embedding pipeline.
  */
class VectorIndexStreamingSpec extends AnyFunSuite with SparkTestBase {

  test("PQ encode + IVF cell assignment are batch/stream identical") {
    val dir = Files.createTempDirectory("vidx-stream").toString
    PlantedEmbeddings.write(spark, dir)
    val src = s"$dir/embeddings.parquet"

    val raw = spark.read.parquet(src)
    val batch = raw.select(col("vec_id"), quantize(col("embedding")).as("v"))
    val cb = VectorIndex.codebook(batch)
    val cents = VectorIndex.centroids(batch)

    def key(rows: Array[org.apache.spark.sql.Row]): Seq[(Long, Seq[Int], Long, Long)] =
      rows.map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq

    val expected = key(
      VectorIndex.assignCells(VectorIndex.encode(batch, cb), cents)
        .select(col("vec_id"), col("codes"), col("err"), col("cell")).collect())

    val stream = spark.readStream.schema(raw.schema).parquet(src)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
    val q = VectorIndex.assignCells(VectorIndex.encode(stream, cb), cents)
      .select(col("vec_id"), col("codes"), col("err"), col("cell"))
      .writeStream.format("memory").queryName("vidx_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = key(spark.table("vidx_stream").collect())
    assert(got.size == expected.size && got == expected,
      s"stream/batch divergence: ${got.size} vs ${expected.size} rows")
  }
}
