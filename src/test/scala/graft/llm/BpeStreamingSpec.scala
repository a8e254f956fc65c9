package graft.llm

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** BPE serving parity: [[LlmQueries.bpeTokenize]] joins the stream
  * against the STATIC trained histogram (stream-static join + stateful
  * agg), so the same call over a parquet `readStream` must produce the
  * identical per-doc token counts as the batch run — the "train the
  * tokenizer offline, meter the ingest stream" deployment shape, the
  * tokenizer sibling of VectorIndexStreamingSpec's encode/assign parity.
  */
class BpeStreamingSpec extends AnyFunSuite with SparkTestBase {

  test("bpeTokenize is batch/stream identical") {
    val dir = "/root/testdata/sf0.001"
    val src = s"$dir/documents.parquet"
    val raw = spark.read.parquet(src)

    def key(rows: Array[Row]): Seq[(Long, Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

    val expected = key(LlmQueries.bpeTokenize(spark, dir, raw).collect())
    assert(expected.nonEmpty)

    // the streaming file source wants a directory; re-write the
    // single-file driver parquet as a directory-shaped copy
    val streamDir = java.nio.file.Files.createTempDirectory("bpe-stream").toString
    raw.write.mode("overwrite").parquet(s"$streamDir/docs")
    val stream = spark.readStream.schema(raw.schema).parquet(s"$streamDir/docs")
    val q = LlmQueries.bpeTokenize(spark, dir, stream)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = key(spark.table("bpe_stream").collect())
    assert(got == expected,
      s"stream/batch divergence: ${got.size} vs ${expected.size} rows")
  }
}
