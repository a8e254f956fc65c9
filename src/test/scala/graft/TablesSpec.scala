package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.events` must surface `ts` as TimestampType (µs, UTC) no matter
  * how the parquet writer declared it — the three shapes in the wild:
  * timestamp[ns] (the driver's generator; Spark reads it as LongType under
  * legacy nanosAsLong), timestamp[µs] adjusted-to-UTC (Spark's own writer),
  * and timestamp[µs] WITHOUT isAdjustedToUTC (DuckDB COPY, pandas, most
  * non-Spark ETL → Spark reads TIMESTAMP_NTZ). The NTZ case broke five
  * event queries at the sf1 gate before the normalization existed.
  */
class TablesSpec extends AnyFunSuite with SparkTestBase {

  test("events normalizes TIMESTAMP_NTZ parquet to TimestampType, instant-preserving") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ntz-events").toString
    val micros = 1704067200000000L + 123456L // 2024-01-01 00:00:00.123456 UTC
    spark.range(3).select(
        $"id".as("event_id"),
        timestamp_micros(lit(micros) + $"id").cast(TimestampNTZType).as("ts"),
        $"id".as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.orderBy($"event_id")
      .select(unix_micros($"ts")).as[Long].collect().toSeq
    assert(got === Seq(micros, micros + 1, micros + 2))
  }
}
