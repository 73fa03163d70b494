package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `Engine.normalizeEventTime` must yield an identical TimestampType
  * column for every parquet encoding the testdata generator has used:
  * INT64 epoch-nanos (TIMESTAMP(NANOS) under the legacy nanosAsLong
  * flag), timestamp[us] without timezone metadata (TIMESTAMP_NTZ), and
  * an already-correct TimestampType. Watermarks reject NTZ, so getting
  * this wrong breaks every streaming query, not just the events scans.
  */
class EventTimeSpec extends SparkSpec {

  private val microsUtc = Seq(0L, 1704067200000000L, 1704067200123456L)

  test("long-nanos, NTZ, and timestamp encodings normalize identically") {
    import spark.implicits._

    val fromNanos = Engine.normalizeEventTime(
      microsUtc.map(_ * 1000L).toDF("ts"), "ts")
    val fromNtz = Engine.normalizeEventTime(
      microsUtc.toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")), "ts")
    val fromTs = Engine.normalizeEventTime(
      microsUtc.toDF("us").select(timestamp_micros(col("us")).as("ts")), "ts")

    for (df <- Seq(fromNanos, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType === TimestampType)
      val got = df.select(unix_micros(col("ts"))).as[Long].collect().toSeq
      assert(got === microsUtc)
    }
  }

  test("events table reads as TimestampType and supports watermarks") {
    val ev = Engine.table(spark, sf, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    // watermark analysis is where NTZ blows up — exercise it
    val s = ev.withWatermark("ts", "1 hour")
    assert(s.schema("ts").dataType === TimestampType)
  }
}
