package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.RowStreams
import graft.streaming.RowStreams._

/** Generic (arbitrary Row schema / multi-column key / multiple
  * aggregates) retraction operators — the round-1 versions were
  * String/Long-typed (VERDICT backlog item).
  */
class RowStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("counting trigger over a two-column key with sum+max aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, Long)]
    val df = mem.toDF().toDF("lang", "bucket", "v")
    val out = RowStreams.countingTriggerAgg(df, Seq("lang", "bucket"), n = 2,
      Seq(CountAgg("n"), SumLongAgg("v", "sum_v"), MaxLongAgg("v", "max_v")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rt_agg").start()
    mem.addData(("en", 1, 10L), ("en", 1, 5L), ("en", 2, 7L), ("en", 1, 100L))
    q.processAllAvailable()
    mem.addData(("en", 1, 1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rt_agg").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // (en,1): n=2 → +(2, 15, 10); n=4 → -(2, 15, 10), +(4, 116, 100)
    assert(rows.contains(("en", 1, 2L, 15L, 10L, false)))
    assert(rows.contains(("en", 1, 2L, 15L, 10L, true)))
    assert(rows.contains(("en", 1, 4L, 116L, 100L, false)))
    // (en,2) has 1 record: nothing fires
    assert(!rows.exists(r => r._2 == 2))
  }

  test("outer join over Row schemas retracts null paddings on late match") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, Long, String)]
    val rMem = MemoryStream[(String, Double)]
    val left = lMem.toDF().toDF("k", "lv", "tag")
    val right = rMem.toDF().toDF("k", "rv")
    val out = RowStreams.outerJoinRows(left, right, Seq("k"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rt_join").start()
    lMem.addData(("a", 1L, "x"))
    q.processAllAvailable()
    rMem.addData(("a", 2.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rt_join").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getBoolean(4)))
    // +(a,1,x,null) ; then retraction of the padding and the real join
    assert(rows.contains((Some("a"), Some(1L), Some("x"), None, false)))
    assert(rows.contains((Some("a"), Some(1L), Some("x"), None, true)))
    assert(rows.contains((Some("a"), Some(1L), Some("x"), Some(2.5), false)))
  }

  test("distinct over whole rows with upstream retractions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Boolean)]
    val df = mem.toDF().toDF("k", "v", "retraction")
    val out = RowStreams.distinctRows(df)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rt_distinct").start()
    mem.addData(("a", 1L, false), ("a", 1L, false), ("b", 2L, false))
    q.processAllAvailable()
    mem.addData(("a", 1L, true)) // multiset 2→1: still present, no emission
    q.processAllAvailable()
    mem.addData(("a", 1L, true)) // 1→0: retract
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rt_distinct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.toSeq.count(_ == ("a", 1L, false)) == 1)
    assert(rows.contains(("b", 2L, false)))
    assert(rows.contains(("a", 1L, true)))
  }

  test("counting-trigger retractions on a union-typed (VARIANT) key") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    // the same value 7 arrives as Int (even ordinals) and as String
    // (odd ordinals): the union type distinction must keep TWO state
    // keys, and retraction emission must round-trip the VARIANT value
    val df = mem.toDF().select(
      when(col("value") % 2 === 0, parse_json(lit("7")))
        .otherwise(parse_json(lit("\"7\""))).as("v"))
    val out = RowStreams.countingTriggerAgg(df, Seq("v"), n = 2,
        Seq(RowStreams.CountAgg()))
      .select(to_json(col("v")).as("vj"), col("count"), col("retraction"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rt_variant_ct").start()
    mem.addData(0L, 1L, 2L, 3L) // int-7 x2, str-7 x2 -> both fire at 2
    q.processAllAvailable()
    mem.addData(4L, 6L) // int-7 reaches 4 -> retract 2, emit 4
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rt_variant_ct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(rows.contains(("7", 2L, false)))
    assert(rows.contains(("\"7\"", 2L, false)))
    assert(rows.contains(("7", 2L, true)))
    assert(rows.contains(("7", 4L, false)))
    // the STRING key never went past 2: no retraction for it
    assert(rows.filter(_._1 == "\"7\"") == Seq(("\"7\"", 2L, false)))
  }
}
