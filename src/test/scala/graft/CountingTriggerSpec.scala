package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** TRIGGER COUNTING n semantics: re-fire per-key aggregates every n
  * records, retracting the previous emission (SURVEY §2.11).
  */
class CountingTriggerSpec extends SparkSpec {
  import spark.implicits._

  test("counting trigger emits every n records with retractions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Streams.countingTriggerCounts(mem.toDS(), n = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ct_test").start()
    mem.addData("a", "a", "a", "b")
    q.processAllAvailable()
    mem.addData("a", "b")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ct_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // a: count hits 2 → +2; count hits 4 → -2, +4. b: count hits 2 → +2.
    assert(rows.count(_._1 == "a") == 3)
    assert(rows.contains(("a", 2L, false)))
    assert(rows.contains(("a", 2L, true)))
    assert(rows.contains(("a", 4L, false)))
    assert(rows.filter(_._1 == "b").toSeq == Seq(("b", 2L, false)))
  }

  test("stream_native formatting renders +/- records") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Streams.formatRetractions(Streams.countingTriggerCounts(mem.toDS(), n = 1))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ct_fmt").start()
    mem.addData("x", "x")
    q.processAllAvailable()
    q.stop()
    val recs = spark.table("ct_fmt").collect().map(_.getString(0)).toSet
    assert(recs == Set("+|x|1", "-|x|1", "+|x|2"))
  }

  test("DataFrame counting trigger over real key columns") {
    val events = Engine.table(spark, sf, "events").limit(200)
    // batch DataFrame through the same state machine via a memory stream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val types = events.select("event_type").as[String].collect()
    val mem = MemoryStream[String]
    val out = Streams.countingTriggerCounts(mem.toDS(), n = 20)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ct_df").start()
    mem.addData(types.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("ct_df")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // every emission is a multiple of 50, retractions pair with re-fires
    assert(emitted.nonEmpty)
    assert(emitted.forall(_._2 % 20 == 0))
  }
}
