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

  test("delay trigger fires on key quiescence with retractions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Streams.delayTriggerCounts(mem.toDS(), delayMs = 300L)
    // paced trigger: timer expiry is detected by the next scheduled
    // batch — an unpaced (ASAP) trigger would busy-loop no-data
    // batches while waiting on the processing-time timers
    val q = out.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .format("memory").queryName("dt_test").start()
    def rows() = spark.table("dt_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    def await(pred: => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 60000 // generous: full-suite load once blew a 20 s budget
      while (!pred && System.currentTimeMillis < deadline) Thread.sleep(50)
    }
    mem.addData("a", "a", "b")
    // nothing until the keys go quiet for the delay; then both fire
    await(rows().length >= 2)
    assert(rows().toSet == Set(("a", 2L, false), ("b", 1L, false)),
      rows().mkString(","))
    // more data on a fired key re-arms it; the next quiescence
    // retracts the old value and emits the new one
    mem.addData("a")
    await(rows().count(_._1 == "a") >= 3)
    q.stop()
    val as = rows().filter(_._1 == "a").toSet
    assert(as == Set(("a", 2L, false), ("a", 2L, true), ("a", 3L, false)),
      as.mkString(","))
    // a quiet-but-unchanged key ("b") never re-fires
    assert(rows().count(_._1 == "b") == 1, rows().mkString(","))
  }

  test("delay trigger with state TTL evicts dormant keys (count restarts)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Streams.delayTriggerCounts(mem.toDS(), delayMs = 200L,
      stateTtlMs = 400L)
    val q = out.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .format("memory").queryName("dt_ttl_test").start()
    def rows() = spark.table("dt_ttl_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    def await(pred: => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 60000 // generous: full-suite load once blew a 20 s budget
      while (!pred && System.currentTimeMillis < deadline) Thread.sleep(50)
    }
    mem.addData("a", "a")
    await(rows().nonEmpty)
    assert(rows().toSet == Set(("a", 2L, false)), rows().mkString(","))
    // let the TTL evict the dormant key, then send fresh data: the
    // count restarts from 0 and nothing is retracted — the documented
    // TTL semantics tradeoff
    Thread.sleep(900)
    mem.addData("a")
    await(rows().length >= 2)
    q.stop()
    assert(rows().toSet == Set(("a", 2L, false), ("a", 1L, false)),
      rows().mkString(","))
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
