package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming per-key admission quota: cross-batch counter persistence,
  * in-batch ascending-id admission, over-quota rows dropped in the
  * state function.
  */
class QuotaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("quota persists across micro-batches and admits smallest first") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = Streams.quotaAdmitStream(mem.toDS(), k = 3)
    val q = out.toDF("key", "id").writeStream.outputMode("append")
      .format("memory").queryName("quota_test").start()
    // batch 1: a gets 4 candidates (out of order), b gets 1
    mem.addData(("a", 9L), ("a", 2L), ("a", 7L), ("a", 5L), ("b", 1L))
    q.processAllAvailable()
    // batch 2: a is already full after 3 admits; b admits 2 more then
    // drops the rest
    mem.addData(("a", 1L), ("b", 8L), ("b", 3L), ("b", 6L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("quota_test").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // a: batch 1 admits its 3 smallest (2,5,7); the later, smaller id 1
    //    is REJECTED — admission is arrival-order quota, not global
    //    top-k
    assert(rows.filter(_._1 == "a") == Set(("a", 2L), ("a", 5L), ("a", 7L)))
    // b: 1 admitted in batch 1, then smallest two of batch 2
    assert(rows.filter(_._1 == "b") == Set(("b", 1L), ("b", 3L), ("b", 6L)))
  }
}
