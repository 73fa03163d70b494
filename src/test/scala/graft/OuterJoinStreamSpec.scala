package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import graft.streaming.Streams.JoinEmit

/** Reference outer-join retraction semantics (outer_join.go): null rows
  * emitted eagerly, withdrawn when a real match arrives.
  */
class OuterJoinStreamSpec extends SparkSpec {
  import spark.implicits._

  test("full outer join retracts null-padded rows when the match arrives") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(String, Long)]
    val r = MemoryStream[(String, Long)]
    val out = Streams.outerJoinStream(l.toDS(), r.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("oj_spec").start()

    l.addData(("a", 1L), ("b", 2L))
    q.processAllAvailable()
    r.addData(("a", 10L), ("c", 30L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("oj_spec").as[JoinEmit].collect().toSeq

    // phase 1: left-only → null-padded emissions
    assert(rows.contains(JoinEmit("a", Some(1L), None, retraction = false)))
    assert(rows.contains(JoinEmit("b", Some(2L), None, retraction = false)))
    // phase 2: match for a → retraction of its null row + real joined row
    assert(rows.contains(JoinEmit("a", Some(1L), None, retraction = true)))
    assert(rows.contains(JoinEmit("a", Some(1L), Some(10L), retraction = false)))
    // right-only key c → null-padded on the left side, never retracted
    assert(rows.contains(JoinEmit("c", None, Some(30L), retraction = false)))
    assert(!rows.contains(JoinEmit("c", None, Some(30L), retraction = true)))
    // b never matched → its null row stands
    assert(!rows.contains(JoinEmit("b", Some(2L), None, retraction = true)))

    // net visible result (apply retractions) == batch full outer join
    val visible = rows.groupBy(e => (e.key, e.left, e.right))
      .view.mapValues(es => es.count(!_.retraction) - es.count(_.retraction))
      .filter(_._2 > 0).keys.toSet
    assert(visible == Set(
      ("a", Some(1L), Some(10L)),
      ("b", Some(2L), None),
      ("c", None, Some(30L))))
  }

  test("late left row joins existing right state directly (no null row)") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(String, Long)]
    val r = MemoryStream[(String, Long)]
    val out = Streams.outerJoinStream(l.toDS(), r.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("oj_spec2").start()
    r.addData(("k", 7L))
    q.processAllAvailable()
    l.addData(("k", 1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("oj_spec2").as[JoinEmit].collect().toSeq
    assert(rows.contains(JoinEmit("k", None, Some(7L), retraction = false)))
    assert(rows.contains(JoinEmit("k", None, Some(7L), retraction = true)))
    assert(rows.contains(JoinEmit("k", Some(1L), Some(7L), retraction = false)))
    assert(!rows.contains(JoinEmit("k", Some(1L), None, retraction = false)))
  }
}
