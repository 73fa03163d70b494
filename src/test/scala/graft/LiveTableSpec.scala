package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.outputs.LiveTable
import graft.streaming.Streams

class LiveTableSpec extends SparkSpec {
  import spark.implicits._

  test("live table applies retractions: only latest per-key counts remain") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val emits = Streams.countingTriggerCounts(mem.toDS(), n = 1)
    val renders = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val (table, q) = LiveTable.run(emits, "live_spec")(renders.add(_))
    mem.addData("a", "a", "b")
    q.processAllAvailable()
    mem.addData("a")
    q.processAllAvailable()
    q.stop()
    // a reached 3 (1,2 retracted), b reached 1
    assert(table.visibleRows == Map(("a", 3L) -> 1L, ("b", 1L) -> 1L))
    assert(renders.size() >= 1)
    val last = renders.get(renders.size() - 1)
    assert(last.contains("a") && last.contains("3"))
    assert(!last.contains("2"))
  }

  test("distinctStream emits on first arrival and retracts on last withdrawal") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Boolean)]
    val out = Streams.distinctStream(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dist_spec").start()
    mem.addData(("x", false), ("x", false), ("y", false))
    q.processAllAvailable()
    mem.addData(("x", true)) // one withdrawal: x still present (count 1)
    q.processAllAvailable()
    mem.addData(("x", true)) // last withdrawal: x retracted
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dist_spec").collect()
      .map(r => (r.getString(0), r.getBoolean(2))).toSeq
    assert(rows.count(_ == ("x", false)) == 1) // emitted once despite dup
    assert(rows.count(_ == ("x", true)) == 1)  // retracted exactly once
    assert(rows.count(_ == ("y", false)) == 1)
  }
}
