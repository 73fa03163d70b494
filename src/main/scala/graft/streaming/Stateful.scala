package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Per-contributor emission cap on a stream — the "at most N documents
  * per source/user" admission policy a training-data ingest stream
  * applies — written against Spark 4's arbitrary-state API
  * (`transformWithState` / [[StatefulProcessor]]), the successor to
  * `flatMapGroupsWithState` the rest of the streaming surface already
  * exercises.
  *
  * State: one Long per key (the RocksDB state store keeps it off-heap,
  * hash-partitioned by key across executors). Rows beyond the cap are
  * dropped forever — the counter never resets, which is the point:
  * bounded per-contributor influence over the whole stream lifetime.
  * A TTL could age the cap out via [[TTLConfig]]; the admission test
  * pins the non-TTL contract.
  */
class PerKeyCap(cap: Long)
    extends StatefulProcessor[Long, (Long, String), (Long, String)] {
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                               tv: TimerValues): Iterator[(Long, String)] = {
    var n = if (seen.exists()) seen.get() else 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    rows.foreach { r => if (n < cap) { n += 1; out += r } }
    seen.update(n)
    out.iterator
  }
}
