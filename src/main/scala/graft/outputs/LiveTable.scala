package graft.outputs

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.Streams.Emit

/** Live-refreshing table sink over a retraction stream, like the
  * reference's live output (outputs/batch/live_output.go:77-204): keep
  * a count per distinct row, apply retractions (count 0 drops the row),
  * re-render on every batch.
  *
  * A terminal sink is driver-side by nature (so was the reference's);
  * the accumulated state is only as large as the *distinct visible
  * rows*, not the stream.
  */
class LiveTable {
  private val counts =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Long]

  def apply(batch: Seq[Emit]): Unit = batch.foreach { e =>
    val k = (e.key, e.value)
    val next = counts.getOrElse(k, 0L) + (if (e.retraction) -1L else 1L)
    if (next <= 0L) counts.remove(k) else counts.update(k, next)
  }

  /** Render the visible rows as an aligned text table, sorted by key
    * (the reference renders its btree in order).
    */
  def render(): String = {
    val rows = counts.keys.toSeq.sorted
    val header = f"${"key"}%-12s value"
    (header +: rows.map { case (k, v) => f"$k%-12s $v" }).mkString("\n")
  }

  def visibleRows: Map[(String, Long), Long] = counts.toMap
}

object LiveTable {

  /** Attach a live table to a retraction stream; `onRender` receives
    * the refreshed table text after every micro-batch (the reference
    * caps redraws at 4/s; micro-batch cadence plays that role here).
    */
  def run(emits: Dataset[Emit], queryName: String = "graft_live")
         (onRender: String => Unit): (LiveTable, StreamingQuery) = {
    val table = new LiveTable
    val q = emits.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Emit], _: Long) =>
        table.apply(batch.collect().toSeq)
        onRender(table.render())
      }
      .queryName(queryName)
      .start()
    (table, q)
  }
}
