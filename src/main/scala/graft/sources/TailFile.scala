package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Single-file in-place append tail as a DataSource v2 micro-batch
  * stream — the reference's `tail -f` semantics
  * (execution/files/files.go:27-76): the SAME file is followed by byte
  * offset, so appends to an already-seen file surface as new rows.
  * (Spark's built-in file stream is new-FILE granularity — it covers
  * the rotating-log layout, [[PathTable.tailLines]] routes globs there.)
  *
  * Offsets are `(bytes, lines)`: `latestOffset` stats the file and
  * advances only to the last COMPLETE line (a partial line mid-write is
  * left for the next batch, like the reference's line scanner), and
  * carries the running line count so rows keep the lines-table
  * `number` ordinal. Truncation (length < offset) holds position, as
  * `tail -f` without `--retry` does.
  */
class TailFileProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailFile.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TailFileTable(properties.get("path"))
}

object TailFile {
  val schema: StructType = StructType(Seq(
    StructField("number", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))
}

class TailFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tail:$path"
  override def schema(): StructType = TailFile.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TailFile.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TailFileStream(path)
      }
    }
}

/** `{"bytes":N,"lines":M}` — the followed position. */
case class TailOffset(bytes: Long, lines: Long) extends Offset {
  override def json(): String = s"""{"bytes":$bytes,"lines":$lines}"""
}

object TailOffset {
  private val Re = """\{"bytes":(\d+),"lines":(\d+)\}""".r
  def parse(json: String): TailOffset = json match {
    case Re(b, l) => TailOffset(b.toLong, l.toLong)
    case other => throw new IllegalArgumentException(s"bad tail offset: $other")
  }
}

object TailFileStream {
  /** Per-micro-batch read cap: bounds driver/executor memory and keeps
    * the byte-range arithmetic safely inside Int.
    */
  val MaxBatchBytes: Long = 128L * 1024 * 1024
}

class TailFileStream(path: String) extends MicroBatchStream {

  private var last = TailOffset(0L, 0L)

  override def initialOffset(): Offset = TailOffset(0L, 0L)

  override def latestOffset(): Offset = {
    val f = new java.io.File(path)
    val len = if (f.isFile) f.length() else 0L
    if (len > last.bytes) {
      // advance to the last complete line in the appended region,
      // counting newlines for the running `number` ordinal. The scan
      // streams through a 64 KB buffer (O(1) memory for any backlog)
      // and stops after MaxBatchBytes ONCE a newline has been seen —
      // but keeps going while none has, so a single line longer than
      // the cap still completes (that batch then exceeds the cap by
      // the line's tail instead of stalling forever).
      val raf = new RandomAccessFile(path, "r")
      try {
        raf.seek(last.bytes)
        val chunk = new Array[Byte](64 * 1024)
        var pos = last.bytes
        var lastNl = -1L
        var count = 0L
        var done = false
        while (!done && pos < len) {
          val want = math.min(chunk.length.toLong, len - pos).toInt
          val n = raf.read(chunk, 0, want)
          if (n <= 0) done = true
          else {
            var i = 0
            while (i < n) {
              if (chunk(i) == '\n') { lastNl = pos + i; count += 1 }
              i += 1
            }
            pos += n
            if (lastNl >= 0 && pos - last.bytes >= TailFileStream.MaxBatchBytes)
              done = true
          }
        }
        if (lastNl >= 0)
          last = TailOffset(lastNl + 1, last.lines + count)
      } finally raf.close()
    }
    last
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset]
    val e = end.asInstanceOf[TailOffset]
    if (e.bytes <= s.bytes) Array.empty
    else Array(TailPartition(path, s.bytes, e.bytes, s.lines))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[TailPartition]
        new TailReader(p)
      }
    }

  override def deserializeOffset(json: String): Offset = {
    val o = TailOffset.parse(json)
    // checkpoint restart: resume following from the recovered position
    if (o.bytes > last.bytes) last = o
    o
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class TailPartition(path: String, startByte: Long, endByte: Long,
                         startLine: Long) extends InputPartition

class TailReader(p: TailPartition) extends PartitionReader[InternalRow] {
  private val lines: Array[String] = {
    val raf = new RandomAccessFile(p.path, "r")
    try {
      raf.seek(p.startByte)
      val buf = new Array[Byte]((p.endByte - p.startByte).toInt)
      raf.readFully(buf)
      // the region ends at a '\n' by construction → drop the trailing
      // ""; strip a trailing '\r' so CRLF files match the batch lines
      // source (Hadoop's line reader strips it too)
      val parts = new String(buf, StandardCharsets.UTF_8).split("\n", -1)
      parts.dropRight(1).map(s => if (s.endsWith("\r")) s.dropRight(1) else s)
    } finally raf.close()
  }
  private var i = -1
  override def next(): Boolean = { i += 1; i < lines.length }
  override def get(): InternalRow =
    InternalRow(p.startLine + i, UTF8String.fromString(lines(i)))
  override def close(): Unit = ()
}
