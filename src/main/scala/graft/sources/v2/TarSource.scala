package graft.sources.v2

import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Tar

/** DataSourceV2 connector for `.tar` WebDataset shards — the same
  * scale surface as [[WarcTableProvider]]: one input partition per
  * glob-matched shard file, required-column pushdown so a
  * names/sizes/offsets projection (`SELECT sample_key, size`) walks
  * only the 512-byte ustar headers via [[Tar.parseMeta]] — member
  * payloads are never copied, never UTF-8-decoded — and advisory
  * filter pushdown ([[SupportsPushDownFilters]]) so meta-field
  * predicates gate the payload slice per member: `WHERE ext = 'txt'`
  * over a WebDataset shard copies the .txt members' bytes and nobody
  * else's (every filter also returns as a post-scan residual, the
  * graft-warc discipline). WebDataset shards are mostly payload bytes,
  * so a catalog-style scan over thousands of shards reads ~0.1% of
  * what the full walk would.
  *
  * Corrupt shards (bad magic, checksum mismatch, truncated member)
  * fail loudly with the path. Usage:
  * `spark.read.format("graft-tar").load("shards/x*.tar")`.
  */
class TarTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-tar"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarSourceTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tar: path is required"))
    new TarSourceTable(path)
  }
}

object TarSourceTable {
  /** Same fields, order, and types as [[graft.sources.TarTable.TarRow]]. */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = true),
    StructField("member_idx", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("sample_key", StringType, nullable = true),
    StructField("ext", StringType, nullable = true),
    StructField("size", LongType, nullable = false),
    StructField("data_offset", LongType, nullable = false),
    StructField("data", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Fields carrying member PAYLOAD: absent from the projection, the
    * reader walks headers only.
    */
  val payloadFields: Set[String] = Set("data", "text")
}

class TarSourceTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_tar[$path]"
  override def schema(): StructType = TarSourceTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(path, WarcSourceTable.driverHadoopConf())
}

class TarScanBuilder(path: String,
                     conf: org.apache.spark.util.SerializableConfiguration)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = TarSourceTable.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val want = requiredSchema.fieldNames.toSet
    required = StructType(
      TarSourceTable.schema.fields.filter(f => want.contains(f.name)))
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // advisory, like graft-warc: meta-field predicates skip a member
    // BEFORE its payload is sliced/decoded; every filter is also
    // returned as a post-scan residual so Spark keeps exact semantics
    val meta = TarSourceTable.schema.fieldNames.toSet --
      TarSourceTable.payloadFields
    pushed = filters.filter(WarcFilters.supportedFor(_, meta.contains))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new TarScan(path, required, pushed, conf)
}

case class TarShardPartition(file: String) extends InputPartition

class TarScan(path: String, required: StructType,
              val pushed: Array[Filter],
              conf: org.apache.spark.util.SerializableConfiguration)
    extends Scan with Batch with SupportsReportStatistics {
  private lazy val shards: Seq[String] =
    WarcSourceTable.listShards(path, conf.value, "graft-tar")
  private lazy val totalBytes: Long = {
    val c = conf.value
    shards.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(c).getFileStatus(p).getLen
    }.sum
  }
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tar $path, columns=[${required.fieldNames.mkString(",")}], " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    shards.map(TarShardPartition.apply).toArray[InputPartition]
  /** Shard bytes on disk (see [[WarcScan.estimateStatistics]]). */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(totalBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TarReaderFactory(required.fieldNames, pushed, conf)
}

class TarReaderFactory(fieldNames: Array[String], pushed: Array[Filter],
                       conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TarShardReader(
      partition.asInstanceOf[TarShardPartition].file, fieldNames, pushed,
      conf)
}

class TarShardReader(file: String, fieldNames: Array[String],
                     pushed: Array[Filter],
                     conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(conf.value)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"graft-tar: $file exceeds 2 GiB")
    val raw = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, raw) finally in.close()
    // meta-only walk ALWAYS: the ustar framing validation is identical
    // and member payloads are sliced lazily below — only for members
    // that survive the pushed filters (a `WHERE ext = 'txt'` over a
    // WebDataset shard copies the .txt members' bytes, nobody else's)
    val members = Tar.parseMeta(raw)
      .getOrElse(throw new IllegalArgumentException(
        s"corrupt tar framing in $file"))
    val fileUtf8 = UTF8String.fromString(file)
    members.iterator.zipWithIndex.flatMap { case (m, i) =>
      val base = m.name.split('/').last
      val dot = base.indexOf('.')
      val (key, ext) =
        if (dot < 0) (base, "")
        else (base.substring(0, dot), base.substring(dot + 1))
      def metaVal(n: String): Any = n match {
        case "file" => file
        case "member_idx" => i.toLong
        case "name" => m.name
        case "sample_key" => key
        case "ext" => ext
        case "size" => m.size
        case "data_offset" => m.dataOffset
        case _ => null
      }
      if (!pushed.forall(WarcFilters.eval(_, metaVal))) None
      else {
        lazy val data = java.util.Arrays.copyOfRange(raw,
          m.dataOffset.toInt, (m.dataOffset + m.size).toInt)
        val row = new GenericInternalRow(fieldNames.length)
        var j = 0
        while (j < fieldNames.length) {
          val v: Any = fieldNames(j) match {
            case "file" => fileUtf8
            case "member_idx" => i.toLong
            case "name" => UTF8String.fromString(m.name)
            case "sample_key" => UTF8String.fromString(key)
            case "ext" => UTF8String.fromString(ext)
            case "size" => m.size
            case "data_offset" => m.dataOffset
            case "data" => data
            case "text" => UTF8String.fromString(new String(data, UTF_8))
            case other => throw new IllegalStateException(
              s"graft-tar: unknown column $other")
          }
          row.update(j, v)
          j += 1
        }
        Some(row: InternalRow)
      }
    }.toVector.iterator
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
