package graft.sources.v2

import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Gzip, Warc}

/** DataSourceV2 connector for `.warc` / `.warc.gz` crawl archives —
  * the scale path for the WARC source family (m27 reads one archive;
  * real crawls are directories of thousands of shards — Common Crawl
  * segments at ~1 GB each).
  *
  * What the V2 surface buys over the binaryFile+flatMap route:
  *
  *   - **split planning**: the glob expands on the driver and every
  *     shard file becomes its own [[InputPartition]] — a
  *     1000-executor cluster reads 64k shards with no coordination
  *     beyond the file listing;
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): a
  *     header-only projection (`SELECT target_uri, content_length`)
  *     never copies block bytes, never parses the HTTP message, never
  *     UTF-8-decodes bodies — [[Warc.parseFileHeaders]] walks framing
  *     arithmetic only. On archives whose bytes are ~99% body payload
  *     that is the difference between scanning headers and scanning
  *     everything. The pruned schema is plan-visible (`ReadSchema` on
  *     the BatchScan node), so the fast path is assertable.
  *
  * Corruption stays loud (the WarcTable contract): bad gzip framing,
  * CRC/ISIZE trailer mismatches, and WARC framing violations all throw
  * with the file path. Usage:
  * `spark.read.format("graft-warc").load("segments/x*.warc.gz")`.
  */
class WarcTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSourceTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-warc: path is required"))
    // gzipped: unset = per-file by .gz extension; "true"/"false" forces
    val gz = Option(properties.get("gzipped")).map(_.toBoolean)
    new WarcSourceTable(path, gz)
  }
}

object WarcSourceTable {
  /** Same fields, order, and types as [[graft.sources.WarcTable.WarcRow]]
    * — one schema for both routes into the source.
    */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = true),
    StructField("record_idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", LongType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("body", StringType, nullable = true)))

  /** Fields whose values live in the record BLOCK: requesting any of
    * them forces the full walk; a projection disjoint from these takes
    * the header-only fast path.
    */
  val blockFields: Set[String] = Set("http_status", "http_content_type",
    "body")

  /** Expand the path/glob into concrete shard files (driver-side, the
    * same listing discipline as Spark's file sources).
    */
  def listShards(path: String): Seq[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory)
      else Seq(st)
    }.map(_.getPath.toString).sorted
    if (files.isEmpty)
      throw new IllegalArgumentException(s"graft-warc: no files match $path")
    files
  }
}

class WarcSourceTable(path: String, gzipped: Option[Boolean])
    extends Table with SupportsRead {
  override def name(): String = s"graft_warc[$path]"
  override def schema(): StructType = WarcSourceTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path, gzipped)
}

class WarcScanBuilder(path: String, gzipped: Option[Boolean])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcSourceTable.schema
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve source field order regardless of projection order —
    // the reader emits values positionally
    val want = requiredSchema.fieldNames.toSet
    required = StructType(
      WarcSourceTable.schema.fields.filter(f => want.contains(f.name)))
  }
  override def build(): Scan = new WarcScan(path, gzipped, required)
}

/** One shard file per input partition. */
case class WarcShardPartition(file: String) extends InputPartition

class WarcScan(path: String, gzipped: Option[Boolean],
               required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-warc $path, columns=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    WarcSourceTable.listShards(path)
      .map(WarcShardPartition.apply).toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required.fieldNames, gzipped)
}

class WarcReaderFactory(fieldNames: Array[String],
                        gzipped: Option[Boolean])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcShardReader(
      partition.asInstanceOf[WarcShardPartition].file, fieldNames, gzipped)
}

/** Walks one shard. Header-only projections use
  * [[Warc.parseFileHeaders]] (framing arithmetic, zero block copies);
  * anything touching block content takes the full walk + HTTP split.
  */
class WarcShardReader(file: String, fieldNames: Array[String],
                      gzipped: Option[Boolean])
    extends PartitionReader[InternalRow] {

  private val needBlock =
    fieldNames.exists(WarcSourceTable.blockFields.contains)

  private val rows: Iterator[InternalRow] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"graft-warc: $file exceeds 2 GiB")
    val raw = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, raw) finally in.close()
    val plain =
      if (gzipped.getOrElse(file.toLowerCase.endsWith(".gz")))
        Gzip.members(raw) match {
          case Some(ms) =>
            ms.find(m => !m.crcOk || !m.isizeOk).foreach { m =>
              throw new IllegalArgumentException(
                s"gzip member at offset ${m.offset} in $file fails " +
                s"trailer verification (crcOk=${m.crcOk}, " +
                s"isizeOk=${m.isizeOk})")
            }
            ms.toArray.flatMap(_.plain)
          case None => throw new IllegalArgumentException(
            s"corrupt gzip framing in $file")
        }
      else raw
    val parsed: Vector[(Warc.Record, Long)] =
      if (needBlock)
        Warc.parseFile(plain).getOrElse(throw new IllegalArgumentException(
            s"corrupt WARC framing in $file"))
          .map(r => (r, r.block.length.toLong))
      else
        Warc.parseFileHeaders(plain).getOrElse(
          throw new IllegalArgumentException(
            s"corrupt WARC framing in $file"))
    val fileUtf8 = UTF8String.fromString(file)
    parsed.iterator.zipWithIndex.map { case ((r, blockLen), i) =>
      val http =
        if (needBlock && r.header("Content-Type").exists(
            _.toLowerCase.startsWith("application/http")))
          Warc.parseHttp(r.block)
        else None
      def s(v: Option[String]): AnyRef =
        v.map(UTF8String.fromString).orNull
      val row = new GenericInternalRow(fieldNames.length)
      var j = 0
      while (j < fieldNames.length) {
        val v: Any = fieldNames(j) match {
          case "file" => fileUtf8
          case "record_idx" => i.toLong
          case "warc_type" => s(r.header("WARC-Type"))
          case "record_id" => s(r.header("WARC-Record-ID"))
          case "warc_date" => s(r.header("WARC-Date"))
          case "target_uri" => s(r.header("WARC-Target-URI"))
          case "content_length" => blockLen
          case "http_status" =>
            http.flatMap(_.status).map(st => Long.box(st.toLong)).orNull
          case "http_content_type" => s(http.flatMap(_.header("Content-Type")))
          case "body" =>
            UTF8String.fromString(http.map(h => new String(h.body, UTF_8))
              .getOrElse(new String(r.block, UTF_8)))
          case other => throw new IllegalStateException(
            s"graft-warc: unknown column $other")
        }
        row.update(j, v)
        j += 1
      }
      row: InternalRow
    }.toVector.iterator
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
