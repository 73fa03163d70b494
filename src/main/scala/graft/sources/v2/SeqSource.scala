package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A complete DataSourceV2 connector — the Spark-native analog of the
  * reference's plugin datasource protocol (`plugins/`, where an
  * external process serves schema + typed rows and the engine pushes
  * predicates down to it; cf. physical/datasources.go pushdown
  * negotiation). Everything a real connector needs is here, small
  * enough to read in one sitting:
  *
  *   - schema inference ([[TableProvider.inferSchema]]),
  *   - column pruning ([[SupportsPushDownRequiredColumns]]) — the
  *     reader materializes ONLY requested fields,
  *   - predicate pushdown ([[SupportsPushDownFilters]]) — id-range
  *     predicates narrow the key space before partition planning, so
  *     whole input partitions are never created (the DSV2 equivalent
  *     of partition pruning),
  *   - split planning ([[Batch.planInputPartitions]]) — the surviving
  *     range is sliced for executor parallelism,
  *   - per-partition readers with no driver involvement.
  *
  * The table itself is a deterministic synthetic sequence
  * `(id, val, bucket)` — `val = (id * 2654435761 mod 1e6) / 1000`,
  * `bucket = id mod 10` — so any query over it is exactly replayable
  * in another engine (the fixture discipline every other oracle uses).
  */
class SeqTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-seq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val slices = properties.getOrDefault("slices", "8").toInt
    require(slices > 0, s"graft-seq: slices must be positive, got $slices")
    new SeqTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      slices)
  }
}

object SeqTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("bucket", LongType, nullable = false)))

  def valOf(id: Long): Double = (id * 2654435761L % 1000000L) / 1000.0

  /** ONE slicing rule for batch and streaming reads — the exactly-once
    * replay contract depends on both paths splitting a range
    * identically.
    */
  def slice(lo: Long, hi: Long, slices: Int): Array[InputPartition] = {
    require(slices > 0, s"graft-seq: slices must be positive, got $slices")
    val n = math.max(hi - lo, 0L)
    if (n == 0L) return Array.empty
    val k = math.min(slices.toLong, n).toInt
    val step = n / k
    (0 until k).map { i =>
      val a = lo + i * step
      val b = if (i == k - 1) hi else a + step
      SeqRangePartition(a, b, i)
    }.toArray
  }
}

class SeqTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft_seq[$start,$end)"
  override def schema(): StructType = SeqTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val rpb = options.getLong("rowsPerBatch", 1000L)
    require(rpb > 0, s"graft-seq: rowsPerBatch must be positive, got $rpb")
    new SeqScanBuilder(start, end, slices, rpb)
  }

  /** `_slice` — which input partition produced the row (the `_metadata`
    * discipline file sources use, on a connector): hidden from `SELECT *`,
    * materialized only when named explicitly.
    */
  override def metadataColumns():
      Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_slice"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def comment(): String = "input-partition ordinal of the row"
    })
}

class SeqScanBuilder(var start: Long, var end: Long, slices: Int,
                     rowsPerBatch: Long = 1000L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqTable.schema
  private var aggPushed: Option[Array[String]] = None // kinds, in order

  /** Global MIN(id)/MAX(id)/COUNT(*) answer arithmetically from the
    * (already filter-narrowed) range — the whole scan collapses to one
    * one-row partition with NO Spark-side aggregation (complete
    * pushdown), the same contract the built-in JDBC V2 source
    * negotiates with databases. Grouped or unsupported aggregates are
    * declined and Spark aggregates normally.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    translateAgg(agg) match {
      case some @ Some(_) => aggPushed = some; true
      case None => false
    }

  private def translateAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Array[String]] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (agg.groupByExpressions().nonEmpty) return None
    val kinds = agg.aggregateExpressions().map {
      case _: CountStar => "count_star"
      case m: Min => m.column() match {
        case f: NamedReference if f.describe() == "id" => "min_id"
        case _ => return None
      }
      case m: Max => m.column() match {
        case f: NamedReference if f.describe() == "id" => "max_id"
        case _ => return None
      }
      case _ => return None
    }
    Some(kinds)
  }

  /** Accept id-range predicates (narrowing [start, end) BEFORE split
    * planning); everything else stays a post-scan filter. Accepted
    * filters are fully evaluated here, so they are NOT returned as
    * residuals.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    // Math.addExact-style care at the Long edges: `id > MaxValue`
    // matches nothing (start := end), `id <= MaxValue` must NOT wrap
    // end to MinValue — the filter is consumed here, so an overflow
    // would silently return wrong rows rather than crash
    def succ(x: Long): Option[Long] =
      if (x == Long.MaxValue) None else Some(x + 1)
    accepted.foreach {
      case GreaterThan("id", v) =>
        succ(v.asInstanceOf[Number].longValue()) match {
          case Some(s) => start = math.max(start, s)
          case None => start = end // > MaxValue: empty
        }
      case GreaterThanOrEqual("id", v) =>
        start = math.max(start, v.asInstanceOf[Number].longValue())
      case LessThan("id", v) =>
        end = math.min(end, v.asInstanceOf[Number].longValue())
      case LessThanOrEqual("id", v) =>
        succ(v.asInstanceOf[Number].longValue())
          .foreach(s => end = math.min(end, s)) // <= MaxValue: no-op bound
      case EqualTo("id", v) =>
        val x = v.asInstanceOf[Number].longValue()
        start = math.max(start, x)
        succ(x).foreach(s => end = math.min(end, s))
      case _ =>
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggPushed match {
    case Some(kinds) => new SeqAggScan(start, end, kinds)
    case None => new SeqScan(start, end, slices, required, pushed, rowsPerBatch)
  }
}

/** Completely-pushed global aggregate: one partition, one row, zero
  * Spark-side aggregation.
  */
class SeqAggScan(start: Long, end: Long, kinds: Array[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(kinds.map(k => StructField(k, LongType, nullable = true)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq agg-pushdown [$start,$end) ${kinds.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqRangePartition(start, end))
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqAggReaderFactory(kinds)
}

class SeqAggReaderFactory(kinds: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqRangePartition]
    val n = math.max(p.hi - p.lo, 0L)
    val row: Array[Any] = kinds.map {
      case "count_star" => n
      case "min_id" => if (n == 0L) null else p.lo
      case "max_id" => if (n == 0L) null else p.hi - 1
    }
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(row)
      override def close(): Unit = ()
    }
  }
}

case class SeqRangePartition(lo: Long, hi: Long, idx: Int = 0)
    extends InputPartition

class SeqScan(start: Long, end: Long, slices: Int,
              required: StructType, pushed: Array[Filter],
              rowsPerBatch: Long = 1000L)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeqMicroBatchStream(start, end, rowsPerBatch, slices, required)
  override def description(): String =
    s"graft-seq [$start,$end) PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  /** Post-pushdown statistics: row count is exact for a sequence, size
    * assumes 8 bytes per surviving column. This is what lets the
    * optimizer broadcast a filtered connector table into joins — the
    * stats reflect the PRUNED range, not the raw table (the part
    * file-format sources get from footers and a V2 connector must
    * report itself).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(end - start, 0L)
    // saturating multiply: a wrapped-negative size would read as TINY
    // and trick the optimizer into broadcasting a quintillion-row side
    private val bytes =
      try Math.multiplyExact(rows, 8L * math.max(required.fields.length, 1))
      catch { case _: ArithmeticException => Long.MaxValue }
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  /** Splits the (already filter-narrowed) range: an empty or shrunken
    * range plans fewer partitions — pruning happens before any task
    * exists, not inside one.
    */
  override def planInputPartitions(): Array[InputPartition] =
    SeqTable.slice(start, end, slices)

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

/** Streaming READ half: the sequence as a replayable micro-batch
  * source. Offsets are plain positions in the id space; each batch
  * covers `[startOffset, min(startOffset + rowsPerBatch, end))` and is
  * split like the batch scan, so a batch replayed from the checkpoint
  * regenerates identical rows (the replayability that makes the
  * source + an idempotent sink exactly-once).
  * [[SupportsTriggerAvailableNow]]: the end bound is already fixed, so
  * prepare is a no-op and AvailableNow drains batch-by-batch to it.
  */
class SeqMicroBatchStream(start: Long, end: Long, rowsPerBatch: Long,
                          slices: Int, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  case class SeqOffset(pos: Long) extends Offset {
    override def json(): String = pos.toString
  }

  override def initialOffset(): Offset = SeqOffset(start)
  override def deserializeOffset(json: String): Offset =
    SeqOffset(json.toLong)
  // admission-control path: the declared default limit and the
  // admission logic must AGREE (ADVICE r5) — the default is
  // maxRows(rowsPerBatch), and a caller-supplied maxRows/allAvailable
  // is honored rather than silently re-capped
  override def latestOffset(startOffset: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxRows}
    val admit = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _: ReadAllAvailable => end // unbounded: drain to the end
      case _ => rowsPerBatch // composite/unknown: the configured cap
    }
    SeqOffset(math.min(end,
      startOffset.asInstanceOf[SeqOffset].pos + admit))
  }
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit
      .maxRows(rowsPerBatch)
  override def reportLatestOffset(): Offset = SeqOffset(end)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(startO: Offset, endO: Offset): Array[InputPartition] =
    SeqTable.slice(startO.asInstanceOf[SeqOffset].pos,
      endO.asInstanceOf[SeqOffset].pos, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {

  /** Columnar (vectorized) reads — the parquet-reader discipline on a
    * connector: rows are materialized straight into column vectors in
    * 4096-row batches, and the plan carries a single ColumnarToRow
    * boundary instead of per-row object churn inside the scan.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val p = partition.asInstanceOf[SeqRangePartition]
    val capacity = 4096
    new PartitionReader[ColumnarBatch] {
      private var cur = p.lo
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (cur >= p.hi) return false
        val n = math.min(capacity.toLong, p.hi - cur).toInt
        val vectors = OnHeapColumnVector.allocateColumns(n, required)
        var c = 0
        while (c < required.fields.length) {
          val v = vectors(c)
          required.fields(c).name match {
            case "id" =>
              var r = 0; while (r < n) { v.putLong(r, cur + r); r += 1 }
            case "val" =>
              var r = 0
              while (r < n) { v.putDouble(r, SeqTable.valOf(cur + r)); r += 1 }
            case "bucket" =>
              var r = 0; while (r < n) { v.putLong(r, (cur + r) % 10L); r += 1 }
            case "_slice" =>
              var r = 0; while (r < n) { v.putLong(r, p.idx.toLong); r += 1 }
            case other =>
              throw new IllegalArgumentException(s"unknown column $other")
          }
          c += 1
        }
        batch = new ColumnarBatch(vectors.asInstanceOf[Array[ColumnVector]], n)
        cur += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqRangePartition]
    // resolve field generators once per partition, not per row
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "id" => (id: Long) => id
      case "val" => (id: Long) => SeqTable.valOf(id)
      case "bucket" => (id: Long) => id % 10L
      case "_slice" => (_: Long) => p.idx.toLong
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(cur)))
      override def close(): Unit = ()
    }
  }
}
