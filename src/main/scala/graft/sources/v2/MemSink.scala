package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The WRITE half of the DataSourceV2 surface ([[SeqTableProvider]] is
  * the read half): a named in-memory table demonstrating the full
  * distributed commit protocol —
  *
  *   - each task's [[DataWriter]] buffers its partition's rows and
  *     surrenders them ONLY through its [[WriterCommitMessage]];
  *   - the driver's [[BatchWrite.commit]] installs all messages
  *     atomically (one map put), so a job in which ANY task failed
  *     leaves the table exactly as it was — readers never observe a
  *     partial write (the exactly-once guarantee object stores need a
  *     commit service for, in its minimal honest form);
  *   - `abort` drops the buffered messages.
  *
  * Values are deep-copied out of the reused `InternalRow` before
  * buffering — the classic V2 writer bug, pinned by the spec.
  */
class MemTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-mem"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemStore.schemaOf(options.get("table"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemTable(properties.get("table"), schema)
}

/** Driver-side store: table name -> (schema, committed rows). */
object MemStore {
  /** `version` advances on every committed mutation — the snapshot
    * token row-level rewrites use to detect a concurrent write between
    * their scan and their commit (see [[replaceIfVersion]]).
    */
  final case class Stored(schema: StructType, rows: Array[Array[Any]],
                          version: Long = 0L)
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, Stored]
  def schemaOf(name: String): StructType = {
    require(name != null && name.nonEmpty, "graft-mem requires option 'table'")
    val s = tables.get(name)
    require(s != null, s"graft-mem table '$name' does not exist")
    s.schema
  }

  private def sameShape(a: StructType, b: StructType): Boolean =
    a.fields.map(f => (f.name, f.dataType)).toSeq ==
      b.fields.map(f => (f.name, f.dataType)).toSeq
  def get(name: String): Option[Stored] = Option(tables.get(name))
  def put(name: String, s: Stored): Unit =
    tables.compute(name, (_, old) =>
      s.copy(version = if (old == null) 1L else old.version + 1L))
  def append(name: String, schema: StructType, rows: Array[Array[Any]]): Unit =
    tables.merge(name, Stored(schema, rows, version = 1L),
      (old, add) => {
        // rows are stored positionally: a reordered/retyped append
        // would silently transpose values under the old schema
        require(sameShape(old.schema, add.schema),
          s"graft-mem append to '$name': schema ${add.schema.simpleString} " +
            s"does not match stored ${old.schema.simpleString}")
        Stored(old.schema, old.rows ++ add.rows, old.version + 1L)
      })
  def clear(name: String): Unit = { tables.remove(name); epochs.remove(name) }
  /** Atomic read-modify-write of a table's contents (no-op if absent).
    * The version advances automatically; `f` need not manage it.
    */
  def mutate(name: String)(f: Stored => Stored): Unit =
    tables.computeIfPresent(name, (_, old) =>
      f(old).copy(version = old.version + 1L))
  /** Atomic compare-and-swap on the snapshot version: commits `s` only
    * if the table is still at `expected` (ADVICE r5 — a row-level
    * rewrite's REPLACE must not blindly overwrite rows appended by a
    * concurrent batch commit between its scan and its commit). Returns
    * false on a version conflict; the caller fails the write, leaving
    * the table exactly as the concurrent writer committed it.
    */
  def replaceIfVersion(name: String, expected: Long, s: Stored): Boolean = {
    val ok = new java.util.concurrent.atomic.AtomicBoolean(false)
    tables.compute(name, (_, old) => {
      val cur = if (old == null) 0L else old.version
      if (cur == expected) { ok.set(true); s.copy(version = cur + 1L) }
      else old
    })
    ok.get()
  }

  // committed stream epochs per table — the idempotence ledger
  private val epochs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[String]]
  def commitEpoch(name: String, epochKey: String, schema: StructType,
                  rows: Array[Array[Any]]): Unit = {
    val set = epochs.computeIfAbsent(name,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    if (set.add(epochKey)) append(name, schema, rows) // replay -> no-op
  }
}

class MemTable(tableName: String, schema0: StructType)
    extends Table with SupportsWrite with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  require(tableName != null && tableName.nonEmpty,
    "graft-mem requires option 'table'")

  /** UPDATE / MERGE INTO via GROUP-based row-level operations, with
    * the whole table as the single group: Spark scans the current
    * rows through the normal read path, computes the full replacement
    * set (carried-over + updated + inserted rows), and the write
    * REPLACES the scanned group — here, an overwrite commit. The same
    * atomic-commit guarantee as batch writes applies: a failed
    * rewrite leaves the table untouched.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new org.apache.spark.sql.connector.write.RowLevelOperation {
      // snapshot version at scan-build time: the rewrite's commit is a
      // compare-and-swap against it, so rows committed by a concurrent
      // writer between scan and commit fail the rewrite instead of
      // being silently lost (the same reason deleteWhere uses mutate)
      @volatile private var scanVersion: Long = -1L
      override def command():
          org.apache.spark.sql.connector.write.RowLevelOperation.Command =
        info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        scanVersion = MemStore.get(tableName).map(_.version).getOrElse(0L)
        MemTable.this.newScanBuilder(options)
      }
      override def newWriteBuilder(w: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite =
              new MemBatchWrite(tableName, w.schema(), overwrite = true,
                expectVersion = () => scanVersion)
          }
        }
    }

  /** DML surface: `DELETE FROM <catalog table> WHERE ...` — Spark
    * compiles the predicate to source filters and the table applies
    * them atomically (one map put). Supports equality/comparison
    * filters on any column plus IsNull/IsNotNull; anything else is
    * declined via canDeleteWhere and Spark reports the delete as
    * unsupported rather than deleting the wrong rows.
    */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(MemTable.evaluable(schema0, _))

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    // read-modify-write as ONE atomic map operation, so a concurrent
    // batch-write commit can never be lost to a stale snapshot
    MemStore.mutate(tableName) { stored =>
      MemStore.Stored(stored.schema, stored.rows.filterNot(row =>
        filters.forall(MemTable.matches(stored.schema, row, _))))
    }
  override def name(): String = s"graft_mem:$tableName"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(tableName, info.schema(), overwrite)
        override def toStreaming:
            org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new MemStreamingWrite(tableName, info.schema(), info.queryId())
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      private val stored = MemStore.get(tableName).getOrElse(
        MemStore.Stored(schema0, Array.empty))
      override def readSchema(): StructType = stored.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(MemPartition(stored.rows))
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val rows = partition.asInstanceOf[MemPartition].rows
          new PartitionReader[InternalRow] {
            private var i = -1
            override def next(): Boolean = { i += 1; i < rows.length }
            override def get(): InternalRow = new GenericInternalRow(
              rows(i).map {
                case s: String => UTF8String.fromString(s)
                case v => v
              })
            override def close(): Unit = ()
          }
        }
    }
}

object MemTable {
  import org.apache.spark.sql.sources._

  /** Comparison filters additionally require a type `cmp` supports
    * (ADVICE r5): a DELETE comparing e.g. a binary or array column
    * must be DECLINED via canDeleteWhere, not accepted and then thrown
    * from deleteWhere mid-mutation.
    */
  private def comparable(schema: StructType, name: String): Boolean =
    schema.fields.find(_.name == name).exists(_.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BooleanType => true
      case _ => false
    })

  private[graft] def evaluable(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => comparable(schema, a)
    case GreaterThan(a, _) => comparable(schema, a)
    case GreaterThanOrEqual(a, _) => comparable(schema, a)
    case LessThan(a, _) => comparable(schema, a)
    case LessThanOrEqual(a, _) => comparable(schema, a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case And(l, r) => evaluable(schema, l) && evaluable(schema, r)
    case Or(l, r) => evaluable(schema, l) && evaluable(schema, r)
    // Not is declined: collapsing a NULL comparison to "no match" is
    // only sound outside negation (NOT (NULL = x) must keep the row,
    // but the collapse would delete it)
    case AlwaysTrue() | AlwaysFalse() => true
    case _ => false
  }

  /** SQL three-valued logic collapsed to "row matches": a NULL
    * comparison result means the row does NOT match the delete
    * predicate (and therefore survives), exactly like DELETE's WHERE.
    */
  private[v2] def matches(schema: StructType, row: Array[Any], f: Filter): Boolean = {
    def v(name: String): Any = row(schema.fieldIndex(name))
    def cmp(name: String, x: Any): Option[Int] = {
      val a = v(name)
      if (a == null || x == null) None
      else Some((a, x) match {
        case (l: Long, r: Number) => java.lang.Long.compare(l, r.longValue())
        case (l: Int, r: Number) => java.lang.Long.compare(l.toLong, r.longValue())
        case (l: Double, r: Number) => java.lang.Double.compare(l, r.doubleValue())
        case (l: String, r: String) => l.compareTo(r)
        case (l: Boolean, r: Boolean) => java.lang.Boolean.compare(l, r)
        case other =>
          throw new IllegalArgumentException(s"graft-mem delete: $other")
      })
    }
    f match {
      case EqualTo(a, x) => cmp(a, x).contains(0)
      case GreaterThan(a, x) => cmp(a, x).exists(_ > 0)
      case GreaterThanOrEqual(a, x) => cmp(a, x).exists(_ >= 0)
      case LessThan(a, x) => cmp(a, x).exists(_ < 0)
      case LessThanOrEqual(a, x) => cmp(a, x).exists(_ <= 0)
      case IsNull(a) => v(a) == null
      case IsNotNull(a) => v(a) != null
      case And(l, r) => matches(schema, row, l) && matches(schema, row, r)
      case Or(l, r) => matches(schema, row, l) || matches(schema, row, r)
      case AlwaysTrue() => true
      case AlwaysFalse() => false
      case other =>
        throw new IllegalArgumentException(s"graft-mem delete: $other")
    }
  }
}

case class MemPartition(rows: Array[Array[Any]]) extends InputPartition

case class MemCommit(rows: Array[Array[Any]]) extends WriterCommitMessage

/** `expectVersion` (when set, by the row-level rewrite path) turns the
  * overwrite commit into a compare-and-swap against the version the
  * rewrite's scan saw; `() => -1` / plain overwrites commit blindly
  * (SaveMode.Overwrite semantics — replace whatever is there).
  */
class MemBatchWrite(tableName: String, schema: StructType, overwrite: Boolean,
                    expectVersion: () => Long = () => -1L)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.flatMap(_.asInstanceOf[MemCommit].rows)
    val expected = expectVersion()
    if (overwrite && expected >= 0) {
      if (!MemStore.replaceIfVersion(tableName, expected,
          MemStore.Stored(schema, rows)))
        throw new java.util.ConcurrentModificationException(
          s"graft-mem row-level rewrite of '$tableName': table changed " +
            s"since the rewrite's scan (expected version $expected); " +
            "the rewrite was aborted and the concurrent commit kept")
    }
    else if (overwrite) MemStore.put(tableName, MemStore.Stored(schema, rows))
    else MemStore.append(tableName, schema, rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming sink half of the commit protocol: each micro-batch is an
  * epoch; a replayed epoch (failure after commit, before the
  * checkpoint advanced) is recognized by its epochId and skipped — the
  * idempotent-commit rule that makes a replayable source + this sink
  * exactly-once end-to-end. Epoch keys are scoped by the STREAMING
  * QUERY id (stable across restarts of the same checkpoint, unlike a
  * run id — a replay after restart carries the same queryId:epoch and
  * is correctly recognized), so distinct queries into one table never
  * mask each other's batches.
  */
class MemStreamingWrite(tableName: String, schema: StructType,
                        queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new MemStreamingWriterFactory(schema)
  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit =
    MemStore.commitEpoch(tableName, s"$queryId:$epochId", schema,
      messages.flatMap(_.asInstanceOf[MemCommit].rows))
  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = ()
}

class MemStreamingWriterFactory(schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new MemWriterFactory(schema).createWriter(partitionId, taskId)
}

class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(record: InternalRow): Unit = {
        // InternalRow instances are reused by the caller: copy values
        // out. Row-level-operation rewrites (UPDATE/MERGE) prepend an
        // internal bookkeeping column to the replacement rows; the
        // declared table columns are the TRAILING fields, so align the
        // schema to the tail.
        val off = record.numFields - schema.fields.length
        require(off >= 0,
          s"graft-mem: row has ${record.numFields} fields for schema $schema")
        buf += schema.fields.zipWithIndex.map { case (f, i) =>
          if (record.isNullAt(off + i)) null
          else f.dataType match {
            case StringType => record.getUTF8String(off + i).toString
            case LongType => record.getLong(off + i)
            case IntegerType => record.getInt(off + i)
            case DoubleType => record.getDouble(off + i)
            case BooleanType => record.getBoolean(off + i)
            case other =>
              throw new IllegalArgumentException(s"graft-mem: unsupported $other")
          }
        }
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
