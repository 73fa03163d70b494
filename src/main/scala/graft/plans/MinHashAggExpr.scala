package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All k MinHash permutation minima in ONE aggregation buffer — a
  * custom `TypedImperativeAggregate[Array[Long]]` (the §2.12 extension
  * surface exercised on a real need).
  *
  * The previous formulation aggregated `min(h1 + i·h2)` as k separate
  * aggregate COLUMNS: at k=32 that is 32 buffer slots, 32 expression
  * trees, and a 32-column-wide partial-aggregation row through the
  * shuffle; at production k (128-256 permutations) the plan gets
  * k-wide everywhere. Here the buffer is a single long[k] updated in a
  * tight loop (`h += h2` per step — wrapping-add equals `h1 + i·h2` mod
  * 2⁶⁴, the Carter-Wegman family), the shuffle carries one binary blob
  * per group, and the output is one `array<bigint>` column that band
  * hashing slices directly.
  *
  * Values are IDENTICAL to the k-column formulation (same formula, same
  * signed-long min), verified differentially in OperatorsSpec.
  */
case class MinHashAgg(h1: Expression, h2: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(h1, h2)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      var h = a.asInstanceOf[Long]
      val step = b.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        if (h < buf(i)) buf(i) = h
        h += step
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(h1 = c(0), h2 = c(1))
}
