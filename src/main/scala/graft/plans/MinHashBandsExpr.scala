package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash LSH band signatures in ONE static kernel call —
  * text → `bands` 64-bit bucket ids.
  *
  * Bit-for-bit equivalent to the composed-expression formulation it
  * replaces ([[graft.streaming.Streams.lshBandStructs]], kept as the
  * differential reference): [[TokenShinglesUtil.shingles]] tokens,
  * Spark's own XXH64 with the `xxhash64(s)` / `xxhash64(1, s)` seed
  * composition (42 and hashInt(1, 42)), the MinHashAgg Carter-Wegman
  * walk `h += step` with signed min, and the band hash as Spark's
  * array-fold `hashLong(elem, running)` from seed 42 — so stream,
  * batch index, and this kernel all agree on every bucket id.
  *
  * The HOF formulation fell out of whole-stage codegen (nested lambda
  * dispatch, k×|shingles| boxed longs per row): measured 39 s for the
  * st15 drain at sf0.1; this kernel is one call, zero intermediate
  * arrays beyond the k-slot signature.
  */
object MinHashBandsUtil {
  private val Seed1 = 42L
  private val Seed2 = XXH64.hashInt(1, 42L)

  def bands(s: UTF8String, n: Int, k: Int, nBands: Int): ArrayData = {
    val sh = TokenShinglesUtil.shingles(s, n)
    val rows = k / nBands
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val m = sh.numElements()
    var i = 0
    while (i < m) {
      val u = sh.getUTF8String(i)
      var h = XXH64.hashUTF8String(u, Seed1)
      val step = XXH64.hashUTF8String(u, Seed2)
      var j = 0
      while (j < k) {
        if (h < sig(j)) sig(j) = h
        h += step
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var h = Seed1
      var j = b * rows
      val end = j + rows
      while (j < end) { h = XXH64.hashLong(sig(j), h); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd per-row MinHash band signatures (array indexed by band). */
case class MinHashBands(child: Expression, n: Int, k: Int, nBands: Int)
    extends UnaryExpression {
  require(k % nBands == 0, "bands must divide k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands expects a string column, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashBandsUtil.bands(input.asInstanceOf[UTF8String], n, k, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashBandsUtil.bands($c, $n, $k, $nBands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
