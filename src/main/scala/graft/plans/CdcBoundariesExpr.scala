package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static one-pass content-defined-chunking boundary kernel.
  *
  * Emits every 1-based code-point position `i` in `[window, n]` whose
  * trailing `window`-code-point context hashes to 0 (mod `divisor`)
  * under the polynomial hash `acc = (acc·mult + cp) % modulus` — the
  * rsync/LBFS boundary rule (Muthitacharoen et al. 2001, reference for
  * the chunking discipline only).
  *
  * Bit-identical to filtering `sequence(window, n)` through
  * [[PolyHashUtil.hash]] on each `substr(i-window+1, window)` (the
  * formulation this kernel replaces, kept as
  * [[graft.operators.Dedup.cdcBoundariesHof]] for differential tests),
  * but O(n) instead of O(n·window): the window hash is maintained
  * incrementally — drop the leaving code point's `cp·mult^(window-1)`
  * term, multiply by `mult`, add the entering code point — so each
  * position costs O(1) with no substring allocation. At a 100 TB corpus
  * this is the difference between an 8× constant over the scan and a
  * pure single-pass projection.
  *
  * `mult·modulus` must fit in a signed long (both callers use moduli
  * < 2³¹, matching [[PolyHashUtil]]'s contract).
  */
object CdcBoundariesUtil {
  def boundaries(s: UTF8String, window: Int, divisor: Long,
                 mult: Long, modulus: Long): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // mult^(window-1) mod modulus — the weight of the leaving code point
    var pw = 1L
    var e = 0
    while (e < window - 1) { pw = (pw * mult) % modulus; e += 1 }
    val ring = new Array[Long](window)
    val out = new java.util.ArrayList[Integer]()
    var h = 0L
    var cpIdx = 0 // 1-based count of code points consumed
    var i = 0
    while (i < n) {
      // shared truncation-tolerant UTF-8 walk (Utf8Walk — one policy,
      // one place: a future change to the malformed-sequence handling
      // must not diverge between the CDC kernel and poly_hash)
      val packed = Utf8Walk.next(bytes, i, n)
      val cp = (packed >>> 3).toInt
      val len = (packed & 7L).toInt
      cpIdx += 1
      if (cpIdx > window) {
        // evict the code point leaving the window before shifting
        val leave = (ring(cpIdx % window) * pw) % modulus
        h -= leave
        if (h < 0) h += modulus
      }
      ring(cpIdx % window) = cp
      h = (h * mult + cp) % modulus
      if (cpIdx >= window && h % divisor == 0L) out.add(cpIdx)
      i += len
    }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd CDC boundary positions over a string column — one static
  * call inside whole-stage codegen, no per-position substring, no
  * higher-order-function lambda dispatch.
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Long,
                         mult: Long, modulus: Long) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_boundaries expects a string column, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcBoundariesUtil.boundaries(input.asInstanceOf[UTF8String],
      window, divisor, mult, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CdcBoundariesUtil.boundaries($c, $window, ${divisor}L, ${mult}L, ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}
