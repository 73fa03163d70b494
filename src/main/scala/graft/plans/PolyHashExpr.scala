package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static polynomial-hash kernel shared by interpreted eval and
  * generated code. Decodes UTF-8 code points straight off the string's
  * byte array (no per-character array, no String allocation) and folds
  * `acc = (acc * mult + codePoint) % modulus` left-to-right.
  *
  * Portability contract: the fold is over Unicode code points, which is
  * exactly what DuckDB's `ascii(substr(text, i, 1))` yields, so the
  * driver's oracle SQL replays the hash bit-for-bit (on ASCII input it
  * is also bit-identical to the previous HOF formulation this kernel
  * replaced). `mult * modulus` must fit in a signed long — both callers
  * use moduli < 2³¹.
  */
/** Shared truncation-tolerant UTF-8 code-point walk for the string
  * kernels (PolyHash, CharEntropy, WordStats). UTF8String does not
  * guarantee valid UTF-8 (web/Parquet text can carry truncated
  * sequences); a multi-byte lead whose continuation bytes run past the
  * buffer degrades to one code point per byte instead of reading out
  * of bounds — one policy, one place.
  *
  * Returns `(codePoint << 3) | step` packed in a Long (step ∈ 1..4).
  */
object Utf8Walk {
  @inline def next(bytes: Array[Byte], i: Int, n: Int): Long = {
    val b0 = bytes(i) & 0xff
    if (b0 < 0x80) (b0.toLong << 3) | 1L
    else if (b0 < 0xe0) {
      if (i + 1 < n)
        ((((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)).toLong << 3) | 2L
      else (b0.toLong << 3) | 1L
    } else if (b0 < 0xf0) {
      if (i + 2 < n)
        ((((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)).toLong << 3) | 3L
      else (b0.toLong << 3) | 1L
    } else {
      if (i + 3 < n)
        ((((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)).toLong << 3) | 4L
      else (b0.toLong << 3) | 1L
    }
  }
}

object PolyHashUtil {
  def hash(s: UTF8String, mult: Long, modulus: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val cs = Utf8Walk.next(bytes, i, n)
      acc = (acc * mult + (cs >>> 3)) % modulus
      i += (cs & 7L).toInt
    }
    acc
  }
}

/** Codegen'd polynomial rolling hash over a string column.
  *
  * Replaces the interpreted higher-order-function formulation
  * (`aggregate(transform(split(text, ""), ascii), ...)`), which fell
  * out of whole-stage codegen and materialized a per-character array
  * per row — measured 1.5-2× slowdowns on t1/d4 at sf0.1. This
  * expression is a single static call inside the generated code: no
  * lambda dispatch, no intermediate arrays, codegen span preserved.
  *
  * `mult`/`modulus` are plan-time constants (they parameterize the hash
  * family, they are not data), so they are case-class fields rather
  * than child expressions and get baked into the generated code as
  * literals.
  */
case class PolyHash(child: Expression, mult: Long, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_hash expects a string column, got $other")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHashUtil.hash(input.asInstanceOf[UTF8String], mult, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PolyHashUtil.hash($c, ${mult}L, ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHashExpr {
  /** Register `poly_hash(text, mult, modulus)` in the session registry
    * (idempotent); mult/modulus must be literal longs.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash",
      exprs => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"poly_hash expects (text, mult, modulus), got ${exprs.length} arguments")
        def longOf(e: Expression): Long = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              s"poly_hash mult/modulus must be literal integers, got non-literal $e")
          e.eval() match {
            case l: Long => l
            case i: Int  => i.toLong
            case other   => throw new IllegalArgumentException(
              s"poly_hash mult/modulus must be literal integers, got $other")
          }
        }
        PolyHash(exprs(0), longOf(exprs(1)), longOf(exprs(2)))
      },
      "built-in")
}
