package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static one-pass SimHash kernel shared by eval and generated code.
  *
  * Replicates the explode→group-by formulation bit-for-bit: tokens are
  * Java-regex `\s+` splits of the space-trimmed text (every OCCURRENCE
  * votes, including the empty token an empty text yields), the per-token
  * hash is either the portable pair of 31-bit polynomial hashes packed
  * as `h31·2³¹ + h37` (what the DuckDB oracle replays for d4) or
  * Spark's xxhash64 (`XXH64` with Spark's default seed 42), and bit i
  * of the result is the sign of the ±1 vote sum on bit i.
  */
object SimHashUtil {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def simhash(s: UTF8String, portable: Boolean): Long = {
    val toks = WS.split(s.trim().toString, -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val tok = UTF8String.fromString(toks(t))
      val h =
        if (portable)
          PolyHashUtil.hash(tok, 31L, 1000000007L) * 2147483648L +
            PolyHashUtil.hash(tok, 37L, 998244353L)
        else
          XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset,
            tok.numBytes, 42L)
      var i = 0
      while (i < 64) {
        votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** Codegen'd 64-bit SimHash over a string column — turns the dedup
  * signature step into a pure map-side projection: the previous
  * formulation exploded every token to its own row and aggregated 64
  * conditional sums through a shuffle on doc id; this is one static
  * call per row inside whole-stage codegen, no explode, NO SHUFFLE.
  */
case class SimHash64(child: Expression, portable: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects a string column, got $other")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[UTF8String], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SimHashUtil.simhash($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
