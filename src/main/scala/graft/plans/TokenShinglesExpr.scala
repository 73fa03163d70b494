package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code.
  *
  * Bit-for-bit equivalent to the HOF formulation it replaces
  * (`array_distinct(transform(sequence(...), i ->
  * array_join(slice(split(trim(text), "\s+"), i, n), " ")))`):
  *
  *  - trim removes ASCII spaces only (SQL `trim` / UTF8String.trim)
  *  - tokenization is Java-regex `\s+` with limit -1, exactly Spark's
  *    `split` (leading empty token survives a leading tab, etc.)
  *  - a window starting past `len-n` is the clamped remainder (`slice`
  *    semantics); texts with fewer than n tokens yield one short window
  *  - distinct keeps first-occurrence order (`array_distinct`)
  */
object TokenShinglesUtil {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks = WS.split(s.trim().toString, -1)
    val count = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n && i + j < toks.length) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd distinct word-n-gram shingles over a string column.
  *
  * The HOF formulation walks four nested higher-order functions per row
  * — interpreted lambda dispatch and an intermediate array per window.
  * On the dedup operators (d2/d3/d7 all explode this) the shingle build
  * dominates the map side. This expression is one static call inside
  * whole-stage codegen: a single regex split, one StringBuilder pass
  * per window, LinkedHashSet dedup.
  */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_shingles expects a string column, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenShinglesUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TokenShinglesUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}
