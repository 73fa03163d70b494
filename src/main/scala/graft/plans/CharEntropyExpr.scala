package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Shannon-entropy kernel shared by interpreted eval and
  * generated code: the entropy (in bits) of the string's code-point
  * distribution, `-Σ (k/n)·log2(k/n)`.
  *
  * Low entropy flags gibberish (aaaaa…, boilerplate padding), high
  * entropy flags compressed/binary junk that leaked into a text column —
  * a standard cheap quality signal next to the length/stopword rules.
  *
  * Decodes UTF-8 code points with the same truncation-tolerant walk as
  * [[PolyHashUtil]]; ASCII counts live in a flat array and higher code
  * points in an open-addressed hash table (linear probing, grown at 60%
  * load), so CJK-alphabet documents stay O(n) rather than O(n·distinct).
  * The per-class accumulation order is fixed (ASCII ascending, then high
  * code points in table order) so results are deterministic run-to-run;
  * cross-engine comparison still rounds (summation order differs in SQL
  * replays).
  */
object CharEntropyUtil {
  def entropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    val ascii = new Array[Int](128)
    // open-addressed (cp+1, count) slots for cp >= 128 (0 = empty)
    var hiKeys: Array[Int] = null
    var hiCounts: Array[Int] = null
    var hiSize = 0
    var n = 0L
    var i = 0
    val len = bytes.length
    while (i < len) {
      val cs = Utf8Walk.next(bytes, i, len)
      val cp = (cs >>> 3).toInt
      val step = (cs & 7L).toInt
      if (cp < 128) ascii(cp) += 1
      else {
        if (hiKeys == null) { hiKeys = new Array[Int](64); hiCounts = new Array[Int](64) }
        else if (hiSize * 5 >= hiKeys.length * 3) { // grow past 60% load
          val oldK = hiKeys; val oldC = hiCounts
          hiKeys = new Array[Int](oldK.length * 2)
          hiCounts = new Array[Int](oldK.length * 2)
          var m = 0
          while (m < oldK.length) {
            if (oldK(m) != 0) {
              var sl = ((oldK(m) - 1) * 0x9E3779B1) & (hiKeys.length - 1)
              while (hiKeys(sl) != 0) sl = (sl + 1) & (hiKeys.length - 1)
              hiKeys(sl) = oldK(m); hiCounts(sl) = oldC(m)
            }
            m += 1
          }
        }
        val mask = hiKeys.length - 1
        var sl = (cp * 0x9E3779B1) & mask
        while (hiKeys(sl) != 0 && hiKeys(sl) != cp + 1)
          sl = (sl + 1) & mask
        if (hiKeys(sl) == 0) { hiKeys(sl) = cp + 1; hiCounts(sl) = 1; hiSize += 1 }
        else hiCounts(sl) += 1
      }
      n += 1
      i += step
    }
    if (n == 0L) return 0.0
    val dn = n.toDouble
    val log2 = math.log(2.0)
    var acc = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) { val p = k / dn; acc -= p * (math.log(p) / log2) }
      c += 1
    }
    if (hiKeys != null) {
      var j = 0
      while (j < hiKeys.length) {
        if (hiKeys(j) != 0) {
          val p = hiCounts(j) / dn
          acc -= p * (math.log(p) / log2)
        }
        j += 1
      }
    }
    acc
  }
}

/** Codegen'd code-point Shannon entropy of a string column: a single
  * static call inside whole-stage codegen — no per-character array, no
  * explode/groupBy shuffle pair (the naive SQL formulation shuffles the
  * corpus twice on (doc, char)).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy expects a string column, got $other")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    CharEntropyUtil.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharEntropyUtil.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropyExpr {
  /** Register `char_entropy(text)` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"char_entropy expects (text), got ${exprs.length} arguments")
        CharEntropy(exprs(0))
      },
      "built-in")
}
