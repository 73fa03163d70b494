package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro / Jaro-Winkler kernel shared by interpreted eval and
  * generated code — the record-linkage similarity the Levenshtein-based
  * [[graft.operators.EntityResolution]] path lacks (edit distance
  * punishes transpositions that linkage wants to forgive).
  *
  * Semantics are pinned to the de-facto standard the DuckDB oracle
  * implements (probed empirically, JaroWinklerSpec fixtures):
  *  - either side empty → 0.0 (not 1.0);
  *  - match window = max(|a|,|b|)/2 - 1, floored at 0;
  *  - transpositions counted over the matched subsequences, halved
  *    with integer FLOOR (rapidfuzz convention, not the textbook /2.0);
  *  - Winkler prefix boost `j + l·0.1·(1-j)` with l = common prefix
  *    capped at 4, applied ONLY when jaro > 0.7 (the original
  *    Winkler boost threshold — DuckDB gates on it too);
  *  - case-sensitive, over Unicode code points (byte-identical to
  *    per-character comparison on ASCII, where the oracle runs).
  */
object JaroWinklerUtil {

  /** Code points via the shared truncation-tolerant walk. */
  private def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cs = Utf8Walk.next(bytes, i, n)
      out(k) = (cs >>> 3).toInt
      k += 1
      i += (cs & 7L).toInt
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }

  def jaro(a: UTF8String, b: UTF8String): Double =
    jaroCp(codePoints(a), codePoints(b))

  private def jaroCp(s1: Array[Int], s2: Array[Int]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order and
    // count mismatched aligned pairs, then FLOOR the half count — the
    // rapidfuzz convention DuckDB ships (an odd mismatch count rounds
    // DOWN, where the textbook t/2.0 keeps the half; differential
    // fixtures pin this)
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = codePoints(a)
    val s2 = codePoints(b)
    val j = jaroCp(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(math.min(s1.length, s2.length), 4)
    while (l < max && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** Codegen'd Jaro-Winkler similarity over two string columns: one
  * static call in whole-stage codegen (the PolyHash/WordStats kernel
  * discipline — no UDF boxing, no codegen fallback in the blocked
  * linkage join's hot verify loop).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two string columns, got $other")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerUtil.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
