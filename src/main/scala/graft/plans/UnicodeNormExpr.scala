package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization drift — the canonicalization pass every
  * multilingual corpus runs before tokenization and dedup: the same
  * visible text can arrive precomposed (é) or decomposed (e + U+0301),
  * with compatibility forms (ﬁ ligature, fullwidth Ａ) that tokenizers
  * treat as distinct. Counting the drift per document tells a pipeline
  * how much of a source needs the (more expensive) rewrite pass, and
  * `raw == nfc` is the cheap skip condition.
  */
object UnicodeNormUtil {

  /** `[rawChars, nfcChars, nfkcChars]` — code-point counts of the
    * input and its NFC / NFKC normalizations (JDK
    * [[java.text.Normalizer]], the public ICU-derived implementation).
    * Counts, not rewritten strings: the audit pass is a reduction, the
    * rewrite pass is a different operator a pipeline applies only
    * where counts say it must.
    */
  def counts(s: UTF8String): Array[Long] = {
    val str = s.toString
    val raw = str.codePointCount(0, str.length)
    val nfc =
      if (java.text.Normalizer.isNormalized(str,
          java.text.Normalizer.Form.NFC)) raw
      else {
        val n = java.text.Normalizer.normalize(str,
          java.text.Normalizer.Form.NFC)
        n.codePointCount(0, n.length)
      }
    val nfkc =
      if (java.text.Normalizer.isNormalized(str,
          java.text.Normalizer.Form.NFKC)) raw
      else {
        val n = java.text.Normalizer.normalize(str,
          java.text.Normalizer.Form.NFKC)
        n.codePointCount(0, n.length)
      }
    Array(raw.toLong, nfc.toLong, nfkc.toLong)
  }

  def countsData(s: UTF8String): GenericArrayData =
    new GenericArrayData(counts(s))
}

/** Codegen'd `array<long> [raw, nfc, nfkc]` code-point counts. */
case class UnicodeNormStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_norm_stats expects a string column, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.countsData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnicodeNormUtil.countsData($c)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormStats = copy(child = newChild)
}
