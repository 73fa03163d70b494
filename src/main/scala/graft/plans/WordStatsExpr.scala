package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-statistics kernel shared by interpreted eval and
  * generated code. Replicates EXACTLY the higher-order-function tree
  * the quality/Gopher rules were first written as (those lambdas fall
  * back to interpreted, per-row-array evaluation — the one WSCG gap
  * PLANS.md called out):
  *
  *   - `n_words`  = size(split(trim(text), "\\s+"))` — Spark `trim`
  *     strips 0x20 only; `split` keeps leading/trailing empty tokens
  *     (limit -1), so an empty trimmed string still counts 1 token.
  *     Equivalently: (number of maximal \s runs in trimmed text) + 1.
  *   - `sum_len`  = Σ length(token) — code points, empties add 0.
  *   - `n_alpha`  = tokens containing at least one [A-Za-z].
  *   - `n_stop`   = tokens whose lowercase equals an English stopword.
  *     ASCII lowering suffices: every stopword is ≤3 ASCII letters,
  *     and no non-ASCII code point Unicode-lowers into a string of ≤3
  *     ASCII letters that hits this set (U+212A kelvin → k is the only
  *     single-cp case and no stopword contains k) — differential-
  *     tested against the `lower()` formulation.
  *   - `n_punct`  = code points of RAW text (untrimmed) in the
  *     `[.,;:!?'"()\[\]{}-]` class, the punctRatio numerator.
  *
  * \s here is Java's regex class: space, \t, \n, , \f, \r.
  */
object WordStatsUtil {
  private val Schema = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false)))
  def dataType: DataType = Schema

  /** The 10 EnStopwords packed as (c0<<16)|(c1<<8)|c2 of their ASCII
    * bytes (shorter words left-padded with 0) — branchless set lookup.
    */
  private val StopPacked: Array[Int] = Array(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    .map(w => w.foldLeft(0)((acc, ch) => (acc << 8) | ch)).sorted

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def isPunct(cp: Int): Boolean = cp match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' |
         '[' | ']' | '{' | '}' | '-' => true
    case _ => false
  }

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    // trim bounds: Spark trim() strips 0x20 only
    var lo = 0
    while (lo < len && bytes(lo) == ' ') lo += 1
    var hi = len
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    var nPunct = 0L
    var nWords = 1L // split(limit=-1): tokens = ws-runs + 1
    var sumLen = 0L
    var nAlpha = 0L
    var nStop = 0L
    var inWs = false
    // current-token state
    var tokAlpha = false
    var tokPacked = 0 // lowered ASCII letters, -1 once disqualified
    var tokLen = 0

    def closeToken(): Unit = {
      if (tokAlpha) nAlpha += 1
      if (tokPacked > 0 && tokLen >= 1 && tokLen <= 3 &&
        java.util.Arrays.binarySearch(StopPacked, tokPacked) >= 0) nStop += 1
      tokAlpha = false; tokPacked = 0; tokLen = 0
    }

    var i = 0
    while (i < len) {
      val cs = Utf8Walk.next(bytes, i, len)
      val cp = (cs >>> 3).toInt
      val step = (cs & 7L).toInt
      if (isPunct(cp)) nPunct += 1
      if (i >= lo && i < hi) { // inside the trimmed region
        if (isWs(cp)) {
          if (!inWs) { closeToken(); nWords += 1; inWs = true }
        } else {
          inWs = false
          sumLen += 1
          tokLen += 1
          val lower =
            if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
          if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z'))
            tokAlpha = true
          if (tokPacked >= 0 && tokLen <= 3 &&
            lower >= 'a' && lower <= 'z')
            tokPacked = (tokPacked << 8) | lower
          else tokPacked = -1
        }
      }
      i += step
    }
    closeToken()
    new GenericInternalRow(Array[Any](nWords, sumLen, nAlpha, nStop, nPunct))
  }
}

/** Codegen'd single-pass word statistics of a string column: one static
  * call inside whole-stage codegen — replaces a forest of interpreted
  * `aggregate`/`filter`/`array_contains` lambdas (each of which
  * re-splits the string into a per-row object array).
  */
case class WordStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_stats expects a string column, got $other")
    }

  override def dataType: DataType = WordStatsUtil.dataType

  override def nullSafeEval(input: Any): Any =
    WordStatsUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordStatsUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WordStats =
    copy(child = newChild)
}

object WordStatsExpr {
  /** Register `word_stats(text)` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_stats",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"word_stats expects (text), got ${exprs.length} arguments")
        WordStats(exprs(0))
      },
      "built-in")
}
