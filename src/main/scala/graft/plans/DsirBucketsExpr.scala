package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass DSIR feature hashing: the hashed-n-gram bucket ids
  * (unigrams + bigrams) of a document in one walk over the bytes —
  * replacing a split + two explodes + an interpreted `transform`
  * lambda that concatenated every bigram string per row.
  *
  * Replication contract (differentially pinned on valid UTF-8):
  * features are the tokens of `split(trim(text), "\s+")` (limit -1
  * semantics: empty tokens at exotic-whitespace edges ARE features)
  * and the strings `w_i || ' ' || w_(i+1)`; each is poly-hashed
  * (`acc*31 + cp mod 1e9+7`, [[PolyHashUtil]]'s code-point fold) and
  * bucketed mod `buckets`. The bigram hash is computed INCREMENTALLY —
  * fold(w_i) continued through ' ' and w_(i+1) — never materializing
  * the concatenated string.
  *
  * Malformed UTF-8: truncated multi-byte sequences degrade per
  * [[Utf8Walk]]'s one-code-point-per-byte policy (shared by every
  * string kernel here), whereas the split-based formulation would
  * round-trip through java.lang.String and fold U+FFFD — the two paths
  * may bucket such bytes differently. Either way the mapping is a
  * deterministic hash into the same bucket space, so DSIR weights
  * remain well-defined; only cross-formulation equality is scoped to
  * valid UTF-8.
  */
object DsirBucketsUtil {
  private val Mult = 31L
  private val Mod = 1000000007L

  def buckets(s: UTF8String,
              nBuckets: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var lo = 0
    while (lo < len && bytes(lo) == ' ') lo += 1
    var hi = len
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    // primitive buffer: no per-token boxing on the corpus-wide walk
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var hUni = 0L
    var hBig = 0L
    var hasPrev = false
    var inWs = false

    def closeWord(): Unit = {
      out += hUni % nBuckets
      if (hasPrev) out += hBig % nBuckets
      // next word's bigram state starts from this word + the separator
      hBig = (hUni * Mult + ' ') % Mod
      hasPrev = true
      hUni = 0L
    }

    def isWs(cp: Int): Boolean =
      cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' ||
        cp == '\r'

    var i = lo
    while (i < hi) {
      val cs = Utf8Walk.next(bytes, i, hi)
      val cp = (cs >>> 3).toInt
      val step = (cs & 7L).toInt
      if (isWs(cp)) {
        if (!inWs) { closeWord(); inWs = true }
      } else {
        inWs = false
        hUni = (hUni * Mult + cp) % Mod
        if (hasPrev) hBig = (hBig * Mult + cp) % Mod
      }
      i += step
    }
    closeWord()
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out.result())
  }
}

case class DsirBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dsir_buckets expects a string column, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DsirBucketsUtil.buckets(input.asInstanceOf[UTF8String], nBuckets.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.DsirBucketsUtil.buckets($c, ${nBuckets}L)")

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}
