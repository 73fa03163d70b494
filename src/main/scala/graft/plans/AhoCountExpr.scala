package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern scan — the blocklist/contamination
  * kernel: one pass over each document counts ALL occurrences of every
  * pattern in a dictionary (policy phrases, benchmark n-grams, banned
  * strings). The naive formulation is |patterns| LIKE/replace scans
  * per document — O(n·p) and p full passes over 100 TB; the automaton
  * is O(n + matches) with the dictionary size only affecting the
  * (broadcast, built-once) trie.
  *
  * Byte-level automaton over UTF-8: exact byte-sequence matching is
  * exact codepoint matching (UTF-8 is self-synchronizing — a pattern's
  * lead byte can never alias a continuation byte), and byte goto
  * tables keep the hot loop branch-free. Per-node aggregated dict
  * links (the standard output-link compression) make match
  * accumulation O(matches), not O(n·depth).
  */
object AhoCountUtil {

  final class Automaton(patterns: Seq[String]) extends Serializable {
    // duplicates would share a trie terminal and silently zero all but
    // the last duplicate's count — reject loudly instead
    require(patterns.distinct.size == patterns.size,
      s"duplicate patterns in dictionary: ${patterns.diff(patterns.distinct).distinct.mkString(", ")}")
    require(patterns.forall(_.nonEmpty), "empty pattern in dictionary")
    val nPatterns: Int = patterns.size
    // build goto trie
    private val patBytes = patterns.map(_.getBytes("UTF-8")).toArray
    private val gotoT = scala.collection.mutable.ArrayBuffer(
      Array.fill(256)(-1))
    private val outPat = scala.collection.mutable.ArrayBuffer(-1)
    // dict-suffix link: nearest fail-ancestor that is a pattern end
    private val dictLink = scala.collection.mutable.ArrayBuffer(-1)
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    locally {
      patBytes.zipWithIndex.foreach { case (pb, pi) =>
        var node = 0
        pb.foreach { b =>
          val c = b & 0xff
          if (gotoT(node)(c) < 0) {
            gotoT += Array.fill(256)(-1)
            outPat += -1
            dictLink += -1
            fail += 0
            gotoT(node)(c) = gotoT.length - 1
          }
          node = gotoT(node)(c)
        }
        outPat(node) = pi
      }
      // BFS fail links; convert goto misses to fail transitions so the
      // runtime walk is a single table lookup per byte
      val queue = new java.util.ArrayDeque[Integer]()
      var c = 0
      while (c < 256) {
        val v = gotoT(0)(c)
        if (v < 0) gotoT(0)(c) = 0
        else { fail(v) = 0; queue.add(v) }
        c += 1
      }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        dictLink(u) =
          if (outPat(fail(u)) >= 0) fail(u) else dictLink(fail(u))
        var b = 0
        while (b < 256) {
          val v = gotoT(u)(b)
          if (v < 0) gotoT(u)(b) = gotoT(fail(u))(b)
          else { fail(v) = gotoT(fail(u))(b); queue.add(v) }
          b += 1
        }
      }
    }
    private val gotoArr: Array[Array[Int]] = gotoT.toArray
    private val outArr: Array[Int] = outPat.toArray
    private val dictArr: Array[Int] = dictLink.toArray

    /** Per-pattern occurrence counts over `s` (all matches, including
      * overlapping and nested ones).
      */
    def counts(s: UTF8String): Array[Long] = {
      val res = new Array[Long](nPatterns)
      val bytes = s.getBytes
      var node = 0
      var i = 0
      while (i < bytes.length) {
        node = gotoArr(node)(bytes(i) & 0xff)
        var m = if (outArr(node) >= 0) node else dictArr(node)
        while (m >= 0) {
          res(outArr(m)) += 1L
          m = dictArr(m)
        }
        i += 1
      }
      res
    }

    def countsData(s: UTF8String): GenericArrayData =
      new GenericArrayData(counts(s))
  }
}

/** Codegen'd per-pattern occurrence counts: `array<long>` aligned with
  * the constructor's pattern order. The automaton is built once per
  * plan and shipped as a codegen reference object — inside
  * whole-stage codegen the hot path is one virtual call per row.
  */
case class AhoCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val auto = new AhoCountUtil.Automaton(patterns)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"aho_count expects a string column, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    auto.countsData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahoAutomaton", auto,
      classOf[AhoCountUtil.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countsData($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoCount =
    copy(child = newChild)
}
