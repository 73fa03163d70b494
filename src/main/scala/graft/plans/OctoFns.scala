package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Type-dispatched scalar functions from the reference that a token
  * rewriter can't translate (the dispatch needs analyzed child types),
  * as RuntimeReplaceable expressions registered on the session's
  * function registry (Dialect.registerFunctions).
  */
object OctoFns {

  /** `len(x)`: string → character count, list → element count, Int
    * result (reference functions/functions.go:774-831).
    */
  case class OctoLen(child: Expression) extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = child.dataType match {
      case _: ArrayType | _: MapType => Cast(Size(child), LongType)
      case _ => Cast(Length(child), LongType)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** `parse_time(s, layout)` with a Go reference-time layout
    * (functions.go:846-862): literal layouts translate to JDK patterns
    * at analysis; NULL on parse failure (try_to_timestamp semantics).
    */
  case class OctoParseTime(left: Expression, right: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(left, right)
    override lazy val replacement: Expression = {
      val fmt = right match {
        case Literal(s, StringType) if s != null =>
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
            graft.functions.Octo.goLayoutToJava(s.toString)), StringType)
        case other => other
      }
      GetTimestamp(left, fmt, TimestampType,
        timeZoneId = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone),
        failOnError = false)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  /** `string(x)`: the octosql DISPLAY string of any value
    * (functions.go:1000-1012 delegates to Value.String()): strings come
    * back quoted, floats in Go shortest form, durations as `3s`, times
    * as RFC3339, NULL as `<null>`. Go formatting runs through
    * `StaticInvoke` (codegen'd), everything else is built-ins.
    */
  case class OctoString(child: Expression) extends Expression with RuntimeReplaceable {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = {
      val clazz = classOf[graft.octo.GoFmtJ.type]
      val inner: Expression = child.dataType match {
        case StringType =>
          Concat(Seq(Literal("'"), child, Literal("'")))
        case DoubleType | FloatType =>
          StaticInvoke(clazz, StringType, "goFloatU",
            Seq(Cast(child, DoubleType)), Seq(DoubleType), returnNullable = false)
        case _: DecimalType =>
          StaticInvoke(clazz, StringType, "goDurationU",
            Seq(Cast(child, DecimalType(38, 9))), Seq(DecimalType(38, 9)),
            returnNullable = false)
        case TimestampType =>
          StaticInvoke(clazz, StringType, "rfc3339U",
            Seq(UnixMicros(child)), Seq(LongType), returnNullable = false)
        case _ => Cast(child, StringType)
      }
      // Strict=false in the reference: string(NULL) is the display
      // string "<null>", not NULL
      If(IsNull(child), Literal("<null>"), inner)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }
}
