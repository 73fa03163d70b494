package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** The reference dialect's type-directed arithmetic, as Catalyst
  * `RuntimeReplaceable` expressions (reference: functions/functions.go
  * `+` 156-207, `-` 208-267, `*` 268-319, `/` 320-355):
  *
  *  - `string + string` concatenates, `string * int` repeats
  *  - `int / int` is integer division truncating toward zero
  *  - durations (dialect convention: DECIMAL(38,9) seconds, giving the
  *    reference's nanosecond precision that Spark's microsecond
  *    intervals cannot represent): `dur / int → dur`,
  *    `dur / dur → float`, `time ± dur → time`
  *  - reference strictness via [[OctoResolve.gate]]: combinations with
  *    no descriptor — `Int + Float`, `Time - Time`, `1 / 2.0` — throw
  *    the reference's `unknown function: +(Int, Float)` typecheck error
  *    instead of falling back to Spark's implicit coercions. Arguments
  *    outside octosql's algebra (VARIANT) skip the gate and take the
  *    native operator.
  *
  * The dialect front-end swaps parsed `Add`/`Subtract`/`Multiply`/
  * `Divide` nodes for these before analysis ([[OctoResolve.rewritePlan]]);
  * children resolve normally, the `replacement` is chosen once child
  * types are known, and the optimizer's ReplaceExpressions inlines it —
  * so the final plan is 100% built-in codegen'd expressions, no UDFs.
  */
object OctoArith {

  private def isStr(t: DataType) = t == StringType
  private def isIntegral(t: DataType) = t match {
    case LongType | IntegerType | ShortType | ByteType => true; case _ => false
  }
  private def isFractional(t: DataType) = t == DoubleType || t == FloatType
  private def isNum(t: DataType) = isIntegral(t) || isFractional(t)
  private def isDur(t: DataType) = t.isInstanceOf[DecimalType] || t.isInstanceOf[DayTimeIntervalType]
  private def isTime(t: DataType) = t == TimestampType || t == TimestampNTZType

  private def dbl(e: Expression) =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)
  /** Duration expressed in microseconds as a long. */
  private def durMicros(e: Expression) = e.dataType match {
    case _: DecimalType => Cast(Multiply(e, Literal(Decimal(1000000L), DecimalType(20, 0))), LongType)
    case _ => Cast(e, LongType) // day-time interval casts to micros-backed long units
  }
  private def lng(e: Expression) =
    if (e.dataType == LongType) e else Cast(e, LongType)
  private def numPair(l: Expression, r: Expression): (Expression, Expression) =
    if (isIntegral(l.dataType) && isIntegral(r.dataType)) (lng(l), lng(r))
    else (dbl(l), dbl(r))

  /** `+` implementation per matched descriptor (type-driven, total). */
  private[plans] def buildAdd(left: Expression, right: Expression): Expression =
    (left.dataType, right.dataType) match {
      case (l, r) if isStr(l) && isStr(r) => Concat(Seq(left, right))
      case (l, r) if isTime(l) && isDur(r) =>
        MicrosToTimestamp(Add(UnixMicros(left), durMicros(right)))
      case (l, r) if isDur(l) && isTime(r) =>
        MicrosToTimestamp(Add(UnixMicros(right), durMicros(left)))
      case (l, r) if isNum(l) && isNum(r) =>
        val (a, b) = numPair(left, right); Add(a, b)
      case _ => Add(left, right)
    }

  private[plans] def buildSub(left: Expression, right: Expression): Expression =
    (left.dataType, right.dataType) match {
      case (l, r) if isTime(l) && isDur(r) =>
        MicrosToTimestamp(Subtract(UnixMicros(left), durMicros(right)))
      case (l, r) if isNum(l) && isNum(r) =>
        val (a, b) = numPair(left, right); Subtract(a, b)
      case _ => Subtract(left, right)
    }

  private[plans] def buildMul(left: Expression, right: Expression): Expression =
    (left.dataType, right.dataType) match {
      case (l, r) if isStr(l) && isIntegral(r) => StringRepeat(left, Cast(right, IntegerType))
      case (l, r) if isIntegral(l) && isStr(r) => StringRepeat(right, Cast(left, IntegerType))
      case (l, r) if isDur(l) && isIntegral(r) =>
        Cast(Multiply(Cast(left, DecimalType(38, 9)), Cast(right, DecimalType(20, 0))),
          DecimalType(38, 9))
      case (l, r) if isIntegral(l) && isDur(r) =>
        Cast(Multiply(Cast(right, DecimalType(38, 9)), Cast(left, DecimalType(20, 0))),
          DecimalType(38, 9))
      case (l, r) if isNum(l) && isNum(r) =>
        val (a, b) = numPair(left, right); Multiply(a, b)
      case _ => Multiply(left, right)
    }

  private[plans] def buildDiv(left: Expression, right: Expression): Expression =
    (left.dataType, right.dataType) match {
      case (l, r) if isIntegral(l) && isIntegral(r) =>
        // Go integer division truncates toward zero (functions.go:322-329)
        IntegralDivide(Cast(left, LongType), Cast(right, LongType))
      case (l, r) if isDur(l) && isDur(r) =>
        // duration ratio → float
        Divide(dbl(Cast(left, DecimalType(38, 9))), dbl(Cast(right, DecimalType(38, 9))))
      case (l, r) if isDur(l) && isIntegral(r) =>
        // Go Duration/int is int64 division over nanoseconds (truncating
        // toward zero) — compute exactly that, then back to seconds.
        val nanos = IntegralDivide(
          Cast(Multiply(Cast(left, DecimalType(38, 9)),
            Literal(Decimal(1000000000L), DecimalType(20, 0))), LongType),
          Cast(right, LongType))
        Cast(Divide(Cast(nanos, DecimalType(29, 0)),
          Literal(Decimal(1000000000L), DecimalType(10, 0))), DecimalType(38, 9))
      case (l, r) if isNum(l) && isNum(r) => Divide(dbl(left), dbl(right))
      case _ => Divide(left, right)
    }

  abstract class OctoBinary extends Expression with RuntimeReplaceable {
    def left: Expression
    def right: Expression
    override def children: Seq[Expression] = Seq(left, right)
  }

  case class OctoAdd(left: Expression, right: Expression) extends OctoBinary {
    override lazy val replacement: Expression = {
      OctoResolve.gate("+", children)
      buildAdd(left, right)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  case class OctoSub(left: Expression, right: Expression) extends OctoBinary {
    override lazy val replacement: Expression = {
      OctoResolve.gate("-", children)
      buildSub(left, right)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  case class OctoMul(left: Expression, right: Expression) extends OctoBinary {
    override lazy val replacement: Expression = {
      OctoResolve.gate("*", children)
      buildMul(left, right)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  case class OctoDiv(left: Expression, right: Expression) extends OctoBinary {
    override lazy val replacement: Expression = {
      OctoResolve.gate("/", children)
      buildDiv(left, right)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  /** Swap parsed arithmetic (and everything else the resolver gates) for
    * the octo dialect forms — kept as an alias of the full rewrite.
    */
  def rewritePlan(plan: LogicalPlan): LogicalPlan = OctoResolve.rewritePlan(plan)
}
