package graft.plans

import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._
import graft.sql.Resolver

/** Analysis-time enforcement of the reference's typed overload resolver
  * ([[graft.sql.Resolver]], reference logical/function.go +
  * logical/group_by.go) on the dialect's parsed plans.
  *
  * `rewritePlan` swaps every expression the reference would typecheck —
  * arithmetic, comparisons, NOT, LIKE, regex matches, the scalar
  * function calls, the aggregate calls — for `RuntimeReplaceable`
  * wrappers. Once the analyzer resolves child types, each wrapper:
  *
  *  1. maps the children's Spark types to octosql types
  *     (`Resolver.ofDataType`; VARIANT and other Spark-only types map to
  *     None and skip the check, keeping the union-typed JSON paths on
  *     their legacy behavior),
  *  2. runs `Resolver.resolveFunction`/`resolveAggregate`, which throws
  *     the reference's `unknown function: name(T1, T2)` /
  *     `unknown aggregate: name(T)` as a TypecheckException on any
  *     combination the reference rejects (`1 + 2.0`, `sqrt(1)`,
  *     `1 < 'a'`, `sum('a')`, `min(Time)`, ...), and
  *  3. builds the Spark-native implementation, so after the optimizer's
  *     ReplaceExpressions pass the physical plan is 100% built-in
  *     codegen'd expressions — the wrappers never reach execution.
  *
  * The aggregate forms mirror the reference execution semantics:
  * `avg` = `sum/count` through [[OctoArith.buildDiv]] (Go's truncating
  * Int division and nanosecond Duration division, aggregates/average.go),
  * `array_agg` collects then value-sorts (the reference's btree state,
  * aggregates/array.go), `*_distinct` names set the DISTINCT flag
  * (aggregates/distinct.go).
  */
object OctoResolve {

  /** Typecheck a call if every argument type maps into octosql's
    * algebra; no-op (legacy behavior) when any argument is VARIANT-like.
    */
  private[plans] def gate(name: String, args: Seq[Expression]): Unit = {
    val ots = args.map(e => Resolver.ofDataType(e.dataType, e.nullable))
    if (ots.forall(_.isDefined))
      Resolver.resolveFunction(name, ots.map(_.get))
    else {
      // VARIANT-ish arguments skip the type check, but ARITY is still
      // checkable against the table — without this, buildScalar's
      // args(1)/args(2) would throw a raw IndexOutOfBoundsException
      // (or silently ignore extra arguments) instead of the
      // reference's error
      val ds = Resolver.functions.get(name).map(_.descriptors).getOrElse(Nil)
      val arityOk = ds.exists(d =>
        if (d.typeFn.isDefined) d.typeFnArity.forall(_ == args.length)
        else d.argumentTypes.length == args.length)
      if (ds.nonEmpty && !arityOk) {
        val shown = args.lazyZip(ots).map((e, t) =>
          t.map(_.display).getOrElse(e.dataType.simpleString))
        throw new graft.sql.Dialect.TypecheckException(
          s"unknown function: $name(${shown.mkString(", ")})")
      }
    }
  }

  private def lng(e: Expression) =
    if (e.dataType == LongType) e else Cast(e, LongType)
  private def dbl(e: Expression) =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)

  /** Align two operands onto one Spark type for a natively-built
    * comparison: post-resolution nodes never see the analyzer's implicit
    * casts, so `longcol > 2` (long vs int) must be aligned by hand. The
    * gate has already ensured octosql-type equality; this only
    * reconciles Spark's physical representations of the same octosql
    * type.
    */
  private def alignPair(l: Expression, r: Expression): (Expression, Expression) = {
    def integral(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true; case _ => false
    }
    def numeric(t: DataType) =
      integral(t) || t == DoubleType || t == FloatType
    def timeish(t: DataType) =
      t == TimestampType || t == TimestampNTZType || t == DateType
    if (l.dataType == r.dataType) (l, r)
    else (l.dataType, r.dataType) match {
      case (a, b) if integral(a) && integral(b) => (lng(l), lng(r))
      case (a, b) if numeric(a) && numeric(b)   => (dbl(l), dbl(r))
      case (_: DecimalType, _: DecimalType) =>
        (Cast(l, DecimalType(38, 9)), Cast(r, DecimalType(38, 9)))
      case (a, b) if timeish(a) && timeish(b) =>
        (Cast(l, TimestampType), Cast(r, TimestampType))
      case _ => (l, Cast(r, l.dataType)) // legacy/VARIANT fallback
    }
  }

  // ---- scalar wrappers ------------------------------------------------

  abstract class OctoWrapper extends Expression with RuntimeReplaceable

  /** Comparison operators: both sides must have EQUAL octosql types
    * (functions.go:21-122 TypeFn) — `1 < 2.0` is a type error.
    */
  case class OctoCmp(op: String, left: Expression, right: Expression)
      extends OctoWrapper {
    override def children: Seq[Expression] = Seq(left, right)
    override lazy val replacement: Expression = {
      gate(op, children)
      val (l, r) = alignPair(left, right)
      op match {
        case "<"  => LessThan(l, r)
        case "<=" => LessThanOrEqual(l, r)
        case ">"  => GreaterThan(l, r)
        case _    => GreaterThanOrEqual(l, r)
      }
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  /** Unary minus — Int, Float or Duration only (functions.go `-`). */
  case class OctoNeg(child: Expression) extends OctoWrapper {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = {
      gate("-", children)
      UnaryMinus(child)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** `not` requires Boolean (functions.go:473-485). */
  case class OctoNot(child: Expression) extends OctoWrapper {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = {
      gate("not", children)
      Not(child)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** LIKE requires (String, String) (functions.go:487-590). */
  case class OctoLikeExpr(left: Expression, right: Expression, escapeChar: Char)
      extends OctoWrapper {
    override def children: Seq[Expression] = Seq(left, right)
    override lazy val replacement: Expression = {
      gate("like", children)
      Like(left, right, escapeChar)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  /** `~` and friends require (String, String) (functions.go:591-668).
    * The token rewriter folds `~* !~ !~*` into RLIKE/NOT RLIKE before
    * parse, so the typecheck error names the base `~` operator.
    */
  case class OctoRegexExpr(left: Expression, right: Expression) extends OctoWrapper {
    override def children: Seq[Expression] = Seq(left, right)
    override lazy val replacement: Expression = {
      gate("~", children)
      RLike(left, right)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  /** A named scalar call resolved against the descriptor table; the
    * implementation dispatch is Spark-type-driven so VARIANT-argument
    * calls (which skip the gate) get the legacy behavior.
    */
  case class OctoCall(name: String, args: Seq[Expression]) extends OctoWrapper {
    override def children: Seq[Expression] = args
    override lazy val replacement: Expression = {
      gate(name, args)
      buildScalar(name, assertVariants(name, args))
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(args = c)
  }

  /** The Maybe-pass TypeAssertion analog for VARIANT arguments
    * (logical/function.go:81-125 + execution/expressions.go:62-77): a
    * union-typed argument is narrowed at runtime toward the first
    * arity-matching descriptor's parameter type via `variant_get`, which
    * errors on a wrong runtime type exactly where the reference's
    * TypeAssertion raises `invalid type: X, expected: Y`. Without this,
    * `upper(union_col)` died in analysis with an internal
    * "replacement is unresolved" error.
    *
    * The conversion functions are excluded: `int`/`float`/`string` over
    * VARIANT already cast natively with the reference's null-on-fail
    * semantics (oracle-verified), which a strict assertion would break.
    */
  private def assertVariants(name: String, args: Seq[Expression]): Seq[Expression] = {
    if (!args.exists(_.dataType == VariantType)) return args
    if (name == "int" || name == "float" || name == "string") return args
    val ds = Resolver.functions.get(name).map(_.descriptors).getOrElse(Nil)
    // LAST arity-matching descriptor, mirroring the resolver's own
    // last-match-wins descriptor loops — for (Int),(Float) overload
    // chains like abs/time_from_unix this asserts toward Float, which
    // is also what the reference's static union types (JSON numbers are
    // all Float) would Maybe-match
    ds.reverse.find(d => d.typeFn.isEmpty && d.argumentTypes.length == args.length) match {
      case Some(d) =>
        args.lazyZip(d.argumentTypes).map { (e, t) =>
          val nn = Resolver.nonNullable(t)
          val target = graft.octo.OType.toSpark(nn)
          if (e.dataType != VariantType || t == graft.octo.OAny ||
              target == VariantType) e
          else variantAssert(e, target, nn.display)
        }.toSeq
      case None => args
    }
  }

  /** Runtime type assertion on one VARIANT value: the runtime type must
    * BE the expected octosql type — `variant_get` alone would silently
    * coerce (a variant Int casts to "17" as a string), where the
    * reference errors `invalid type: Int, expected: String`
    * (execution/expressions.go:62-77). NULL passes through (strict
    * descriptors' assertion targets are summed with NULL).
    *
    * Cost note: `schema_of_variant` appears in several branch
    * conditions; on the PASS path at most ~3 evaluate per row (the
    * null/VOID guard and the target's type test) — the wider CaseWhen
    * computing the octosql name only runs on the error path, right
    * before a raise.
    */
  private def variantAssert(e: Expression, target: DataType,
                            expectedName: String): Expression = {
    import org.apache.spark.sql.catalyst.expressions.variant.{SchemaOfVariant, VariantGet}
    val sch = SchemaOfVariant(e)
    def eq(s: String) = EqualTo(sch, Literal(s))
    def pre(s: String) = StartsWith(sch, Literal(s))
    def any(cs: Expression*) = cs.reduce(Or(_, _))
    val isInt = any(eq("BIGINT"), eq("INT"), eq("SMALLINT"), eq("TINYINT"))
    val isFloat = any(eq("DOUBLE"), eq("FLOAT"), pre("DECIMAL"))
    val typeOk: Expression = target match {
      case StringType                => eq("STRING")
      case LongType | IntegerType    => isInt
      case DoubleType                => isFloat
      case BooleanType               => eq("BOOLEAN")
      case TimestampType             => pre("TIMESTAMP")
      case _: DecimalType            => pre("DECIMAL")
      case _                         => Literal(true)
    }
    // the runtime type's octosql display name for the error text
    val actualName = CaseWhen(Seq(
      (eq("STRING"), Literal("String")),
      (isInt, Literal("Int")),
      (isFloat, Literal("Float")),
      (eq("BOOLEAN"), Literal("Boolean")),
      (pre("TIMESTAMP"), Literal("Time")),
      (pre("ARRAY"), Literal("List")),
      (pre("OBJECT"), Literal("Object"))), Some(sch))
    // timeZoneId set explicitly: TimeZoneAware nodes built inside
    // replacements are never visited by the analyzer's ResolveTimeZone
    val get = VariantGet(e, Literal("$"), target, failOnError = false,
      timeZoneId = Some(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    If(Or(IsNull(e), eq("VOID")),
      Literal.create(null, target),
      If(typeOk, get,
        Cast(RaiseError(Concat(Seq(
          Literal("invalid type: "), actualName,
          Literal(s", expected: $expectedName")))), target)))
  }

  /** Spark-native implementations per function (functions.go semantics;
    * cites given where behavior is non-obvious). Total over the types
    * the gate admits plus the legacy VARIANT paths.
    */
  private def buildScalar(name: String, args: Seq[Expression]): Expression = {
    def a0 = args(0)
    def a1 = args(1)
    name match {
      // math functions expect DOUBLE inputs and, built post-resolution,
      // get no implicit casts — align FloatType columns by hand
      case "abs"   => Abs(a0)
      case "sqrt"  => Sqrt(dbl(a0))
      // reference ceil/floor return Float (functions.go:394-419); Spark's
      // return BIGINT, so cast back
      case "ceil"  => Cast(Ceil(dbl(a0)), DoubleType)
      case "floor" => Cast(Floor(dbl(a0)), DoubleType)
      case "log2"  => Log2(dbl(a0))
      case "log"   => Log(dbl(a0)) // natural log, like Go math.Log
      case "log10" => Log10(dbl(a0))
      case "pow"   => Pow(dbl(a0), dbl(a1))
      case "upper" => Upper(a0)
      case "lower" => Lower(a0)
      case "reverse" => Reverse(a0)
      case "like"  => Like(a0, a1, '\\')
      case "~"     => RLike(a0, a1)
      case "not"   => Not(a0)
      case "substr" =>
        // 0-based (functions.go:713-743): Spark substring is 1-based and
        // clamps identically for pos >= 1. A negative start PANICS in
        // the reference (Go slice bounds); clamp to the string start
        // here rather than inherit Spark's count-from-the-end surprise.
        // Greatest SKIPS nulls, so guard explicitly: a NULL start must
        // stay NULL (strict descriptor), not clamp to 1.
        val rawPos = Cast(Add(lng(args(1)), Literal(1L)), IntegerType)
        val pos = If(IsNull(args(1)),
          Literal.create(null, IntegerType),
          Greatest(Seq(rawPos, Literal(1))))
        val len = if (args.length > 2) Cast(args(2), IntegerType)
                  else Literal(Integer.MAX_VALUE)
        Substring(args(0), pos, len)
      case "replace" => StringReplace(a0, a1, args(2))
      case "position" =>
        // 0-based, NULL when absent (functions.go:757-773)
        val ins = StringInstr(a0, a1)
        If(EqualTo(ins, Literal(0)),
          Literal.create(null, LongType),
          Cast(Subtract(ins, Literal(1)), LongType))
      case "len" => a0.dataType match {
        case _: ArrayType | _: MapType => Cast(Size(a0), LongType)
        case st: StructType =>
          // len(object) is its field count (functions.go:800-814)
          If(IsNull(a0), Literal.create(null, LongType),
            Literal(st.fields.length.toLong))
        case _ => Cast(Length(a0), LongType)
      }
      case "now" => CurrentTimestamp()
      case "parse_time" => OctoFns.OctoParseTime(a0, a1).replacement
      case "time_from_unix" => SecondsToTimestamp(a0)
      case "time_to_unix" =>
        UnixSeconds(if (a0.dataType == TimestampType) a0 else Cast(a0, TimestampType))
      case "int" => a0.dataType match {
        // int(Duration) is the nanosecond count, like Go int64(d)
        // (functions.go:946-953); durations are DECIMAL(38,9) seconds
        case _: DecimalType =>
          Cast(Multiply(Cast(a0, DecimalType(38, 9)),
            Literal(Decimal(1000000000L), DecimalType(20, 0))), LongType)
        case _ => Cast(a0, LongType) // trunc-toward-zero; NULL on bad strings
      }
      case "float" => a0.dataType match {
        case _: DecimalType =>
          Cast(Multiply(Cast(a0, DecimalType(38, 9)),
            Literal(Decimal(1000000000L), DecimalType(20, 0))), DoubleType)
        case _ => Cast(a0, DoubleType)
      }
      case "string" => OctoFns.OctoString(a0).replacement
      case other => throw new IllegalStateException(s"no impl for $other")
    }
  }

  // ---- aggregate wrappers --------------------------------------------

  /** A single-function aggregate (sum/min/max/count) gated by the
    * aggregate descriptor table. `errName` is the name as written
    * (`sum_distinct`, `avg`, ...) for reference-parity error text.
    */
  case class OctoAggFn(fnName: String, errName: String, child: Expression)
      extends AggregateFunction with RuntimeReplaceableAggregate {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: AggregateFunction = {
      Resolver.ofDataType(child.dataType, child.nullable)
        .foreach(t => Resolver.resolveAggregate(errName, t))
      fnName match {
        case "sum" => child.dataType match {
          // Duration sums stay on the dialect's DECIMAL(38,9) seconds
          case _: DecimalType => Sum(Cast(child, DecimalType(38, 9)))
          case _              => Sum(child)
        }
        case "min" => Min(child)
        case "max" => Max(child)
        case _     => Count(child)
      }
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** `avg` = sum/count with Go division semantics per type
    * (aggregates/average.go): Int truncates toward zero, Duration
    * divides as int64 nanoseconds — exactly [[OctoArith.buildDiv]].
    */
  case class OctoAvgCall(sumExpr: Expression, cntExpr: Expression)
      extends OctoWrapper {
    override def children: Seq[Expression] = Seq(sumExpr, cntExpr)
    override lazy val replacement: Expression = OctoArith.buildDiv(sumExpr, cntExpr)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(sumExpr = c(0), cntExpr = c(1))
  }

  /** `array_agg` output is value-sorted (the reference's btree state,
    * aggregates/array.go — array_0 golden ordering).
    */
  case class OctoArrayAgg(aggExpr: Expression) extends OctoWrapper {
    override def children: Seq[Expression] = Seq(aggExpr)
    override lazy val replacement: Expression = SortArray(aggExpr, Literal(true))
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(aggExpr = c(0))
  }

  // ---- plan rewrite ---------------------------------------------------

  /** Scalar names resolved through the descriptor table. `panic` stays a
    * token rewrite (needs its select-item index), `unnest` is a
    * generator (a logical-plan concern, not an expression).
    */
  private val ScalarNames = Set(
    "abs", "sqrt", "ceil", "floor", "log2", "log", "log10", "pow",
    "upper", "lower", "reverse", "substr", "replace", "position", "len",
    "now", "parse_time", "time_from_unix", "time_to_unix",
    "int", "float", "string", "like")

  private val AggNames = Set(
    "count", "sum", "avg", "min", "max", "array_agg",
    "count_distinct", "sum_distinct", "avg_distinct", "array_agg_distinct")

  private def fnName(u: UnresolvedFunction): Option[String] =
    if (u.nameParts.length == 1 && u.filter.isEmpty && !u.ignoreNulls)
      Some(u.nameParts.head.toLowerCase) else None

  private def buildAgg(u: UnresolvedFunction, lname: String): Expression = {
    val distinct = u.isDistinct || lname.endsWith("_distinct")
    u.arguments match {
      case Seq(arg0) =>
        val arg = arg0 match {
          case _: UnresolvedStar => Literal(1L) // count(*)
          case e                 => e
        }
        lname.stripSuffix("_distinct") match {
          case "avg" =>
            OctoAvgCall(
              OctoAggFn("sum", lname, arg).toAggregateExpression(distinct),
              Count(arg).toAggregateExpression(distinct))
          case "array_agg" =>
            OctoArrayAgg(
              (if (distinct) CollectSet(arg) else CollectList(arg))
                .toAggregateExpression(false))
          case base =>
            OctoAggFn(base, lname, arg).toAggregateExpression(distinct)
        }
      case args =>
        // reference aggregates take exactly ONE expression (the parser
        // shape in logical/group_by.go); falling through to Spark's
        // native multi-arg resolution would compute a silently
        // different result (e.g. count(a, b) = rows where BOTH are
        // non-null) instead of the reference's typecheck rejection
        throw new graft.sql.Dialect.TypecheckException(
          s"unknown aggregate: $lname(${args.length} arguments)")
    }
  }

  /** Swap parsed expressions for resolver-gated forms (pre-analysis).
    * Subsumes [[OctoArith.rewritePlan]] — the dialect front-ends call
    * this on every parsed query plan.
    */
  def rewritePlan(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Add(l, r, _)      => OctoArith.OctoAdd(l, r)
      case Subtract(l, r, _) => OctoArith.OctoSub(l, r)
      case Multiply(l, r, _) => OctoArith.OctoMul(l, r)
      case Divide(l, r, _)   => OctoArith.OctoDiv(l, r)
      case UnaryMinus(c, _)  => OctoNeg(c)
      case LessThan(l, r)            => OctoCmp("<", l, r)
      case LessThanOrEqual(l, r)     => OctoCmp("<=", l, r)
      case GreaterThan(l, r)         => OctoCmp(">", l, r)
      case GreaterThanOrEqual(l, r)  => OctoCmp(">=", l, r)
      case Not(c)            => OctoNot(c)
      case Like(l, r, esc)   => OctoLikeExpr(l, r, esc)
      case RLike(l, r)       => OctoRegexExpr(l, r)
      case u: UnresolvedFunction if !u.isDistinct && fnName(u).exists(ScalarNames) =>
        OctoCall(fnName(u).get, u.arguments)
      case u: UnresolvedFunction if fnName(u).exists(AggNames) && !u.isInternal =>
        buildAgg(u, fnName(u).get)
    }
}
