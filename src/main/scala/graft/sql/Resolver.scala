package graft.sql

import graft.octo._
import org.apache.spark.sql.types._

/** The reference engine's typed function/aggregate overload resolver.
  *
  * Replicates, on octosql's own type algebra ([[graft.octo.OType]]):
  *
  *  - the type relation `Is` with its three-valued result
  *    (octosql/types.go:85-178): exact, maybe (runtime-checkable), isn't
  *  - `NonNullable` / `TypeIntersection` (types.go:384-441)
  *  - scalar overload resolution (logical/function.go:24-144): for each
  *    descriptor in order, strict descriptors match on non-nullable
  *    argument types, `TypeFn` descriptors compute their own
  *    output; if no descriptor matches exactly, a second pass accepts
  *    `Maybe`-related arguments and records the TypeAssertion targets
  *    the reference would insert; otherwise the reference panics with
  *    `unknown function: name(T1, T2)` — surfaced here as
  *    [[Dialect.TypecheckException]] so the CLI renders the reference's
  *    `Error: typecheck error: ...` shape
  *  - aggregate resolution (logical/group_by.go:114-172): argument may
  *    always include NULL, first-match wins, `Maybe` pass inserts an
  *    assertion, else `unknown aggregate: name(T)`
  *  - the descriptor tables themselves (functions/functions.go:18-1149
  *    and the aggregates package) — including their deliberate
  *    strictness: there is
  *    NO implicit Int↔Float coercion (`1 + 2.0` is a type error), `<`
  *    requires both sides to have equal types, `sqrt` accepts only
  *    Float, `min` has no Time overload while `max` does
  *
  * The resolver is pure (types in, descriptor/error out). Enforcement
  * happens at Spark analysis time: [[graft.plans.OctoResolve]] wraps the
  * dialect's parsed expressions in `RuntimeReplaceable` nodes whose
  * `replacement` consults this table once child types are known, so the
  * final plan is 100% native codegen'd expressions and Catalyst never
  * gets the chance to apply its own (wider) implicit coercions.
  */
object Resolver {

  // ---- type relation (types.go:85-178) -------------------------------

  /** TypeRelation ordinals — Isnt < Maybe < Is, as in the reference. */
  final val Isnt = 0
  final val Maybe = 1
  final val Is = 2

  /** `t.Is(other)` (types.go:97-178). */
  def isRel(t: OType, other: OType): Int = {
    if (other == OAny) return Is
    t match {
      case OUnion(alts) =>
        var anyFits = false
        var allFit = true
        alts.foreach { a =>
          isRel(a, other) match {
            case Is    => anyFits = true
            case Maybe => anyFits = true; allFit = false
            case _     => allFit = false
          }
        }
        // vacuously true on an empty union, like the reference's loop
        if (allFit) Is else if (anyFits) Maybe else Isnt
      case _ =>
        other match {
          case OUnion(alts) =>
            alts.foldLeft(Isnt)((acc, a) => math.max(acc, isRel(t, a)))
          case _ =>
            t match {
              case OList(e1) =>
                other match {
                  case OList(e2) =>
                    if (e2.isEmpty && e1.nonEmpty) Isnt
                    else if (e1.nonEmpty && isRel(e1.get, e2.get) < Is) Isnt
                    else Is
                  case _ => Isnt
                }
              case OStruct(f1) =>
                other match {
                  case OStruct(f2) if f1.length == f2.length &&
                      f1.zip(f2).forall { case ((n1, t1), (n2, t2)) =>
                        n1 == n2 && isRel(t1, t2) == Is } => Is
                  case _ => Isnt
                }
              case OTuple(e1) =>
                other match {
                  case OTuple(e2) if e1.length == e2.length &&
                      e1.zip(e2).forall { case (a, b) => isRel(a, b) == Is } => Is
                  case _ => Isnt
                }
              case _ => if (t.typeId == other.typeId) Is else Isnt
            }
        }
    }
  }

  /** `t1.Equals(t2)` (types.go:93-95). */
  def typesEqual(t1: OType, t2: OType): Boolean =
    isRel(t1, t2) == Is && isRel(t2, t1) == Is

  /** `NonNullable(t)` (types.go:425-441): strip NULL union alternatives;
    * a plain NULL stays NULL.
    */
  def nonNullable(t: OType): OType = t match {
    case OUnion(alts) =>
      alts.filterNot(_ == ONull) match {
        case Seq(one) => one
        case rest     => OUnion(rest)
      }
    case _ => t
  }

  /** `TypeIntersection(t1, t2)` (types.go:384-408): union of each side's
    * primitive alternatives that fully fit the other side.
    */
  def typeIntersection(t1: OType, t2: OType): Option[OType] = {
    def prims(t: OType): Seq[OType] = t match {
      case OUnion(alts) => alts.flatMap(prims)
      case _            => Seq(t)
    }
    val fits = prims(t1).filter(isRel(_, t2) == Is) ++
      prims(t2).filter(isRel(_, t1) == Is)
    fits.reduceOption(OType.typeSum)
  }

  // ---- descriptor model ----------------------------------------------

  /** One overload (physical.FunctionDescriptor): either a positional
    * signature or a `typeFn` computing the output from argument types.
    */
  final case class FnDescriptor(
      argumentTypes: Seq[OType] = Nil,
      outputType: OType = ONull,
      strict: Boolean = true,
      typeFn: Option[Seq[OType] => Option[OType]] = None,
      // typeFn descriptors have no positional signature, but every one
      // in the reference still takes a fixed number of arguments (its
      // fn checks the length); recorded here so arity stays checkable
      // when argument TYPES can't be mapped (VARIANT paths)
      typeFnArity: Option[Int] = None)

  final case class FnDetails(description: String, descriptors: Seq[FnDescriptor])

  /** A resolved call: the winning descriptor, the output type, and the
    * per-argument TypeAssertion targets the Maybe pass would insert
    * (None = argument matched exactly).
    */
  final case class ResolvedFn(
      name: String,
      index: Int,
      descriptor: FnDescriptor,
      outputType: OType,
      assertions: Seq[Option[OType]])

  /** One aggregate overload (physical.AggregateDescriptor). */
  final case class AggDescriptor(
      argumentType: OType = ONull,
      outputType: OType = ONull,
      typeFn: Option[OType => Option[OType]] = None)

  final case class ResolvedAgg(
      name: String,
      index: Int,
      descriptor: AggDescriptor,
      outputType: OType,
      assertion: Option[OType])

  // ---- scalar resolution (logical/function.go:24-144) ----------------

  def resolveFunction(name: String, argTypes: Seq[OType]): ResolvedFn = {
    val details = functions.getOrElse(name, FnDetails("", Nil))
    val nonNull = argTypes.map(nonNullable)
    var out: Option[ResolvedFn] = None
    // exact pass — NOTE: like the reference's descriptorLoop, a later
    // matching descriptor overwrites an earlier one (no early break)
    details.descriptors.zipWithIndex.foreach { case (d, i) =>
      val ats = if (d.strict) nonNull else argTypes
      d.typeFn match {
        case Some(fn) =>
          fn(ats).foreach { o =>
            out = Some(ResolvedFn(name, i, d, o, argTypes.map(_ => None)))
          }
        case None =>
          if (ats.length == d.argumentTypes.length &&
              ats.lazyZip(d.argumentTypes).forall((a, e) => isRel(a, e) == Is))
            out = Some(ResolvedFn(name, i, d, d.outputType, argTypes.map(_ => None)))
      }
    }
    if (out.isEmpty) {
      // Maybe pass (function.go:81-125): only positional descriptors;
      // Maybe-related arguments get a TypeAssertion (target summed with
      // NULL for strict descriptors, which pass NULLs through untouched)
      details.descriptors.zipWithIndex.foreach { case (d, i) =>
        if (d.typeFn.isEmpty && d.argumentTypes.length == argTypes.length) {
          val ats = if (d.strict) nonNull else argTypes
          val rels = ats.lazyZip(d.argumentTypes).map((a, e) => isRel(a, e)).toSeq
          if (rels.forall(_ >= Maybe)) {
            val asserts = rels.zipWithIndex.map { case (r, k) =>
              if (r != Maybe) None
              else Some(
                if (d.strict) OType.typeSum(d.argumentTypes(k), ONull)
                else d.argumentTypes(k))
            }
            out = Some(ResolvedFn(name, i, d, d.outputType, asserts))
          }
        }
      }
    }
    val resolved = out.getOrElse(throw new Dialect.TypecheckException(
      s"unknown function: $name(${argTypes.map(_.display).mkString(", ")})"))
    // strict functions pass NULL through: output gains | NULL when any
    // argument admits NULL (function.go:135-141)
    if (resolved.descriptor.strict &&
        argTypes.exists(a => isRel(ONull, a) == Is))
      resolved.copy(outputType = OType.typeSum(resolved.outputType, ONull))
    else resolved
  }

  // ---- aggregate resolution (logical/group_by.go:114-172) ------------

  def resolveAggregate(name: String, argType: OType): ResolvedAgg = {
    val details = aggregates.getOrElse(name, ("", Nil))._2
    // exact pass — first match wins (continue aggregateLoop)
    details.zipWithIndex.foreach { case (d, i) =>
      d.typeFn match {
        case Some(fn) =>
          fn(argType).foreach { o =>
            val o2 = if (isRel(ONull, argType) == Is) OType.typeSum(o, ONull) else o
            return ResolvedAgg(name, i, d, o2, None)
          }
        case None =>
          if (isRel(argType, OType.typeSum(d.argumentType, ONull)) == Is) {
            val o =
              if (isRel(ONull, argType) == Is) OType.typeSum(d.outputType, ONull)
              else d.outputType
            return ResolvedAgg(name, i, d, o, None)
          }
      }
    }
    // Maybe pass with assertion (group_by.go:146-170)
    details.zipWithIndex.foreach { case (d, i) =>
      if (d.typeFn.isEmpty &&
          isRel(argType, OType.typeSum(d.argumentType, ONull)) == Maybe) {
        val asserted = typeIntersection(
          OType.typeSum(d.argumentType, ONull), argType).getOrElse(ONull)
        val o =
          if (isRel(ONull, asserted) == Is) OType.typeSum(d.outputType, ONull)
          else d.outputType
        return ResolvedAgg(name, i, d, o, Some(d.argumentType))
      }
    }
    throw new Dialect.TypecheckException(
      s"unknown aggregate: $name(${argType.display})")
  }

  // ---- Spark ↔ octosql type mapping ----------------------------------

  /** The octosql type of a Spark column as the dialect stores it: Int is
    * integral, Float is floating, Duration is DECIMAL seconds (dialect
    * convention), Time is timestamp. Nullable columns become `T | NULL`.
    * Returns None for types the reference's algebra can't describe
    * statically (VARIANT unions, binary, maps) — callers skip the
    * typecheck and keep legacy behavior for those.
    */
  def ofDataType(dt: DataType, nullable: Boolean): Option[OType] = {
    val base: Option[OType] = dt match {
      case LongType | IntegerType | ShortType | ByteType => Some(OInt)
      case DoubleType | FloatType                        => Some(OFloat)
      case StringType                                    => Some(OString)
      case BooleanType                                   => Some(OBoolean)
      case TimestampType | TimestampNTZType | DateType   => Some(OTime)
      case _: DecimalType                                => Some(ODuration)
      case _: DayTimeIntervalType                        => Some(ODuration)
      case NullType                                      => Some(ONull)
      case ArrayType(et, cn) => ofDataType(et, cn).map(t => OList(Some(t)))
      case st: StructType =>
        val fs = st.fields.map(f => ofDataType(f.dataType, f.nullable).map(f.name -> _))
        if (fs.forall(_.isDefined)) Some(OStruct(fs.toSeq.map(_.get))) else None
      case _ => None // VariantType, BinaryType, MapType, ...
    }
    base.map(t => if (nullable && t != ONull) OType.typeSum(t, ONull) else t)
  }

  // ---- the function table (functions/functions.go:18-1149) -----------

  /** TypeFn shared by < <= >= >: two arguments of EQUAL types
    * (functions.go:24-32 — `Int < Float` is a type error).
    */
  private val cmpTypeFn: Seq[OType] => Option[OType] = ts =>
    if (ts.length == 2 && typesEqual(ts(0), ts(1))) Some(OBoolean) else None

  private def sig(out: OType, args: OType*) =
    FnDescriptor(argumentTypes = args.toSeq, outputType = out, strict = true)

  val functions: Map[String, FnDetails] = Map(
    "<"  -> FnDetails("", Seq(FnDescriptor(typeFn = Some(cmpTypeFn), typeFnArity = Some(2)))),
    "<=" -> FnDetails("", Seq(FnDescriptor(typeFn = Some(cmpTypeFn), typeFnArity = Some(2)))),
    ">=" -> FnDetails("", Seq(FnDescriptor(typeFn = Some(cmpTypeFn), typeFnArity = Some(2)))),
    ">"  -> FnDetails("", Seq(FnDescriptor(typeFn = Some(cmpTypeFn), typeFnArity = Some(2)))),
    "="  -> FnDetails("", Seq(sig(OBoolean, OAny, OAny))),
    "!=" -> FnDetails("", Seq(sig(OBoolean, OAny, OAny))),
    "is null" -> FnDetails("Returns true only if the argument is null.",
      Seq(FnDescriptor(Seq(OAny), OBoolean, strict = false))),
    "is not null" -> FnDetails("Returns true only if the argument is not null.",
      Seq(FnDescriptor(Seq(OAny), OBoolean, strict = false))),
    // arithmetic (functions.go:156-355) — note: NO Int↔Float mixing
    "+" -> FnDetails("", Seq(
      sig(OInt, OInt, OInt),
      sig(OFloat, OFloat, OFloat),
      sig(ODuration, ODuration, ODuration),
      sig(OTime, OTime, ODuration),
      sig(OTime, ODuration, OTime),
      sig(OString, OString, OString))),
    "-" -> FnDetails("", Seq(
      sig(OInt, OInt, OInt),
      sig(OInt, OInt),
      sig(OFloat, OFloat, OFloat),
      sig(OFloat, OFloat),
      sig(ODuration, ODuration, ODuration),
      sig(ODuration, ODuration),
      sig(OTime, OTime, ODuration))),
    "*" -> FnDetails("", Seq(
      sig(OInt, OInt, OInt),
      sig(OFloat, OFloat, OFloat),
      sig(ODuration, ODuration, OInt),
      sig(ODuration, OInt, ODuration),
      sig(OString, OString, OInt),
      sig(OString, OInt, OString))),
    "/" -> FnDetails("", Seq(
      sig(OInt, OInt, OInt),
      sig(OFloat, OFloat, OFloat),
      sig(ODuration, ODuration, OInt),
      sig(OFloat, ODuration, ODuration))),
    // math (functions.go:357-471)
    "abs" -> FnDetails("Returns absolute value of argument.",
      Seq(sig(OInt, OInt), sig(OFloat, OFloat))),
    "sqrt" -> FnDetails("Returns square root of argument.", Seq(sig(OFloat, OFloat))),
    "ceil" -> FnDetails("Returns ceiling of argument.", Seq(sig(OFloat, OFloat))),
    "floor" -> FnDetails("Returns floor of argument.", Seq(sig(OFloat, OFloat))),
    "log2" -> FnDetails("Returns the logarithm base 2 of the argument.",
      Seq(sig(OFloat, OFloat))),
    "log" -> FnDetails("Returns the natural logarithm of the argument.",
      Seq(sig(OFloat, OFloat))),
    "log10" -> FnDetails("Returns the logarithm base 10 of the argument.",
      Seq(sig(OFloat, OFloat))),
    "pow" -> FnDetails("Returns the first argument to the power of the second.",
      Seq(sig(OFloat, OFloat, OFloat))),
    // logic
    "not" -> FnDetails("Returns the negation of the argument.",
      Seq(sig(OBoolean, OBoolean))),
    // strings (functions.go:487-831)
    "like" -> FnDetails("Implements the LIKE operator. Returns whether the first argument matches the pattern in the seconds one. '_' can be used to match a single arbitrary character and '%' can be used to match any number (including 0) of characters.",
      Seq(sig(OBoolean, OString, OString))),
    "~" -> FnDetails("Implements the ~ operator. Returns whether the first argument matches the regex pattern in the second one.",
      Seq(sig(OBoolean, OString, OString))),
    "~*" -> FnDetails("Implements the ~* operator. Returns whether the first argument matches the regex pattern in the second one. Case insensitive.",
      Seq(sig(OBoolean, OString, OString))),
    "upper" -> FnDetails("Returns the argument upper cased.",
      Seq(sig(OString, OString))),
    "lower" -> FnDetails("Returns the argument lower cased.",
      Seq(sig(OString, OString))),
    "reverse" -> FnDetails("Returns the argument reversed.",
      Seq(sig(OString, OString))),
    "substr" -> FnDetails("Returns a substring of the first argument beginning at the index provided in the second argument and optionally limiting the length using the third argument.",
      Seq(sig(OString, OString, OInt), sig(OString, OString, OInt, OInt))),
    "replace" -> FnDetails(
      "Replaces all occurrences of the second argument in the first argument by the third argument.",
      Seq(sig(OString, OString, OString, OString))),
    "position" -> FnDetails(
      "Finds the first occurrence of the second argument in the first argument.",
      Seq(sig(OUnion(Seq(ONull, OInt)), OString, OString))),
    "len" -> FnDetails(
      "Returns the length of the collection: string, list, object or tuple.",
      Seq(
        sig(OInt, OString),
        FnDescriptor(typeFn = Some(ts =>
          if (ts.length == 1 && ts.head.isInstanceOf[OList]) Some(OInt) else None),
          typeFnArity = Some(1)),
        FnDescriptor(typeFn = Some(ts =>
          if (ts.length == 1 && ts.head.isInstanceOf[OStruct]) Some(OInt) else None),
          typeFnArity = Some(1)),
        FnDescriptor(typeFn = Some(ts =>
          if (ts.length == 1 && ts.head.isInstanceOf[OTuple]) Some(OInt) else None),
          typeFnArity = Some(1)))),
    // time (functions.go:833-897)
    "now" -> FnDetails("Returns the current time.", Seq(sig(OTime))),
    "parse_time" -> FnDetails(
      "Parses the time in the second argument using the pattern in the first argument. The pattern should be specified as in the Go standard library time.Parse function: https://pkg.go.dev/time#pkg-constants",
      Seq(sig(OUnion(Seq(ONull, OTime)), OString, OString))),
    "time_from_unix" -> FnDetails("Parses the unix timestamp as a time.",
      Seq(sig(OTime, OInt), sig(OTime, OFloat))),
    "time_to_unix" -> FnDetails("Converts time to unix timestamp.",
      Seq(sig(OInt, OTime))),
    // conversions (functions.go:899-1012)
    "int" -> FnDetails("Converts the argument to an int.", Seq(
      sig(OInt, OInt),
      sig(OInt, OBoolean),
      sig(OInt, OFloat),
      sig(OInt, OString),
      sig(OInt, ODuration))),
    "float" -> FnDetails("Converts the argument to an float.", Seq(
      sig(OFloat, OFloat),
      sig(OFloat, OInt),
      sig(OFloat, OString),
      sig(OFloat, ODuration))),
    "string" -> FnDetails("Converts the argument to a string.",
      Seq(FnDescriptor(Seq(OAny), OString, strict = false))),
    // array / membership (functions.go:1014-1133)
    "[]" -> FnDetails("Implements the indexing operator: list[index]",
      Seq(FnDescriptor(typeFn = Some(ts => ts match {
        case Seq(OList(el), i) if nonNullable(i) == OInt =>
          Some(el.fold(ONull: OType)(e => OType.typeSum(ONull, e)))
        case _ => None
      }), typeFnArity = Some(2)))),
    "in" -> FnDetails("", Seq(
      FnDescriptor(typeFn = Some(ts =>
        if (ts.length == 2 && nonNullable(ts(1)).isInstanceOf[OList]) Some(OBoolean) else None),
        typeFnArity = Some(2)),
      FnDescriptor(typeFn = Some(ts =>
        if (ts.length == 2 && nonNullable(ts(1)).isInstanceOf[OTuple]) Some(OBoolean) else None),
        typeFnArity = Some(2)))),
    "not in" -> FnDetails("", Seq(
      FnDescriptor(typeFn = Some(ts =>
        if (ts.length == 2 && nonNullable(ts(1)).isInstanceOf[OList]) Some(OBoolean) else None),
        typeFnArity = Some(2)),
      FnDescriptor(typeFn = Some(ts =>
        if (ts.length == 2 && nonNullable(ts(1)).isInstanceOf[OTuple]) Some(OBoolean) else None),
        typeFnArity = Some(2)))),
    // utility
    "panic" -> FnDetails("Fails the execution of OctoSQL and prints the argument.",
      Seq(FnDescriptor(Seq(OAny), OAny, strict = false))))

  // ---- the aggregate table (reference aggregates package) ------------

  private val sumOverloads = Seq(
    AggDescriptor(OInt, OInt),
    AggDescriptor(OFloat, OFloat),
    AggDescriptor(ODuration, ODuration))
  private val avgOverloads = sumOverloads
  private val countOverloads = Seq(AggDescriptor(OAny, OInt))
  // min has NO Time overload; max does (aggregates/min.go vs max.go)
  private val minOverloads = Seq(
    AggDescriptor(OInt, OInt),
    AggDescriptor(OFloat, OFloat),
    AggDescriptor(ODuration, ODuration))
  private val maxOverloads = minOverloads :+ AggDescriptor(OTime, OTime)
  private val arrayOverloads = Seq(
    AggDescriptor(typeFn = Some(t => Some(OList(Some(t))))))

  /** name → (description, descriptors), mirroring aggregates/table.go. */
  val aggregates: Map[String, (String, Seq[AggDescriptor])] = Map(
    "array_agg" -> ("Creates an array of all items in the group.", arrayOverloads),
    "array_agg_distinct" -> ("Creates an array of distinct items in the group.", arrayOverloads),
    "count" -> ("Counts all items in the group.", countOverloads),
    "count_distinct" -> ("Counts distinct items in the group.", countOverloads),
    "sum" -> ("Sums all items in the group.", sumOverloads),
    "sum_distinct" -> ("Sums distinct items in the group.", sumOverloads),
    "avg" -> ("Averages all items in the group.", avgOverloads),
    "avg_distinct" -> ("Averages distinct items in the group.", avgOverloads),
    "max" -> ("Returns maximum item in the group.", maxOverloads),
    "min" -> ("Returns minimum item in the group.", minOverloads))
}
