package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.VariantType

/** Makes `ORDER BY <union column>` WORK, distributively: Spark's
  * VariantType is not orderable (CheckAnalysis rejects a Sort over
  * it), but the reference's union values have a total order —
  * Value.Compare (values.go:97-106): runtime TypeID first, then the
  * value within the type. This resolution rule rewrites each
  * variant-typed SortOrder into the three scalar sort keys of that
  * order ([[graft.types.UnionJson.typeRank]]/numKey/strKey), so the
  * sort stays a plain distributed range-partitioned SortExec — the
  * CLI's driver-side comparator ([[graft.octo.OValue.compare]]) is
  * only ever needed for final table RENDERING, never for query
  * semantics.
  *
  * Injected as a resolution rule (not optimizer): it must fire before
  * CheckAnalysis sees the unorderable type. The guard requires the
  * child resolved, and the rewritten keys are non-variant, so the rule
  * cannot re-fire on its own output.
  */
object VariantSortRule extends Rule[LogicalPlan] {

  /** The rank/num/str key triple as RAW Catalyst nodes — the Column-API
    * forms in [[graft.types.UnionJson]] convert to ColumnNodeExpression
    * wrappers that the analyzer does not normalize when a rule (rather
    * than the Dataset API) introduces them, and they then fail at
    * execution ("Cannot evaluate expression"). Same TypeID mapping as
    * UnionJson.typeRank/numKey/strKey; UnionJsonSpec pins both paths to
    * the same total order.
    */
  private[plans] def keys(e: Expression): Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.variant.{SchemaOfVariant, VariantGet}
    import org.apache.spark.sql.types._
    val sch = SchemaOfVariant(e)
    def eq(s: String) = EqualTo(sch, Literal(s))
    def pre(s: String) = StartsWith(sch, Literal(s))
    def anyOf(cs: Expression*): Expression = cs.reduce(Or(_, _))
    val isInt = anyOf(eq("BIGINT"), eq("INT"), eq("SMALLINT"), eq("TINYINT"))
    val isFloat = Or(anyOf(eq("DOUBLE"), eq("FLOAT")), pre("DECIMAL"))
    val rank = CaseWhen(Seq(
      (Or(IsNull(e), eq("VOID")), Literal(0)),
      (isInt, Literal(1)),
      (isFloat, Literal(2)),
      (eq("BOOLEAN"), Literal(3)),
      (eq("STRING"), Literal(4)),
      (pre("TIMESTAMP"), Literal(5)),
      (pre("ARRAY"), Literal(7))), Some(Literal(8)))
    // timeZoneId set explicitly: TimeZoneAware nodes built inside a
    // rule are never revisited by ResolveTimeZone (the OctoResolve
    // variantAssert note)
    val tz = Some(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    def get(dt: DataType) =
      VariantGet(e, Literal("$"), dt, failOnError = false, timeZoneId = tz)
    val num = CaseWhen(Seq(
      (Or(isInt, isFloat), get(DoubleType)),
      (eq("BOOLEAN"),
        Cast(Cast(get(BooleanType), IntegerType), DoubleType)),
      (pre("TIMESTAMP"), Cast(get(TimestampType), DoubleType, tz))),
      Some(Literal.create(null, DoubleType)))
    val str = CaseWhen(Seq((eq("STRING"), get(StringType))),
      Some(Literal.create(null, StringType)))
    Seq(rank, num, str)
  }

  private def expand(order: Seq[SortOrder]): Seq[SortOrder] =
    order.flatMap { o =>
      if (o.child.resolved && o.child.dataType == VariantType)
        // nullOrdering is NOT copied: a union NULL is a VALUE with
        // TypeID 0 (smallest), not SQL null — the rank key encodes
        // that; the within-type keys are null only across rank
        // classes the rank key already separates
        keys(o.child).map(k => SortOrder(k, o.direction))
      else Seq(o)
    }

  private def hasVariant(order: Seq[SortOrder]): Boolean =
    order.exists(o => o.child.resolved && o.child.dataType == VariantType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case s: Sort if hasVariant(s.order) =>
      s.copy(order = expand(s.order))
    // a logical Window node with variant orderSpec only occurs when
    // constructed programmatically — the SQL/Dataset path is rewritten
    // at the WindowSpecDefinition expression by VariantGroupRule
    case w: Window if hasVariant(w.orderSpec) =>
      w.copy(orderSpec = expand(w.orderSpec))
  }
}
