package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, First, Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Distinct, Join, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.VariantType

/** Makes `GROUP BY <union column>` and `DISTINCT` over union columns
  * WORK: Spark rejects grouping on VariantType (not an orderable/
  * groupable type), but the reference's union values have exact
  * equality — type id + value (values.go Compare == 0). Two rewrites,
  * fired at resolution time (before CheckAnalysis sees the type):
  *
  *  - a variant GROUPING expression becomes `concat(typeRank, ':',
  *    to_json(v))`: union equality is (type id, value) — values.go
  *    Compare == 0 — and to_json ALONE is not injective across
  *    alternatives (Spark renders a DECIMAL-stored 5.0 as `5`, the
  *    same as Int 5 — measured, not hypothetical), so the TypeID rank
  *    prefix (shared with [[VariantSortRule]]) restores the Int≠Float
  *    distinction; within a rank the exact json rendering is the
  *    value identity. SQL NULL and variant-null both key as `0:null`
  *    (the reference's NULL is a VALUE with type id 0);
  *  - each OUTPUT occurrence of the grouped variant becomes
  *    `first(v)` (all rows in a group share the exact value, so
  *    `first` is the value), aliased back under the original exprId so
  *    downstream operators resolve unchanged. Occurrences inside
  *    aggregate functions (`count(v)`) are left alone — there they are
  *    data references, not grouping references.
  *
  * `Distinct` is rewritten here as well (to the equivalent Aggregate)
  * because Spark only lowers Distinct→Aggregate in the OPTIMIZER,
  * after CheckAnalysis would have rejected the variant column.
  * The group-key json string never reaches the output — it exists
  * only in the shuffle, which hash-partitions on a plain string.
  */
object VariantGroupRule extends Rule[LogicalPlan] {

  private def isVariant(e: Expression): Boolean =
    e.resolved && e.dataType == VariantType

  private def toJsonKey(e: Expression): Expression = {
    import org.apache.spark.sql.types.StringType
    val json = StructsToJson(Map.empty, e, Some(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    Concat(Seq(Cast(VariantSortRule.keys(e).head, StringType),
      Literal(":"), Coalesce(Seq(json, Literal("null")))))
  }

  /** Equality-JOIN form of the key: NULL-PRESERVING, unlike the
    * grouping key — SQL `=` on NULL (SQL null or the union's typed
    * NULL value, which the reference's Kleene logic also nulls out)
    * must not match, while GROUP BY puts all NULLs in one group. A
    * null key also keeps outer-join padding semantics exact.
    */
  private def joinKey(e: Expression): Expression = {
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.sql.catalyst.expressions.variant.SchemaOfVariant
    If(Or(IsNull(e), EqualTo(SchemaOfVariant(e), Literal("VOID"))),
      Literal.create(null, StringType), toJsonKey(e))
  }

  private def firstOf(e: Expression): Expression =
    First(e, ignoreNulls = false).toAggregateExpression()

  /** Replace grouped-variant references in an output expression with
    * first(v), skipping aggregate-function subtrees.
    */
  private def fix(e: Expression, grouped: Seq[Expression]): Expression =
    e match {
      case ae: AggregateExpression => ae
      case v if isVariant(v) && grouped.exists(_.semanticEquals(v)) =>
        firstOf(v)
      case other => other.mapChildren(fix(_, grouped))
    }

  /** The min_by/max_by ordering: the sort-key triple, nulled out for
    * NULL values (SQL null or the union's typed NULL) — a null
    * ordering makes the aggregate SKIP the row, matching SQL
    * MIN/MAX null-skipping (the reference's aggregates skip NULLs
    * too; without this the typed NULL would always win min as the
    * smallest TypeID).
    */
  private def aggOrdering(v: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.variant.SchemaOfVariant
    val ks = CreateStruct(VariantSortRule.keys(v))
    If(Or(IsNull(v), EqualTo(SchemaOfVariant(v), Literal("VOID"))),
      Literal.create(null, ks.dataType), ks)
  }

  /** min/max over a union value follow Value.Compare — rewritten to
    * min_by/max_by on the sort-key triple (the value rides along, only
    * the triple needs ordering); count(DISTINCT v) counts distinct
    * null-preserving keys (SQL count skips NULL, and the union's typed
    * NULL is the NULL value). Aggregates that never order or hash the
    * variant itself (count, first, last) pass through untouched.
    *
    * The ordering triple and distinct key are NOT inlined into the
    * aggregate functions: an aggregate update re-evaluates its child
    * expressions on every input row, and the triple expands
    * schema_of_variant ~15× per reference — inlined into min_by AND
    * max_by AND count(DISTINCT) that is ~35 variant-binary walks per
    * row (measured 4.5 s warm on 6M rows). Instead [[apply]] projects
    * each distinct variant argument's triple and key ONCE per row
    * below the aggregate (`ordFor`/`keyFor` resolve to those
    * attributes), so the updates compare precomputed scalars — the
    * projection is the only place the variant is parsed.
    */
  private def rewriteAggFns(e: Expression, ordFor: Expression => Expression,
      keyFor: Expression => Expression): Expression = e.transformUp {
    case ae @ AggregateExpression(Min(v), _, _, _, _) if isVariant(v) =>
      ae.copy(aggregateFunction = MinBy(v, ordFor(v)))
    case ae @ AggregateExpression(Max(v), _, _, _, _) if isVariant(v) =>
      ae.copy(aggregateFunction = MaxBy(v, ordFor(v)))
    case ae @ AggregateExpression(c: Count, _, true, _, _)
        if c.children.exists(isVariant) =>
      ae.copy(aggregateFunction = Count(c.children.map(ch =>
        if (isVariant(ch)) keyFor(ch) else ch)))
  }

  private def hasVariantAggFn(e: Expression): Boolean = e.exists {
    case AggregateExpression(Min(v), _, _, _, _) => isVariant(v)
    case AggregateExpression(Max(v), _, _, _, _) => isVariant(v)
    case AggregateExpression(c: Count, _, true, _, _) =>
      c.children.exists(isVariant)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // min/max/count-distinct over variant args: independent of (and
    // checked before) the grouping-key rewrite, so an aggregate with
    // plain grouping keys but a variant min still rewrites. The
    // shared triple/key projection (see rewriteAggFns scaladoc) only
    // fires for ATTRIBUTE arguments — a computed variant argument
    // would itself need projecting first, and in practice variant
    // aggregates reference a materialized column.
    case a: Aggregate if a.aggregateExpressions.exists(hasVariantAggFn) =>
      import scala.collection.mutable
      val ordAliases = mutable.LinkedHashMap.empty[Expression, Alias]
      val keyAliases = mutable.LinkedHashMap.empty[Expression, Alias]
      def ordFor(v: Expression): Expression = v match {
        case attr: AttributeReference =>
          ordAliases.getOrElseUpdate(attr.canonicalized,
            Alias(aggOrdering(attr), "__variant_ord")()).toAttribute
        case other => aggOrdering(other)
      }
      def keyFor(v: Expression): Expression = v match {
        case attr: AttributeReference =>
          keyAliases.getOrElseUpdate(attr.canonicalized,
            Alias(joinKey(attr), "__variant_key")()).toAttribute
        case other => joinKey(other)
      }
      val newAggs = a.aggregateExpressions.map(ne =>
        rewriteAggFns(ne, ordFor, keyFor).asInstanceOf[NamedExpression])
      val shared = (ordAliases.values ++ keyAliases.values).toSeq
      val newChild =
        if (shared.isEmpty) a.child
        else Project(a.child.output ++ shared, a.child)
      a.copy(aggregateExpressions = newAggs, child = newChild)

    case a: Aggregate if a.groupingExpressions.exists(isVariant) &&
        a.aggregateExpressions.forall(_.resolved) =>
      val grouped = a.groupingExpressions.filter(isVariant)
      val newGrouping = a.groupingExpressions.map(g =>
        if (isVariant(g)) toJsonKey(g) else g)
      val newAggs = a.aggregateExpressions.map {
        case attr: AttributeReference
            if isVariant(attr) && grouped.exists(_.semanticEquals(attr)) =>
          Alias(firstOf(attr), attr.name)(exprId = attr.exprId)
        case al: Alias =>
          al.copy(child = fix(al.child, grouped))(al.exprId, al.qualifier,
            al.explicitMetadata, al.nonInheritableMetadataKeys)
        case ne => ne
      }
      a.copy(groupingExpressions = newGrouping,
        aggregateExpressions = newAggs)

    case Distinct(child) if child.resolved &&
        child.output.exists(_.dataType == VariantType) =>
      // the equivalent Aggregate, with the variant rewrites applied in
      // one step; output attrs keep their exprIds via the Alias trick
      val grouping = child.output.map { a =>
        if (a.dataType == VariantType) toJsonKey(a) else (a: Expression) }
      val aggs: Seq[NamedExpression] = child.output.map { a =>
        if (a.dataType == VariantType)
          Alias(firstOf(a), a.name)(exprId = a.exprId)
        else a
      }
      Aggregate(grouping, aggs, child)

    // the Dataset API's distinct()/dropDuplicates() lower to
    // Deduplicate, which Spark only converts to Aggregate in the
    // optimizer — too late for the variant check. Same rewrite as
    // Spark's ReplaceDeduplicateWithAggregate, json-keyed: non-key
    // columns become first(col) (dropDuplicates keeps an arbitrary
    // row per key; first is that, deterministically per partition
    // order).
    case Deduplicate(keys, child) if child.resolved &&
        keys.exists(_.dataType == VariantType) =>
      val grouping = keys.map(a =>
        if (a.dataType == VariantType) toJsonKey(a) else (a: Expression))
      val aggs: Seq[NamedExpression] = child.output.map { a =>
        if (keys.exists(_.semanticEquals(a))) {
          if (a.dataType == VariantType)
            Alias(firstOf(a), a.name)(exprId = a.exprId)
          else a
        } else Alias(firstOf(a), a.name)(exprId = a.exprId)
      }
      Aggregate(grouping, aggs, child)

    // equality joins on union columns: `l.v = r.v` becomes equality of
    // the null-preserving keys — which the planner then EXTRACTS as an
    // equi-join key, so the join hash-partitions instead of falling to
    // a nested loop. `<=>` uses the grouping key (nulls equal).
    // NOTE the guard checks the EqualTo's CHILDREN, not the condition:
    // EqualTo(variant, variant) itself never reaches resolved (its
    // type check fails), which is exactly why it needs rewriting.
    case j: Join if j.condition.exists(_.exists {
        case EqualTo(a, b) => isVariant(a) && isVariant(b)
        case EqualNullSafe(a, b) => isVariant(a) && isVariant(b)
        case _ => false
      }) =>
      j.copy(condition = j.condition.map(_.transformUp {
        case EqualTo(a, b) if isVariant(a) && isVariant(b) =>
          EqualTo(joinKey(a), joinKey(b))
        case EqualNullSafe(a, b) if isVariant(a) && isVariant(b) =>
          EqualNullSafe(toJsonKey(a), toJsonKey(b))
      }))

    // window PARTITION BY / ORDER BY a union column. TWO homes for the
    // variant keys, both rewritten: ExtractWindowExpressions copies the
    // spec into the logical Window node's own partitionSpec/orderSpec
    // fields (which CheckAnalysis validates) while each window
    // function's WindowSpecDefinition EXPRESSION keeps its own copy.
    // Partition key = grouping key (NULLs are one partition, as SQL
    // window partitioning groups nulls); order = the Value.Compare
    // key triple.
    case w: Window if w.partitionSpec.exists(isVariant) ||
        w.orderSpec.exists(o => isVariant(o.child)) =>
      val rewritten = w.copy(
        partitionSpec = w.partitionSpec.map(e =>
          if (isVariant(e)) toJsonKey(e) else e),
        orderSpec = expandOrder(w.orderSpec))
      rewriteSpecs(rewritten)

    // a WindowSpecDefinition still held by a pre-extraction operator
    // (e.g. a Project whose window expressions haven't been pulled
    // into a Window node yet)
    case p if p.expressions.exists(_.exists {
        case wsd: WindowSpecDefinition =>
          wsd.partitionSpec.exists(isVariant) ||
            wsd.orderSpec.exists(o => isVariant(o.child))
        case _ => false
      }) =>
      rewriteSpecs(p)
  }

  private def expandOrder(order: Seq[SortOrder]): Seq[SortOrder] =
    order.flatMap { o =>
      if (isVariant(o.child))
        VariantSortRule.keys(o.child).map(k => SortOrder(k, o.direction))
      else Seq(o)
    }

  private def rewriteSpecs(p: LogicalPlan): LogicalPlan =
    p.transformExpressions {
      case wsd: WindowSpecDefinition
          if wsd.partitionSpec.exists(isVariant) ||
            wsd.orderSpec.exists(o => isVariant(o.child)) =>
        wsd.copy(
          partitionSpec = wsd.partitionSpec.map(e =>
            if (isVariant(e)) toJsonKey(e) else e),
          orderSpec = expandOrder(wsd.orderSpec))
    }
}
