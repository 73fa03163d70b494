package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Single-pass data-quality profiling and constraint auditing — the
  * "expectations" gate a pipeline runs on every ingest batch before
  * anything downstream trusts it (the Deequ/Great-Expectations shape).
  *
  * Scale design: every metric is an aggregate with a map-side partial,
  * computed in ONE pass over the table (Spark plans the multi-distinct
  * via a bounded Expand — fan-out = number of distinct-counted columns,
  * not data). The corpus crosses one exchange carrying partial states;
  * no row-level data ever reaches the driver. Output is long-form
  * `(metric, value)` so adding a metric never changes the schema and
  * the audit table itself stays mergeable across batches.
  *
  * Float discipline: means go through exact DECIMAL sums (order-
  * independent) and divide once at the end — bit-stable across
  * partitionings and engines.
  */
object Profile {

  /** A named metric: `agg` must be an aggregate expression; its result
    * is cast to double in the long-form output (counts < 2^53 are
    * exact).
    */
  final case class Metric(name: String, agg: Column)

  /** Standard profile of a document-like table. Constraint metrics are
    * violation COUNTS (0 = constraint holds), so the audit consumer's
    * gate is `value == 0` uniformly.
    */
  def documentMetrics(idCol: String, textCol: String, langCol: String,
                      allowedLangs: Seq[String]): Seq[Metric] = Seq(
    Metric("row_count", count(lit(1))),
    Metric("id_nulls", count(lit(1)) - count(col(idCol))),
    Metric("id_dupes", count(col(idCol)) - countDistinct(col(idCol))),
    Metric("text_nulls", count(lit(1)) - count(col(textCol))),
    Metric("text_empty", count(when(length(trim(col(textCol))) === 0, 1))),
    Metric("lang_invalid",
      count(when(!col(langCol).isInCollection(allowedLangs), 1))),
    Metric("distinct_langs", countDistinct(col(langCol))),
    Metric("min_chars", min(length(col(textCol)))),
    Metric("max_chars", max(length(col(textCol)))),
    Metric("mean_chars",
      round(sum(length(col(textCol)).cast(DecimalType(28, 6)))
        .cast(DoubleType) / count(col(textCol)), 6)))

  /** Run `metrics` in one aggregate pass and unpivot to long form. */
  def audit(df: DataFrame, metrics: Seq[Metric]): DataFrame =
    stackMetrics(df.groupBy(), metrics, Nil)

  /** Grouped audit: the same one-pass metrics per `groupCol` value —
    * the per-source/per-shard QA table. Still one shuffle (the group
    * key), map-side partials intact.
    */
  def auditBy(df: DataFrame, groupCol: String,
              metrics: Seq[Metric]): DataFrame =
    stackMetrics(df.groupBy(col(groupCol)), metrics, Seq(groupCol))

  private def stackMetrics(grouped: org.apache.spark.sql.RelationalGroupedDataset,
                           metrics: Seq[Metric],
                           keep: Seq[String]): DataFrame = {
    val wide = grouped.agg(
      metrics.head.agg.cast(DoubleType).as(metrics.head.name),
      metrics.tail.map(m => m.agg.cast(DoubleType).as(m.name)): _*)
    val stacked = metrics.map(m => s"'${m.name}', `${m.name}`").mkString(", ")
    wide.select(keep.map(col) :+
      expr(s"stack(${metrics.size}, $stacked) AS (metric, value)"): _*)
  }
}
