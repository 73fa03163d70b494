package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: parse SQL text to a logical plan, let
  * the caller transform it (graft.plans.OctoArith), and materialize it
  * as a DataFrame — the supported-API equivalent of `spark.sql` with a
  * plan hook in the middle.
  */
object GraftSqlBridge {

  def parse(spark: SparkSession, sqlText: String): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser.parsePlan(sqlText)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a Catalyst expression as a Column — for custom expressions
    * carrying non-Expression parameters (e.g. a centroid matrix), which
    * can't go through the function registry.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
