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
}
