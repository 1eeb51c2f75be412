package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Resolved LogicalPlan → DataFrame bridge. Spark 4 made
  * `Dataset.ofRows` `private[sql]`; the row-level SQL rewrite
  * (graft.sources.v2.GraftRowLevelRewrite) executes a MERGE source
  * plan it captured during analysis, which needs this one-line window
  * — same technique as [[ColumnBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's analyzed plan (`queryExecution` is `private[sql]`
    * on the Spark 4 API surface). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
