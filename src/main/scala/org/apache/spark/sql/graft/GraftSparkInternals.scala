/* Lives inside the org.apache.spark.sql package tree ON PURPOSE: the
 * two bridge helpers the row-level SQL rewrite needs — catalyst
 * Expression → public Column, resolved LogicalPlan → DataFrame — are
 * `private[sql]` in Spark 4's split API (classic.ExpressionUtils /
 * classic.Dataset.ofRows). Re-exporting them from a subpackage of
 * `sql` is the established extension technique the Delta Lake and
 * Iceberg Spark runtimes use for exactly this surface. Nothing else
 * of Spark's internals is touched; both helpers are stable across the
 * 4.x line (they ARE the implementation of Column/Dataset creation). */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftSparkInternals {

  /** Wrap a (possibly unresolved) catalyst expression as a Column —
    * `classic.ExpressionUtils.column`, the engine behind `functions.col`. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Execute a resolved logical plan as a DataFrame —
    * `classic.Dataset.ofRows`, the engine behind every `spark.sql`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
