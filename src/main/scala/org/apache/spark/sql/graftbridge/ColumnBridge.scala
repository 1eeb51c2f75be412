package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the conversion utilities
  * `private[sql]`; extensions that define native Catalyst expressions
  * (graft.functions.VectorDot) need this two-line window into them —
  * the standard technique used by Spark connector/extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst predicate → v1 `Filter`, when one exists
    * (`DataSourceStrategy.translateFilter` is `protected[sql]`; the
    * row-level DELETE rewrite uses it to decide whether the built-in
    * `SupportsDelete` pushdown path can serve a predicate). */
  def translateFilter(predicate: Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown = true)
}
