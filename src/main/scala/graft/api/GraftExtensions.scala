package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorDot

/** Session extensions registering the engine's native expressions for
  * SQL use (`spark.sql.extensions=graft.api.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Currently: `vector_dot(a, b)` — the codegen'd embedding dot product
  * ([[graft.functions.VectorDot]]) — so pure-SQL pipelines get the same
  * hot path as the Column API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.HofDotRewrite)
  }
}

object GraftExtensions {
  val vectorDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vector_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    })

  /** Register on an already-built session (tests, REPL): the SQL
    * functions plus the HOF-dot optimizer rewrite (via
    * `experimental.extraOptimizations`, the live-session equivalent of
    * `injectOptimizerRule`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = vectorDotDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.HofDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.HofDotRewrite
  }
}
