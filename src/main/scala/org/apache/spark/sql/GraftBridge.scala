package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Expression↔Column conversions — the
  * supported pattern for third-party native expressions on Spark 4's
  * split API (the conversions are public bytecode, package-private to
  * Scala only).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Eager ColumnNode→Expression conversion. [[expression]] wraps the
    * node lazily (fine inside DataFrame plans, where the session
    * converts at analysis); a FunctionRegistry builder must return a
    * REAL expression tree — a lazy wrapper survives into physical
    * planning as an Unevaluable and fails codegen. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** Resolve the planner strategies an extensions class would inject —
    * lets tests cover the spark.sql.extensions registration contract
    * without tearing down the shared session. */
  def injectedStrategies(
      ext: SparkSessionExtensions => Unit,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] = {
    val e = new SparkSessionExtensions
    ext(e)
    e.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
  }
  /** [[injectedStrategies]] for optimizer rules — covers the
    * injectOptimizerRule leg of the extensions contract the same way. */
  def injectedOptimizerRules(
      ext: SparkSessionExtensions => Unit,
      spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] = {
    val e = new SparkSessionExtensions
    ext(e)
    e.buildOptimizerRules(spark.asInstanceOf[classic.SparkSession])
  }
}
