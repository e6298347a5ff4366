package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `Column.expr` bridge that
  * custom Catalyst expressions need; the replacement
  * (`classic.ExpressionUtils`) is `private[sql]`. This object lives inside
  * the `org.apache.spark.sql` package namespace purely to re-export those
  * two conversions to graft's custom expressions (e.g.
  * `graft.functions.FloatVecDot`). No Spark internals are used beyond the
  * sanctioned Column↔Expression adapters. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → catalyst conversion. [[expression]] wraps the
    * Column in a lazy `ColumnNodeExpression`, which only converts at the
    * Dataset API boundary — spliced into a plan by an injected SQL
    * FUNCTION builder it reaches codegen unconverted and dies with
    * `Cannot generate code for expression`. This converts the whole node
    * tree up front into plain (possibly unresolved) catalyst expressions
    * the analyzer then resolves normally — the right bridge for
    * functionRegistry builders that compose `functions._` kernels. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — needed by graft's native operators (e.g. the as-of
    * join) that plan a custom node rather than compose built-ins. */
  def dataFrame(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Register a function builder on a live session (sessionState is
    * `private[sql]`; harnesses that build their own SparkSession have no
    * extensions hook, so graft registers through this). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Same, for table-valued functions (`SELECT … FROM fn(…)`): the live-
    * session twin of `SparkSessionExtensions.injectTableFunction`. */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
}
