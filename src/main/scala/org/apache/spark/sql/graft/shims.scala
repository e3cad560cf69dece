package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  * Spark 4 made `Column` wrap a ColumnNode and the conversion helpers
  * `private[sql]`; this shim lives under org.apache.spark.sql to reach
  * them — the standard technique for Catalyst-level extension
  * libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to construct a DataFrame from a hand-built LogicalPlan
  * (custom operator nodes). `Dataset.ofRows` moved to the
  * `private[sql]` classic package in Spark 4.
  */
object PlanShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
