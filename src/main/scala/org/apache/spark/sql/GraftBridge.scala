package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's private[sql] Column↔Expression conversions so the
  * graft library can expose native Catalyst expressions (e.g.
  * graft.functions.DotProduct) as user-facing Columns. This is the
  * documented extension-library pattern: the classic converters live
  * behind private[sql] since the Spark Connect split.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp function backed by a native Expression builder. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Wrap a custom LogicalPlan as a DataFrame (private[sql] since the
    * Connect split) — used by graft.plans nodes like GroupTopKNode. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
