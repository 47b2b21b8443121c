package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversion — the standard
  * pattern for libraries that define native Catalyst expressions against
  * the classic (non-Connect) Spark 4 API. */
object GraftBridge {
  def column(e: Expression): Column       = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression   = classic.ExpressionUtils.expression(c)

  /** A DataFrame over an explicit logical plan (`Dataset.ofRows` is
    * `private[sql]`) — used to swap a relation's FileIndex for a
    * delegating skipping view without re-reading path lists. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
