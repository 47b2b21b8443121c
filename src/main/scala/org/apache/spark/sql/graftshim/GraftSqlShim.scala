package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one Spark-internal hop graft's optimizer rule needs: wrap a
  * resolved [[LogicalPlan]] back into a [[DataFrame]] so the rewrite can
  * be EXPRESSED with the public DataFrame API (and reuse the spec-pinned
  * `AsOfJoin` operator) instead of hand-assembling raw catalyst nodes.
  * `classic.Dataset.ofRows` is `private[sql]`, hence this shim package —
  * the same accessor every Spark extension library uses; nothing else
  * internal is touched. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Wrap a catalyst [[org.apache.spark.sql.catalyst.expressions.Expression]]
    * as a public [[org.apache.spark.sql.Column]] — the inverse hop of
    * [[ofRows]], used by the interval rewrite to hand a transformed
    * residual predicate to an operator that takes `Column`s. Same story:
    * `classic.ExpressionUtils.column` is the accessor extension libraries
    * use; nothing else internal is touched. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Register a table-valued function on a LIVE session's registry — the
    * `experimental.extraOptimizations` analog for table functions, needed
    * because `SparkSessionExtensions.injectTableFunction` only applies at
    * session creation. Same access level story as [[ofRows]]:
    * `sessionState` is `private[sql]`, hence this shim package. */
  def registerTableFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => LogicalPlan): Unit =
    spark.asInstanceOf[ClassicSession].sessionState.tableFunctionRegistry
      .registerFunction(ident, info, builder)
}
