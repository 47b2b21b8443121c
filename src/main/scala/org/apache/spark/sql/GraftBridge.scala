package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversion — the standard
  * pattern for libraries that define native Catalyst expressions against
  * the classic (non-Connect) Spark 4 API. */
object GraftBridge {
  def column(e: Expression): Column       = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression   = classic.ExpressionUtils.expression(c)
}
