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
}
