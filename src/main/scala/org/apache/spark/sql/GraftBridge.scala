package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversion — the standard
  * pattern for libraries that define native Catalyst expressions against
  * the classic (non-Connect) Spark 4 API. */
object GraftBridge {
  def column(e: Expression): Column       = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression   = classic.ExpressionUtils.expression(c)

  /** The CONVERTED catalyst expression of a Column: a Scala-API Column
    * wraps a lazy ColumnNode tree (`===` is an internal
    * UnresolvedFunction node, not an EqualTo), which pattern-matching
    * extractors cannot see through — this runs the same converter the
    * analyzer uses, yielding real comparison nodes. */
  def convertedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** The session's stable UUID (`private[sql]`) — collision-free cache
    * keying, unlike an identityHashCode. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** A DataFrame over an explicit logical plan (`Dataset.ofRows` is
    * `private[sql]`) — used to swap a relation's FileIndex for a
    * delegating skipping view without re-reading path lists. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A parquet scan plan over an explicit [[execution.datasources.FileIndex]]
    * with pinned schemas — the manifest-snapshot read path, where the
    * file set must come from the manifest (never a fresh listing) and
    * the schemas from commit time (never re-inference, which could fail
    * mid-rewrite). */
  def parquetSnapshotPlan(spark: SparkSession,
                          index: execution.datasources.FileIndex,
                          partitionSchema: types.StructType,
                          dataSchema: types.StructType)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val rel = execution.datasources.HadoopFsRelation(
      index, partitionSchema, dataSchema, None,
      new execution.datasources.parquet.ParquetFileFormat(),
      Map.empty[String, String])(spark.asInstanceOf[classic.SparkSession])
    execution.datasources.LogicalRelation(rel)
  }

  /** An independent session FORK (confs, temp views, injected rules all
    * copied, then isolated) — `cloneSession()` is `private[sql]`. Lets a
    * driver-side task pool run conf-scoped work (e.g. a fixture build
    * that toggles `spark.graft.merge.mode`) without racing the shared
    * session's conf. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Emit each input row `timesCol` times (a LONG column; rows with a
    * non-positive count emit nothing) and drop the count column — the
    * streaming row-replication node Spark's own RewriteExceptAll plants
    * ([[catalyst.expressions.ReplicateRows]] under a Generate), exposed
    * so a caller computing a SIGNED multiset diff in ONE aggregation can
    * expand net multiplicities without materializing per-row arrays
    * (`explode(sequence(...))` would buffer a row's whole multiplicity). */
  def replicateRows(df: DataFrame, timesCol: String): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val times = analyzed.output.find(_.name == timesCol).getOrElse(
      throw new IllegalArgumentException(
        s"replicateRows: no column '$timesCol' in ${analyzed.output.map(_.name)}"))
    require(times.dataType == types.LongType,
      s"replicateRows: '$timesCol' must be LONG, got ${times.dataType.sql}")
    val rest = analyzed.output.filterNot(_.exprId == times.exprId)
    val gen = catalyst.plans.logical.Generate(
      catalyst.expressions.ReplicateRows(times +: rest),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Nil, analyzed)
    ofRows(df.sparkSession, catalyst.plans.logical.Project(rest, gen))
  }

  /** Re-flag a batch relation plan as STREAMING — what a V1
    * `Source.getBatch` must return (the engine asserts isStreaming;
    * `FileStreamSource` builds its relations the same way). Also flips
    * [[execution.LogicalRDD]] leaves: a source that MATERIALIZES its
    * batch (localCheckpoint — the row-level CDC mode, whose diff plan
    * would otherwise put an Except under streaming planning) returns
    * one of those. */
  def asStreamingRelation(spark: SparkSession, df: DataFrame): DataFrame =
    ofRows(spark, df.queryExecution.analyzed.transform {
      case r: execution.datasources.LogicalRelation => r.copy(isStreaming = true)
      case r: execution.LogicalRDD =>
        execution.LogicalRDD(r.output, r.rdd, r.outputPartitioning, r.outputOrdering,
          isStreaming = true, r.stream)(
          spark.asInstanceOf[classic.SparkSession], None, None)
    })
}
