package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.GraftCatalog
import graft.sources.Manifest

/** Resolves single-part relation names registered through
  * [[GraftCatalog]] to a FRESH manifest-snapshot read — injected as a
  * resolution rule by [[graft.GraftExtensions]], so `spark.table("t")`,
  * `FROM t`, and the DML statements ([[MutationSqlRule]] fires after
  * the relation resolves) all take names. Spark's own resolution runs
  * first: a session-catalog table or temp view with the same name is
  * already resolved by the time this rule sees the plan, so
  * registrations can never shadow real catalog objects. Resolution is
  * per-QUERY — the name binds to the latest committed manifest at
  * analysis time (deletion vectors applied), never to a cached plan. */
class GraftCatalogRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def resolved(name: String): Option[LogicalPlan] =
    GraftCatalog.dirOf(session, name).map(dir =>
      SubqueryAlias(name, Manifest.read(session, dir).queryExecution.analyzed))

  /** `spark.readStream.table(name)` on a registered name routes to the
    * `graft-manifest` STREAMING source (a batch snapshot plan would be
    * a confusing 'no streaming source' failure): the stream starts from
    * `earliest` — the full current snapshot as batch 0, then per-commit
    * deltas — matching Delta's `readStream.table` contract. Reader
    * options on the relation (`startingSeq`, `cdc`, `onRewrite`,
    * `onSchemaDrift`) pass through; the name binds to its directory at
    * RESOLUTION time and stays fixed for the run. */
  private def resolvedStream(name: String,
      u: UnresolvedRelation): Option[LogicalPlan] =
    GraftCatalog.dirOf(session, name).map { dir =>
      val reader = session.readStream.format("graft-manifest")
        .option("startingSeq", "earliest")
      u.options.forEach((k, v) => { reader.option(k, v); () })
      SubqueryAlias(name,
        reader.option("path", dir).load().queryExecution.analyzed)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // INSERT's target is a FIELD of the statement, not a child — the
    // generic traversal never visits it (the same special case the
    // analyzer's own ResolveRelations carries)
    case i @ InsertIntoStatement(u: UnresolvedRelation, _, _, _, _, _, _)
        if u.multipartIdentifier.size == 1 =>
      resolved(u.multipartIdentifier.head)
        .map(r => i.copy(table = r)).getOrElse(i)
    case u: UnresolvedRelation if u.multipartIdentifier.size == 1 && u.isStreaming =>
      resolvedStream(u.multipartIdentifier.head, u).getOrElse(u)
    case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
      resolved(u.multipartIdentifier.head).getOrElse(u)
  }
}
