package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.GraftCatalog
import graft.sources.Manifest

/** Resolves relation names registered through [[GraftCatalog]] to a
  * FRESH manifest-snapshot read — injected as a resolution rule by
  * [[graft.GraftExtensions]], so `spark.table("t")`, `FROM t`, and the
  * DML statements ([[MutationSqlRule]] fires after the relation
  * resolves) all take names. Spark's own resolution runs first: a
  * session-catalog table or temp view with the same name is already
  * resolved by the time this rule sees the plan, so registrations can
  * never shadow real catalog objects. Resolution is per-QUERY — the
  * name binds to the latest committed manifest at analysis time
  * (deletion vectors applied), never to a cached plan.
  *
  * Name forms: single-part (`FROM docs`), or `graft.`-qualified
  * (`FROM graft.docs`) — the qualified form is RESERVED: when no real
  * database named `graft` exists, an unregistered `graft.x` fails with
  * a graft-aware message instead of Spark's generic table-not-found.
  *
  * Time travel over names (round 19):
  *   - `FROM t VERSION AS OF <seq>` — the retained snapshot `m<seq>`
  *     ([[Manifest.read]]'s retention contract: a vacuumed seq fails
  *     naming the retained range and both retention knobs);
  *   - `FROM t TIMESTAMP AS OF '<ts>'` — the latest commit at or
  *     before the wall-clock instant ([[Manifest.seqAtTimestamp]]);
  *   - `spark.read.option("asOf", <seq>).table("t")` — the reader-
  *     option spelling of VERSION AS OF. */
class GraftCatalogRule(session: SparkSession) extends Rule[LogicalPlan] {

  /** (display name, table dir) for a registered relation name;
    * None = not ours, fall through to Spark untouched. The qualified
    * `graft.x` form throws on an unregistered x (reserved namespace)
    * unless a REAL database named `graft` exists. */
  private def regName(parts: Seq[String]): Option[(String, String)] = parts match {
    case Seq(n) => GraftCatalog.dirOf(session, n).map(n -> _)
    case Seq(ns, n) if ns.equalsIgnoreCase("graft") &&
        !session.sessionState.catalog.databaseExists("graft") =>
      GraftCatalog.dirOf(session, n) match {
        case Some(dir) => Some(n -> dir)
        case None => throw new IllegalArgumentException(
          s"graft.$n: no graft table named '$n' is registered in this session " +
            s"(GraftCatalog.register, CREATE TABLE $n USING graft LOCATION ..., " +
            s"or a ${GraftCatalog.RegistryConf} registry holding it)")
      }
    case _ => None
  }

  private def snapshot(name: String, dir: String, seq: Option[Long]): LogicalPlan =
    SubqueryAlias(name, Manifest.read(session, dir, seq).queryExecution.analyzed)

  private def resolved(u: UnresolvedRelation): Option[LogicalPlan] =
    regName(u.multipartIdentifier).map { case (name, dir) =>
      val asOf = Option(u.options.get("asOf")).map { s =>
        try s.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft read option asOf on $name: expected a manifest seq " +
              s"(integer), got '$s'")
        }
      }
      snapshot(name, dir, asOf)
    }

  /** `spark.readStream.table(name)` on a registered name routes to the
    * `graft-manifest` STREAMING source (a batch snapshot plan would be
    * a confusing 'no streaming source' failure): the stream starts from
    * `earliest` — the full current snapshot as batch 0, then per-commit
    * deltas — matching Delta's `readStream.table` contract. Reader
    * options on the relation (`startingSeq`, `cdc`, `onRewrite`,
    * `onSchemaDrift`) pass through; the name binds to its directory at
    * RESOLUTION time and stays fixed for the run. */
  private def resolvedStream(u: UnresolvedRelation): Option[LogicalPlan] =
    regName(u.multipartIdentifier).map { case (name, dir) =>
      val reader = session.readStream.format("graft-manifest")
        .option("startingSeq", "earliest")
      u.options.forEach((k, v) => { reader.option(k, v); () })
      SubqueryAlias(name,
        reader.option("path", dir).load().queryExecution.analyzed)
    }

  private def timeTravelSeq(name: String, dir: String,
      timestamp: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      version: Option[String]): Long = (version, timestamp) match {
    case (Some(v), _) =>
      try v.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft VERSION AS OF on $name: expected a manifest seq (integer), " +
            s"got '$v'")
      }
    case (None, Some(ts)) =>
      if (!ts.resolved || !ts.foldable) throw new IllegalArgumentException(
        s"graft TIMESTAMP AS OF on $name: the timestamp must be a literal " +
          "(constant-foldable) expression")
      val micros = Cast(ts, TimestampType,
        Some(session.sessionState.conf.sessionLocalTimeZone)).eval(null)
      if (micros == null) throw new IllegalArgumentException(
        s"graft TIMESTAMP AS OF on $name: '${ts.sql}' is not a valid timestamp")
      Manifest.seqAtTimestamp(session, dir,
        Math.floorDiv(micros.asInstanceOf[Long], 1000L))
    case (None, None) => throw new IllegalArgumentException(
      s"graft time travel on $name: neither VERSION AS OF nor TIMESTAMP AS OF")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // INSERT's target is a FIELD of the statement, not a child — the
    // generic traversal never visits it (the same special case the
    // analyzer's own ResolveRelations carries)
    case i @ InsertIntoStatement(u: UnresolvedRelation, _, _, _, _, _, _) =>
      resolved(u).map(r => i.copy(table = r)).getOrElse(i)
    case tt @ RelationTimeTravel(u: UnresolvedRelation, timestamp, version) =>
      regName(u.multipartIdentifier) match {
        case Some((name, dir)) =>
          snapshot(name, dir, Some(timeTravelSeq(name, dir, timestamp, version)))
        case None => tt
      }
    case u: UnresolvedRelation if u.isStreaming =>
      resolvedStream(u).getOrElse(u)
    case u: UnresolvedRelation =>
      resolved(u).getOrElse(u)
  }
}
