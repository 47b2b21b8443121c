package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorExprs.DotLongArrays

/** Session extensions: registers graft's native expressions and optimizer
  * rules for SQL users.
  *
  * Activate with `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), then:
  * {{{ SELECT dot_q(qvec_a, qvec_b) FROM pairs }}}
  *
  * Also injects the naive-pattern optimizer rewrites, DEFAULT-ON in
  * density-gated `auto` mode (each fires only past the measured per-key
  * break-even, [[graft.plans.PlanStats]]; `force` fires on every match,
  * `false` disables — per-rule confs):
  * [[graft.plans.AsOfRewriteRule]] (inequality-join argmax → the as-of
  * union+window plan; `spark.graft.asof.rewrite`) and
  * [[graft.plans.IntervalRewriteRule]] (equi-join + range containment →
  * the bucketized interval join; `spark.graft.interval.rewrite`), plus
  * [[graft.plans.EnvelopePruneRule]] (plain box-filtered parquet scans
  * route through the table's `.envelopes` file-skipping index when one
  * exists; `spark.graft.envelope.prune`), and
  * [[graft.plans.EnvelopeAggRule]] (`count`/`min`/`max` aggregates over
  * an indexed table answer from the index — metadata-scale — when an
  * exact file-set gate proves the index current;
  * `spark.graft.envelope.agg`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotLongArrays].getName, "dot_q"),
      (exprs: Seq[Expression]) => DotLongArrays(exprs(0), exprs(1))))
    e.injectOptimizerRule(session => new graft.plans.AsOfRewriteRule(session))
    e.injectOptimizerRule(session => new graft.plans.IntervalRewriteRule(session))
    // agg before prune: an aggregate the index can ANSWER outright should
    // not first be rewritten into a pruned scan (the agg rule sees through
    // a rule-planted SkippingFileIndex anyway, but first shot is cleaner)
    e.injectOptimizerRule(session => new graft.plans.EnvelopeAggRule(session))
    e.injectOptimizerRule(session => new graft.plans.EnvelopePruneRule(session))
    // named-table surface: GraftCatalog registrations resolve to fresh
    // manifest-snapshot reads (before MutationSqlRule, so DML over a
    // name lowers onto the verbs like DML over a path)
    e.injectResolutionRule(session => new graft.plans.GraftCatalogRule(session))
    // SQL DDL for the named-table surface: CREATE TABLE ... USING graft
    // LOCATION / CTAS / DROP TABLE rewrite to RunnableCommands at PARSE
    // time (the Delta pattern — 'graft' is not a DataSource class, so
    // the statements must never reach session-catalog provider lookup)
    e.injectParser((session, parser) =>
      new graft.plans.GraftSqlParser(session, parser))
    // SQL mutation surface: DELETE FROM / MERGE INTO over a path-based
    // parquet table lower onto the file-grain verbs (deleteWhere/upsert)
    e.injectResolutionRule(session => new graft.plans.MutationSqlRule(session))
    // pure-SQL whole-operator surface: SELECT * FROM graft_asof_join(...)
    GraftTableFunctions.descriptions.foreach(e.injectTableFunction)
  }
}
