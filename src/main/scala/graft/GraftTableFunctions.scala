package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{BooleanType, LongType, StringType}

/** Table-valued SQL functions over the [[GraftSql]] dispatch cores — the
  * PURE-SQL face of the whole-operator verbs: `spark.sql` text alone
  * reaches the audited operator plans, no Scala call in the query path.
  *
  * {{{ SELECT * FROM graft_asof_join('purchases', 'clicks', 'user_id',
  *                                   'purchase_us', 'click_us') }}}
  *
  * Input views resolve through the session catalog exactly as the verbs
  * do; arguments are positional literals (Spark's TVF arguments must be
  * foldable), with key lists comma-separated. The builder runs at
  * ANALYSIS time on the driver: the as-of and interval functions only
  * assemble a plan there (the interval width statistic is one cached
  * 1-row job, [[graft.plans.PlanStats.cachedWidth]]); `graft_heavy_hitters`
  * wraps the operator's eager sketch pass, so IT runs its candidate jobs
  * when the query analyzes — the documented [[graft.operators.HeavyHitters]]
  * trade, surfaced unchanged.
  *
  * Registered two ways (same builders): at session creation through
  * [[GraftExtensions]]'s `injectTableFunction`, and idempotently on a
  * live session through [[ensure]] (the `extraOptimizations` analog,
  * because extension injection cannot reach an already-built session).
  *
  * Signatures (trailing arguments optional):
  *  - `graft_asof_join(left, right, keys_csv, left_ts, right_ts
  *    [, direction [, strict [, tolerance [, join_type [, chunk_width
  *    [, tiebreak_csv]]]]]])`
  *  - `graft_point_in_interval(points, intervals, keys_csv, point_ts,
  *    start_col, end_col [, point_id [, bucket_width [, interval_id]]])`
  *    — a non-empty `point_id` keeps uncovered points (LEFT-OUTER); a
  *    non-empty `interval_id` (with `point_id` passed as `''`) keeps
  *    uncovered intervals
  *  - `graft_overlap_join(left, right, keys_csv, l_start, l_end, r_start,
  *    r_end [, bucket_width [, left_id]])` — a non-empty `left_id` routes
  *    to the LEFT-OUTER operator
  *  - `graft_heavy_hitters(view, item_col, phi_ppm, k [, group_cols_csv])`
  *  - `graft_sessionize(view, keys_csv, ts_col, gap [, tiebreak_csv
  *    [, min_events [, mode]]])` — gap-break sessionization; `mode` is
  *    `rollup` (default: one row per kept session) or `assign` (input
  *    rows tagged with `session_id`)
  *  - `graft_pruned_read(path, col1, lo1, hi1 [, col2, lo2, hi2, …])` —
  *    read a parquet path through its `.envelopes` file-skipping index
  *    (files provably outside the integer box are never opened; exact
  *    under stale or missing indexes)
  *  - `graft_zorder_cluster(view, cols_csv, num_partitions
  *    [, scaling])` — the Z-ordered rewrite of the view's rows
  *    (`linear` default or `quantile` rank cells), for
  *    CTAS/INSERT OVERWRITE layout-maintenance jobs written in SQL
  *  - `graft_read_healed(path)` — read a swap-maintained table after
  *    healing any interrupted DirSwap (table, partition leaf, or
  *    `.envelopes` index); healing runs at analysis — the SAME-PROCESS
  *    reader (healing mutates swap state, so it must not race the
  *    maintenance writer)
  *  - `graft_read_snapshot(path [, seq])` — resolve the table's latest
  *    (or pinned `seq`) manifest snapshot and read exactly that file
  *    set; the CROSS-PROCESS reader for manifest-maintained tables
  *    (no healing, no mutation — a rewrite race resolves to the old or
  *    new complete set, never a mix)
  *  - `graft_read_changes(path, from_seq [, to_seq])` — file-level CDC:
  *    rows of the files present in `to_seq` (default latest) but absent
  *    from `from_seq`; the incremental-consumption primitive
  *  - `graft_table_stats(path)` — one-row physical-state summary
  *    (files, bytes, manifest seq, indexed columns, and an exact
  *    metadata-only row count when the envelope index provably covers
  *    the current listing; NULL otherwise — never a scan)
  *  - `graft_connected_components(pairs_view, a_col, b_col
  *    [, algorithm])` — `propagation` (default) or `stars`; the
  *    ITERATIVE driver loop runs when the query analyzes, the
  *    `graft_heavy_hitters` eagerness trade
  *  - MAINTENANCE verbs (each lowers to a RunnableCommand — the side
  *    effect runs at EXECUTION, so EXPLAIN or re-analysis never
  *    mutates the table — and returns a one-row summary):
  *    `graft_compact(path, target_bytes[, parallelism])`,
  *    `graft_cluster(path, cols_csv, files_per_partition[, scaling,
  *    index_cols_csv, parallelism])`, `graft_vacuum(path[, keep])`,
  *    `graft_add_columns(path, ddl)` (additive, nullable — the
  *    metadata-commit widening), `graft_reify_deletes(path)`
  *    (materialize pending deletion vectors), and
  *    `graft_restore(path, seq)` (roll back to a retained snapshot —
  *    the target generation moves back in physically)
  *  - `graft_history(path)` — the retained commit history, newest
  *    first (DESCRIBE HISTORY): exactly the seqs time travel and
  *    `graft_restore` accept
  */
object GraftTableFunctions {

  // ----------------------------------------------------------- arg parsing

  private def arity(fn: String, args: Seq[Expression], lo: Int, hi: Int): Unit =
    require(args.size >= lo && args.size <= hi,
      s"$fn expects $lo to $hi arguments, got ${args.size}")

  private def lit(fn: String, args: Seq[Expression], i: Int): Any = {
    val e = args(i)
    require(e.foldable, s"$fn argument ${i + 1} must be a literal, got: ${e.sql}")
    e.eval()
  }

  private def str(fn: String, args: Seq[Expression], i: Int): String = {
    require(args(i).dataType == StringType,
      s"$fn argument ${i + 1} must be a string literal, got type ${args(i).dataType.sql}")
    String.valueOf(lit(fn, args, i))
  }

  private def lng(fn: String, args: Seq[Expression], i: Int): Long = lit(fn, args, i) match {
    case n: java.lang.Number => n.longValue
    case other => throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be an integer literal, got: $other")
  }

  private def bool(fn: String, args: Seq[Expression], i: Int): Boolean =
    if (args(i).dataType == BooleanType) lit(fn, args, i).asInstanceOf[Boolean]
    else str(fn, args, i).toBoolean

  /** A table PATH argument: a [[GraftCatalog]]-registered name resolves
    * to its directory; a real path passes through unchanged. */
  private def path(fn: String, sess: () => SparkSession,
                   args: Seq[Expression], i: Int): String =
    GraftCatalog.resolve(sess(), str(fn, args, i))

  private def opt[T](args: Seq[Expression], i: Int)(f: => T): Option[T] =
    if (i < args.size) Some(f) else None

  private def csv(s: String): Seq[String] = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  // ------------------------------------------------------------- builders
  // Each builder closes over a SESSION PROVIDER: [[ensure]] binds the
  // session it was called on, so in a multi-session JVM the function
  // resolves views and confs from its OWNING session no matter which
  // session is active when a query analyzes. The [[GraftExtensions]]
  // path cannot capture one (extension injection runs before the session
  // exists), so it falls back to `SparkSession.active` — correct there
  // because injected functions are registered per-session into the very
  // session being built, and that session is active while its own
  // queries analyze.

  private def asofBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_asof_join"
    arity(fn, args, 5, 11)
    GraftSql.asofJoinDf(sess(),
      left = str(fn, args, 0), right = str(fn, args, 1),
      keys = csv(str(fn, args, 2)),
      leftTs = str(fn, args, 3), rightTs = str(fn, args, 4),
      direction = opt(args, 5)(str(fn, args, 5)).getOrElse("backward"),
      strict = opt(args, 6)(bool(fn, args, 6)).getOrElse(false),
      tolerance = opt(args, 7)(lng(fn, args, 7)).filter(_ >= 0),
      joinType = opt(args, 8)(str(fn, args, 8)).getOrElse("inner"),
      tiebreak = opt(args, 10)(csv(str(fn, args, 10))).getOrElse(Nil),
      chunkWidth = opt(args, 9)(lng(fn, args, 9)).filter(_ > 0)
    ).queryExecution.analyzed
  }

  private def pointInIntervalBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_point_in_interval"
    arity(fn, args, 6, 9)
    GraftSql.pointInIntervalDf(sess(),
      points = str(fn, args, 0), intervals = str(fn, args, 1),
      keys = csv(str(fn, args, 2)),
      pointTs = str(fn, args, 3), startCol = str(fn, args, 4), endCol = str(fn, args, 5),
      pointId = opt(args, 6)(str(fn, args, 6)).filter(_.nonEmpty),
      bucketWidth = opt(args, 7)(lng(fn, args, 7)).filter(_ > 0),
      intervalId = opt(args, 8)(str(fn, args, 8)).filter(_.nonEmpty)
    ).queryExecution.analyzed
  }

  private def overlapBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_overlap_join"
    arity(fn, args, 7, 9)
    GraftSql.overlapJoinDf(sess(),
      left = str(fn, args, 0), right = str(fn, args, 1),
      keys = csv(str(fn, args, 2)),
      lStart = str(fn, args, 3), lEnd = str(fn, args, 4),
      rStart = str(fn, args, 5), rEnd = str(fn, args, 6),
      bucketWidth = opt(args, 7)(lng(fn, args, 7)).filter(_ > 0),
      leftId = opt(args, 8)(str(fn, args, 8)).filter(_.nonEmpty)
    ).queryExecution.analyzed
  }

  /** The sanctioned reader for swap-maintained tables (the streaming
    * self-clustering sink, `Layout.clusterPartitions` loops): heals any
    * interrupted table/leaf/index DirSwap, then reads — so a SQL-only
    * consumer taking turns with maintenance in the same process never
    * sees a half-table. Healing (bounded directory renames) runs when
    * the query ANALYZES — the `graft_heavy_hitters` eagerness trade. */
  private def readHealedBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_read_healed"
    arity(fn, args, 1, 1)
    graft.sources.Layout.readHealed(sess(), path(fn, sess, args, 0)).queryExecution.analyzed
  }

  /** The sanctioned CROSS-PROCESS reader for manifest-maintained tables:
    * resolve the latest (or a pinned) manifest snapshot and plan over
    * exactly that file set — no healing, no mutation, no listing races
    * with a concurrent OPTIMIZE or streaming-sink rewrite. */
  private def readSnapshotBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_read_snapshot"
    arity(fn, args, 1, 2)
    graft.sources.Layout.readSnapshot(sess(), path(fn, sess, args, 0),
      opt(args, 1)(lng(fn, args, 1))).queryExecution.analyzed
  }

  /** File-level CDC between two committed snapshots — rows of the files
    * added between `from_seq` and `to_seq` (default: latest). */
  private def readChangesBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_read_changes"
    arity(fn, args, 2, 3)
    graft.sources.Layout.readChanges(sess(), path(fn, sess, args, 0),
      lng(fn, args, 1), opt(args, 2)(lng(fn, args, 2))).queryExecution.analyzed
  }

  /** Row-level CDC between two committed snapshots — the exact multiset
    * of rows inserted/deleted by `(from_seq, to_seq]`, labelled in
    * `_change_type` (a pure rewrite cancels to zero rows). */
  private def readChangeRowsBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_read_change_rows"
    arity(fn, args, 2, 3)
    graft.sources.Layout.readChangeRows(sess(), path(fn, sess, args, 0),
      lng(fn, args, 1), opt(args, 2)(lng(fn, args, 2))).queryExecution.analyzed
  }

  /** One-row physical-state summary (the DESCRIBE DETAIL role): files,
    * bytes, manifest seq, indexed columns, and an exact metadata-only
    * row count when the envelope index provably covers the current
    * listing (NULL otherwise — never a scan). */
  private def tableStatsBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_table_stats"
    arity(fn, args, 1, 1)
    graft.sources.Layout.tableStats(sess(), path(fn, sess, args, 0)).queryExecution.analyzed
  }

  private def connectedComponentsBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_connected_components"
    arity(fn, args, 3, 4)
    GraftSql.connectedComponentsDf(sess(),
      pairs = str(fn, args, 0), aCol = str(fn, args, 1), bCol = str(fn, args, 2),
      algorithm = opt(args, 3)(str(fn, args, 3)).getOrElse("propagation")
    ).queryExecution.analyzed
  }

  private def sessionizeBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_sessionize"
    arity(fn, args, 4, 7)
    GraftSql.sessionizeDf(sess(),
      view = str(fn, args, 0), keys = csv(str(fn, args, 1)),
      tsCol = str(fn, args, 2), gap = lng(fn, args, 3),
      tiebreak = opt(args, 4)(csv(str(fn, args, 4))).getOrElse(Nil),
      minEvents = opt(args, 5)(lng(fn, args, 5)).getOrElse(1L),
      mode = opt(args, 6)(str(fn, args, 6)).getOrElse("rollup")
    ).queryExecution.analyzed
  }

  private def prunedReadBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_pruned_read"
    arity(fn, args, 4, 1 + 3 * 8)
    require((args.size - 1) % 3 == 0,
      s"$fn takes a path then (col, lo, hi) triples, got ${args.size} arguments")
    val box = (1 until args.size by 3).map(i =>
      (str(fn, args, i), boxVal(fn, args, i + 1), boxVal(fn, args, i + 2)))
    GraftSql.prunedReadDf(sess(), path = path(fn, sess, args, 0), box = box
    ).queryExecution.analyzed
  }

  /** A box BOUND literal: any comparable type — integer, double,
    * string, `DATE '...'`, `TIMESTAMP '...'` — converted to its external
    * (java) value so the operator's `lit()` re-embeds it with the same
    * type. NULL bounds are rejected loudly (a null bound proves
    * nothing and is always a caller bug). */
  private def boxVal(fn: String, args: Seq[Expression], i: Int): Any = {
    val v = lit(fn, args, i)
    require(v != null, s"$fn argument ${i + 1}: box bounds must not be NULL")
    org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala(v, args(i).dataType)
  }

  private def zorderBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_zorder_cluster"
    arity(fn, args, 3, 4)
    GraftSql.zorderClusterDf(sess(),
      view = str(fn, args, 0), cols = csv(str(fn, args, 1)),
      numPartitions = lng(fn, args, 2).toInt,
      // optional 4th arg: 'linear' (default) | 'quantile' (skew-resistant
      // rank cells; see Layout.zValueQuantile)
      scaling = if (args.size > 3) str(fn, args, 3) else "linear"
    ).queryExecution.analyzed
  }

  private def heavyHittersBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_heavy_hitters"
    arity(fn, args, 4, 5)
    GraftSql.heavyHittersDf(sess(),
      view = str(fn, args, 0), itemCol = str(fn, args, 1),
      phiPpm = lng(fn, args, 2), k = lng(fn, args, 3).toInt,
      groupCols = opt(args, 4)(csv(str(fn, args, 4))).getOrElse(Nil)
    ).queryExecution.analyzed
  }

  // ---------------------------------------------------- maintenance verbs
  // The SQL face of the table-MAINTENANCE layer (the mutation surface
  // stopped at DML; OPTIMIZE-style upkeep was Scala-only). Each lowers
  // to a [[GraftMaintenanceCommand]] — the side effect runs at
  // EXECUTION, like DELETE/UPDATE/MERGE: `spark.sql(...)` still
  // performs it immediately (commands execute eagerly at DataFrame
  // creation), but EXPLAIN, view resolution, or any re-analysis of the
  // statement no longer mutates the table. (The graft_heavy_hitters
  // analysis-eagerness precedent is right for read-only TVFs; these
  // verbs commit manifests and move files, so an accidental analysis
  // must stay a no-op.)

  private def longAttr(n: String): Attribute =
    AttributeReference(n, LongType, nullable = false)()

  /** `graft_compact(path, target_bytes[, parallelism])` — roll small
    * files up per leaf ([[graft.sources.Layout.compactPartitions]]);
    * returns the number of leaves rewritten. */
  private def compactBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_compact"
    arity(fn, args, 2, 3)
    val raw = str(fn, args, 0)
    val bytes = lng(fn, args, 1)
    val par = opt(args, 2)(lng(fn, args, 2)).getOrElse(1L).toInt
    GraftMaintenanceCommand(fn, Seq(longAttr("rewritten_leaves")), sp =>
      Seq(Row(graft.sources.Layout.compactPartitions(sp, GraftCatalog.resolve(sp, raw),
        targetFileBytes = bytes, parallelism = par))))
  }

  /** `graft_cluster(path, cols_csv, files_per_partition[, scaling
    * [, index_cols_csv[, parallelism]]])` — per-leaf Z-order OPTIMIZE
    * ([[graft.sources.Layout.clusterPartitions]]); returns the committed
    * manifest seq. */
  private def clusterBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_cluster"
    arity(fn, args, 3, 6)
    val raw = str(fn, args, 0)
    val cols = csv(str(fn, args, 1))
    val fpp = lng(fn, args, 2).toInt
    val scaling = opt(args, 3)(str(fn, args, 3)).getOrElse("linear")
    val indexCols = opt(args, 4)(csv(str(fn, args, 4))).getOrElse(Nil)
    val par = opt(args, 5)(lng(fn, args, 5)).getOrElse(1L).toInt
    GraftMaintenanceCommand(fn, Seq(longAttr("manifest_seq")), { sp =>
      val path = GraftCatalog.resolve(sp, raw)
      graft.sources.Layout.clusterPartitions(sp, path, cols, fpp, scaling, indexCols, par)
      Seq(Row(graft.sources.Manifest.latestSeq(sp, path).getOrElse(-1L)))
    })
  }

  /** `graft_vacuum(path[, keep])` — reclaim retired files and DV
    * sidecars past the retention window
    * ([[graft.sources.Manifest.vacuum]]); returns the retained seq
    * range. */
  private def vacuumBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_vacuum"
    arity(fn, args, 1, 2)
    val raw = str(fn, args, 0)
    val keep = opt(args, 1)(lng(fn, args, 1)).getOrElse(0L).toInt
    GraftMaintenanceCommand(fn, Seq(longAttr("latest_seq")), { sp =>
      val path = GraftCatalog.resolve(sp, raw)
      graft.sources.Manifest.vacuum(sp, path, keep)
      Seq(Row(graft.sources.Manifest.latestSeq(sp, path).getOrElse(-1L)))
    })
  }

  /** `graft_add_columns(path, ddl)` — additive schema evolution as a
    * metadata commit ([[graft.sources.Layout.addColumnsIfAbsent]]); the
    * DDL is a comma list like `'score DOUBLE, tag STRING'` (all added
    * NULLABLE); returns the committed seq. */
  private def addColumnsBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_add_columns"
    arity(fn, args, 2, 2)
    val raw = str(fn, args, 0)
    val fields = org.apache.spark.sql.types.StructType.fromDDL(str(fn, args, 1))
      .fields.toSeq.map(_.copy(nullable = true))
    GraftMaintenanceCommand(fn, Seq(longAttr("manifest_seq")), sp =>
      Seq(Row(graft.sources.Layout.addColumnsIfAbsent(sp,
        GraftCatalog.resolve(sp, raw), fields))))
  }

  /** `graft_tables()` — every resolvable named-table registration
    * (session-scoped and warehouse-registry-persisted;
    * [[GraftCatalog.registrations]]) with its directory and latest
    * committed seq (−1 when the directory is missing or unmanifested —
    * listing is a catalog read, never a failure). The SHOW TABLES role
    * for the graft catalog. */
  private def tablesBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_tables"
    arity(fn, args, 0, 0)
    val sp = sess()
    val rows = GraftCatalog.registrations(sp).toSeq.sortBy(_._1).map { case (n, d) =>
      val seq =
        try graft.sources.Manifest.latestSeq(sp, d).getOrElse(-1L)
        catch { case scala.util.control.NonFatal(_) => -1L }
      (n, d, seq)
    }
    import sp.implicits._
    rows.toDF("name", "dir", "latest_seq").queryExecution.analyzed
  }

  /** `graft_history(path)` — the retained commit history, newest first
    * ([[graft.sources.Manifest.history]], the DESCRIBE HISTORY role):
    * seq, commit time, file count, pending DV sidecar, recorded CDC
    * pair key, schema width — exactly the seqs time travel and
    * `graft_restore` accept. */
  private def historyBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_history"
    arity(fn, args, 1, 1)
    graft.sources.Manifest.history(sess(), path(fn, sess, args, 0)).queryExecution.analyzed
  }

  /** `graft_restore(path, seq)` — roll the table back to a retained
    * snapshot ([[graft.sources.Layout.restore]]: the target generation
    * moves back in physically, its schemas and DV reference
    * re-commit); returns the NEW committed seq. */
  private def restoreBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_restore"
    arity(fn, args, 2, 2)
    val raw = str(fn, args, 0)
    val seq = lng(fn, args, 1)
    GraftMaintenanceCommand(fn, Seq(longAttr("manifest_seq")), sp =>
      Seq(Row(graft.sources.Layout.restore(sp, GraftCatalog.resolve(sp, raw), seq))))
  }

  /** `graft_reify_deletes(path)` — materialize pending merge-on-read
    * deletion vectors ([[graft.sources.Layout.reifyDeletes]]); returns
    * the MutationStats row. */
  private def reifyBuilder(sess: () => SparkSession)(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_reify_deletes"
    arity(fn, args, 1, 1)
    val raw = str(fn, args, 0)
    GraftMaintenanceCommand(fn,
      Seq(longAttr("dropped_files"), longAttr("rewritten_files"),
        longAttr("untouched_files"), longAttr("dv_files")), { sp =>
      val s = graft.sources.Layout.reifyDeletes(sp, GraftCatalog.resolve(sp, raw))
      Seq(Row(s.droppedFiles, s.rewrittenFiles, s.untouchedFiles, s.dvFiles))
    })
  }

  /** A maintenance verb lowered to a leaf command: the side effect runs
    * in `run` — at EXECUTION — so EXPLAIN / view resolution / plan
    * re-analysis of a maintenance statement performs nothing.
    * `spark.sql` executes commands eagerly at DataFrame creation, so
    * the statement's user-visible timing is unchanged; all verbs stay
    * idempotent regardless. */
  final case class GraftMaintenanceCommand(verb: String,
      override val output: Seq[Attribute],
      @transient body: SparkSession => Seq[Row]) extends LeafRunnableCommand {
    override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
    override def simpleString(maxFields: Int): String = s"GraftMaintenanceCommand($verb)"
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftTableFunctions.getClass.getName, null, name, usage, "", "", "",
      "table_funcs", "4.0.0", "", "built-in")

  /** The (identifier, info, builder) triples, with every builder bound
    * to `sess` as its owning-session provider. */
  def descriptionsFor(sess: () => SparkSession): Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (new FunctionIdentifier("graft_asof_join"),
      info("graft_asof_join",
        "graft_asof_join(left, right, keys_csv, left_ts, right_ts[, direction, strict, tolerance, join_type, chunk_width, tiebreak_csv])"),
      asofBuilder(sess) _),
    (new FunctionIdentifier("graft_point_in_interval"),
      info("graft_point_in_interval",
        "graft_point_in_interval(points, intervals, keys_csv, point_ts, start_col, end_col[, point_id, bucket_width, interval_id])"),
      pointInIntervalBuilder(sess) _),
    (new FunctionIdentifier("graft_overlap_join"),
      info("graft_overlap_join",
        "graft_overlap_join(left, right, keys_csv, l_start, l_end, r_start, r_end[, bucket_width, left_id])"),
      overlapBuilder(sess) _),
    (new FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
        "graft_heavy_hitters(view, item_col, phi_ppm, k[, group_cols_csv])"),
      heavyHittersBuilder(sess) _),
    (new FunctionIdentifier("graft_sessionize"),
      info("graft_sessionize",
        "graft_sessionize(view, keys_csv, ts_col, gap[, tiebreak_csv, min_events, mode])"),
      sessionizeBuilder(sess) _),
    (new FunctionIdentifier("graft_pruned_read"),
      info("graft_pruned_read",
        "graft_pruned_read(path, col1, lo1, hi1[, col2, lo2, hi2, ...])"),
      prunedReadBuilder(sess) _),
    (new FunctionIdentifier("graft_zorder_cluster"),
      info("graft_zorder_cluster",
        "graft_zorder_cluster(view, cols_csv, num_partitions[, scaling])"),
      zorderBuilder(sess) _),
    (new FunctionIdentifier("graft_read_healed"),
      info("graft_read_healed", "graft_read_healed(path)"),
      readHealedBuilder(sess) _),
    (new FunctionIdentifier("graft_read_snapshot"),
      info("graft_read_snapshot", "graft_read_snapshot(path[, seq])"),
      readSnapshotBuilder(sess) _),
    (new FunctionIdentifier("graft_read_changes"),
      info("graft_read_changes", "graft_read_changes(path, from_seq[, to_seq])"),
      readChangesBuilder(sess) _),
    (new FunctionIdentifier("graft_read_change_rows"),
      info("graft_read_change_rows",
        "graft_read_change_rows(path, from_seq[, to_seq])"),
      readChangeRowsBuilder(sess) _),
    (new FunctionIdentifier("graft_connected_components"),
      info("graft_connected_components",
        "graft_connected_components(pairs_view, a_col, b_col[, algorithm])"),
      connectedComponentsBuilder(sess) _),
    (new FunctionIdentifier("graft_table_stats"),
      info("graft_table_stats", "graft_table_stats(path)"),
      tableStatsBuilder(sess) _),
    (new FunctionIdentifier("graft_compact"),
      info("graft_compact", "graft_compact(path, target_bytes[, parallelism])"),
      compactBuilder(sess) _),
    (new FunctionIdentifier("graft_cluster"),
      info("graft_cluster",
        "graft_cluster(path, cols_csv, files_per_partition[, scaling, index_cols_csv, parallelism])"),
      clusterBuilder(sess) _),
    (new FunctionIdentifier("graft_vacuum"),
      info("graft_vacuum", "graft_vacuum(path[, keep])"),
      vacuumBuilder(sess) _),
    (new FunctionIdentifier("graft_add_columns"),
      info("graft_add_columns", "graft_add_columns(path, ddl)"),
      addColumnsBuilder(sess) _),
    (new FunctionIdentifier("graft_reify_deletes"),
      info("graft_reify_deletes", "graft_reify_deletes(path)"),
      reifyBuilder(sess) _),
    (new FunctionIdentifier("graft_restore"),
      info("graft_restore", "graft_restore(path, seq)"),
      restoreBuilder(sess) _),
    (new FunctionIdentifier("graft_history"),
      info("graft_history", "graft_history(path)"),
      historyBuilder(sess) _),
    (new FunctionIdentifier("graft_tables"),
      info("graft_tables", "graft_tables()"),
      tablesBuilder(sess) _))

  /** The [[GraftExtensions]] registration set: builders resolve through
    * `SparkSession.active` (no session exists at injection time — see the
    * builder note above). Sessions needing a pinned owner use [[ensure]]. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = descriptionsFor(() => SparkSession.active)

  /** Idempotently register all five on a LIVE session (re-registration
    * overwrites — harmless), with the builders BOUND to `spark`: queries
    * analyzed while a different session is active still resolve views
    * and confs from the session the functions were registered on. */
  def ensure(spark: SparkSession): Unit =
    descriptionsFor(() => spark).foreach { case (ident, inf, builder) =>
      GraftSqlShim.registerTableFunction(spark, ident, inf, builder)
    }
}
