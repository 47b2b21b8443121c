package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{BooleanType, StringType}

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
  *    start_col, end_col [, point_id [, bucket_width]])` — a non-empty
  *    `point_id` routes to the LEFT-OUTER operator
  *  - `graft_overlap_join(left, right, keys_csv, l_start, l_end, r_start,
  *    r_end [, bucket_width [, left_id]])` — a non-empty `left_id` routes
  *    to the LEFT-OUTER operator
  *  - `graft_heavy_hitters(view, item_col, phi_ppm, k [, group_cols_csv])`
  *  - `graft_connected_components(pairs_view, a_col, b_col
  *    [, algorithm])` — `propagation` (default) or `stars`; the
  *    ITERATIVE driver loop runs when the query analyzes, the
  *    `graft_heavy_hitters` eagerness trade
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

  private def opt[T](args: Seq[Expression], i: Int)(f: => T): Option[T] =
    if (i < args.size) Some(f) else None

  private def csv(s: String): Seq[String] = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def session: SparkSession = SparkSession.active

  // ------------------------------------------------------------- builders

  private def asofBuilder(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_asof_join"
    arity(fn, args, 5, 11)
    GraftSql.asofJoinDf(session,
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

  private def pointInIntervalBuilder(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_point_in_interval"
    arity(fn, args, 6, 8)
    GraftSql.pointInIntervalDf(session,
      points = str(fn, args, 0), intervals = str(fn, args, 1),
      keys = csv(str(fn, args, 2)),
      pointTs = str(fn, args, 3), startCol = str(fn, args, 4), endCol = str(fn, args, 5),
      pointId = opt(args, 6)(str(fn, args, 6)).filter(_.nonEmpty),
      bucketWidth = opt(args, 7)(lng(fn, args, 7)).filter(_ > 0)
    ).queryExecution.analyzed
  }

  private def overlapBuilder(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_overlap_join"
    arity(fn, args, 7, 9)
    GraftSql.overlapJoinDf(session,
      left = str(fn, args, 0), right = str(fn, args, 1),
      keys = csv(str(fn, args, 2)),
      lStart = str(fn, args, 3), lEnd = str(fn, args, 4),
      rStart = str(fn, args, 5), rEnd = str(fn, args, 6),
      bucketWidth = opt(args, 7)(lng(fn, args, 7)).filter(_ > 0),
      leftId = opt(args, 8)(str(fn, args, 8)).filter(_.nonEmpty)
    ).queryExecution.analyzed
  }

  private def connectedComponentsBuilder(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_connected_components"
    arity(fn, args, 3, 4)
    GraftSql.connectedComponentsDf(session,
      pairs = str(fn, args, 0), aCol = str(fn, args, 1), bCol = str(fn, args, 2),
      algorithm = opt(args, 3)(str(fn, args, 3)).getOrElse("propagation")
    ).queryExecution.analyzed
  }

  private def heavyHittersBuilder(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_heavy_hitters"
    arity(fn, args, 4, 5)
    GraftSql.heavyHittersDf(session,
      view = str(fn, args, 0), itemCol = str(fn, args, 1),
      phiPpm = lng(fn, args, 2), k = lng(fn, args, 3).toInt,
      groupCols = opt(args, 4)(csv(str(fn, args, 4))).getOrElse(Nil)
    ).queryExecution.analyzed
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftTableFunctions.getClass.getName, null, name, usage, "", "", "",
      "table_funcs", "4.0.0", "", "built-in")

  /** The (identifier, info, builder) triples both registration paths use. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (new FunctionIdentifier("graft_asof_join"),
      info("graft_asof_join",
        "graft_asof_join(left, right, keys_csv, left_ts, right_ts[, direction, strict, tolerance, join_type, chunk_width, tiebreak_csv])"),
      asofBuilder _),
    (new FunctionIdentifier("graft_point_in_interval"),
      info("graft_point_in_interval",
        "graft_point_in_interval(points, intervals, keys_csv, point_ts, start_col, end_col[, point_id, bucket_width])"),
      pointInIntervalBuilder _),
    (new FunctionIdentifier("graft_overlap_join"),
      info("graft_overlap_join",
        "graft_overlap_join(left, right, keys_csv, l_start, l_end, r_start, r_end[, bucket_width, left_id])"),
      overlapBuilder _),
    (new FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
        "graft_heavy_hitters(view, item_col, phi_ppm, k[, group_cols_csv])"),
      heavyHittersBuilder _),
    (new FunctionIdentifier("graft_connected_components"),
      info("graft_connected_components",
        "graft_connected_components(pairs_view, a_col, b_col[, algorithm])"),
      connectedComponentsBuilder _))

  /** Idempotently register all four on a LIVE session (re-registration
    * overwrites with identical builders — harmless). */
  def ensure(spark: SparkSession): Unit =
    descriptions.foreach { case (ident, inf, builder) =>
      GraftSqlShim.registerTableFunction(spark, ident, inf, builder)
    }
}
