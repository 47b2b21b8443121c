package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{AsOfJoin, Dedup, HeavyHitters, IntervalJoin, Sessionize}

/** SQL-surface verbs for the relational operators Spark lacks natively —
  * the temp-view face of [[AsOfJoin]], [[IntervalJoin]] and
  * [[HeavyHitters]], so a SQL-first user can stay in SQL end to end:
  * build inputs as views with `spark.sql`, call one verb, keep querying
  * the registered output view. Each verb resolves its inputs through the
  * session catalog (`spark.table`), runs the Scala operator (same audited
  * plans, same guards), registers the result under `out`, and returns it.
  *
  * These wrap WHOLE-operator semantics, which Spark SQL cannot express as
  * scalar functions — one of three SQL surfaces alongside injected
  * expressions (`dot_q`, GraftExtensions) and the
  * [[graft.plans.AsOfRewriteRule]] optimizer rewrite for users who write
  * the naive as-of pattern without knowing any graft API at all. For a
  * PURE-SQL invocation (no Scala call at all), the same dispatch cores
  * back the [[GraftTableFunctions]] table-valued functions
  * (`SELECT * FROM graft_asof_join(...)`).
  *
  * Oracle-checked end-to-end by the q122–q124 SQL-surface queries (and
  * q129/q130 for the table-function face). */
object GraftSql {

  /** [[AsOfJoin]] over two views. `direction` is "backward" (latest right
    * at-or-before each left) or "forward" (earliest right at-or-after);
    * remaining flags as on the operator. Pass `chunkWidth` to route
    * through the hot-key-proof time-chunked variants
    * ([[AsOfJoin.backwardChunked]]/[[AsOfJoin.forwardChunked]] — same
    * results, parallel within a key). */
  def asofJoin(spark: SparkSession, out: String, left: String, right: String,
               keys: Seq[String], leftTs: String, rightTs: String,
               direction: String = "backward", strict: Boolean = false,
               tolerance: Option[Long] = None, joinType: String = "inner",
               tiebreak: Seq[String] = Nil,
               chunkWidth: Option[Long] = None): DataFrame = {
    val df = asofJoinDf(spark, left, right, keys, leftTs, rightTs,
      direction, strict, tolerance, joinType, tiebreak, chunkWidth)
    df.createOrReplaceTempView(out)
    df
  }

  /** [[asofJoin]]'s dispatch core, view-resolving but non-registering —
    * shared with the `graft_asof_join` table function. */
  private[graft] def asofJoinDf(spark: SparkSession, left: String, right: String,
                                keys: Seq[String], leftTs: String, rightTs: String,
                                direction: String, strict: Boolean,
                                tolerance: Option[Long], joinType: String,
                                tiebreak: Seq[String],
                                chunkWidth: Option[Long]): DataFrame = {
    val (l, r) = (spark.table(left), spark.table(right))
    (direction, chunkWidth) match {
      case ("backward", None) =>
        AsOfJoin.backward(l, r, keys, leftTs, rightTs, strict, tolerance, joinType, tiebreak)
      case ("forward", None) =>
        AsOfJoin.forward(l, r, keys, leftTs, rightTs, strict, tolerance, joinType, tiebreak)
      case ("backward", Some(w)) =>
        AsOfJoin.backwardChunked(l, r, keys, leftTs, rightTs, w, strict, tolerance, joinType, tiebreak)
      case ("forward", Some(w)) =>
        AsOfJoin.forwardChunked(l, r, keys, leftTs, rightTs, w, strict, tolerance, joinType, tiebreak)
      case (other, _) => throw new IllegalArgumentException(
        s"direction must be backward|forward, got $other")
    }
  }

  /** [[IntervalJoin.pointInInterval]] over two views (outer shapes via
    * the id options — `pointId` keeps uncovered POINTS
    * ([[IntervalJoin.pointInIntervalLeft]]), `intervalId` keeps
    * uncovered INTERVALS ([[IntervalJoin.pointInIntervalRight]]); at
    * most one may be set). `bucketWidth` defaults to the operator's own
    * tuning rule, the median interval span — the SQL user never has to
    * pick a width (the statistic is cached per canonicalized plan,
    * [[graft.plans.PlanStats.cachedWidth]]). */
  def pointInInterval(spark: SparkSession, out: String, points: String, intervals: String,
                      keys: Seq[String], pointTs: String, startCol: String, endCol: String,
                      bucketWidth: Option[Long] = None,
                      pointId: Option[String] = None,
                      intervalId: Option[String] = None): DataFrame = {
    val df = pointInIntervalDf(spark, points, intervals, keys, pointTs, startCol, endCol,
      bucketWidth, pointId, intervalId)
    df.createOrReplaceTempView(out)
    df
  }

  private[graft] def pointInIntervalDf(spark: SparkSession, points: String, intervals: String,
                                       keys: Seq[String], pointTs: String,
                                       startCol: String, endCol: String,
                                       bucketWidth: Option[Long],
                                       pointId: Option[String],
                                       intervalId: Option[String] = None): DataFrame = {
    require(pointId.isEmpty || intervalId.isEmpty,
      "pointInInterval: at most one of pointId / intervalId (only one side can be preserved)")
    val p = spark.table(points)
    val i = spark.table(intervals)
    val width = bucketWidth.getOrElse(graft.plans.PlanStats.cachedWidth(i, startCol, endCol))
    (pointId, intervalId) match {
      case (Some(id), _) => IntervalJoin.pointInIntervalLeft(p, i, keys, id, pointTs, startCol, endCol, width)
      case (_, Some(id)) => IntervalJoin.pointInIntervalRight(p, i, keys, id, pointTs, startCol, endCol, width)
      case _             => IntervalJoin.pointInInterval(p, i, keys, pointTs, startCol, endCol, width)
    }
  }

  /** [[IntervalJoin.overlap]] over two views: all same-key (left, right)
    * interval pairs with a non-empty intersection. `bucketWidth` defaults
    * to the median span of the UNION of both sides' spans. A non-empty
    * `leftId` (the left view's unique id column) routes to
    * [[IntervalJoin.overlapLeft]] — every left row preserved, unmatched
    * ones null-extended. For a self-join, register the same data under
    * two views with non-key columns renamed apart and apply an
    * anti-reflexive filter on the output view. */
  def overlapJoin(spark: SparkSession, out: String, left: String, right: String,
                  keys: Seq[String], lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bucketWidth: Option[Long] = None,
                  leftId: Option[String] = None): DataFrame = {
    val df = overlapJoinDf(spark, left, right, keys, lStart, lEnd, rStart, rEnd,
      bucketWidth, leftId)
    df.createOrReplaceTempView(out)
    df
  }

  private[graft] def overlapJoinDf(spark: SparkSession, left: String, right: String,
                                   keys: Seq[String], lStart: String, lEnd: String,
                                   rStart: String, rEnd: String,
                                   bucketWidth: Option[Long],
                                   leftId: Option[String] = None): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    val width = bucketWidth.getOrElse {
      val spans = l.select(col(lStart).as("s"), col(lEnd).as("e"))
        .unionByName(r.select(col(rStart).as("s"), col(rEnd).as("e")))
      graft.plans.PlanStats.cachedWidth(spans, "s", "e")
    }
    leftId match {
      case Some(id) => IntervalJoin.overlapLeft(l, r, keys, id, lStart, lEnd, rStart, rEnd, width)
      case None     => IntervalJoin.overlap(l, r, keys, lStart, lEnd, rStart, rEnd, width)
    }
  }

  /** Exact heavy hitters over a view's column — [[HeavyHitters.exact]]
    * (global) or [[HeavyHitters.exactPerGroup]] when `groupCols` is
    * non-empty. Output columns: groupCols*, item, cnt, ppm. */
  def heavyHitters(spark: SparkSession, out: String, view: String, itemCol: String,
                   phiPpm: Long, k: Int, groupCols: Seq[String] = Nil): DataFrame = {
    val df = heavyHittersDf(spark, view, itemCol, phiPpm, k, groupCols)
    df.createOrReplaceTempView(out)
    df
  }

  private[graft] def heavyHittersDf(spark: SparkSession, view: String, itemCol: String,
                                    phiPpm: Long, k: Int, groupCols: Seq[String]): DataFrame = {
    val t = spark.table(view)
    if (groupCols.isEmpty) HeavyHitters.exact(t, col(itemCol), phiPpm, k)
    else HeavyHitters.exactPerGroup(t, groupCols, col(itemCol), phiPpm, k)
  }

  /** Connected components over a pair-graph view — the cluster step of
    * near-dup resolution as a SQL verb: every vertex labeled (id, comp)
    * with its component's min id. `algorithm` picks the formulation:
    * `propagation` (default — min-label + pointer jumping, the shallow-
    * graph winner) or `stars` ([[Dedup.connectedComponentsStars]] — the
    * deep-graph form; PLANS.md round 11 has the measured split). BOTH
    * run their iterative driver loop when the verb is CALLED (and, for
    * the table function, when the query analyzes) — the
    * `graft_heavy_hitters` eagerness trade, surfaced unchanged. */
  /** Gap-based sessionization over a view ([[graft.operators.Sessionize]]
    * with the time-gap break — the SQL-expressible special case of the
    * operator's arbitrary break predicate). `mode = "rollup"` (default)
    * returns one row per kept session (`keys*, session_id, n_events,
    * session_start, session_end`, sessions under `minEvents` dropped);
    * `mode = "assign"` returns the input rows tagged with `session_id`
    * (`minEvents` ignored). One shuffle on the keys either way; ties in
    * `tsCol` are broken by `tiebreak` for a total order. */
  def sessionize(spark: SparkSession, out: String, view: String, keys: Seq[String],
                 tsCol: String, gap: Long, tiebreak: Seq[String] = Nil,
                 minEvents: Long = 1L, mode: String = "rollup"): DataFrame = {
    val df = sessionizeDf(spark, view, keys, tsCol, gap, tiebreak, minEvents, mode)
    df.createOrReplaceTempView(out)
    df
  }

  private[graft] def sessionizeDf(spark: SparkSession, view: String, keys: Seq[String],
                                  tsCol: String, gap: Long, tiebreak: Seq[String],
                                  minEvents: Long, mode: String): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    val df = spark.table(view)
    val tagged = Sessionize.assign(df, keys, tsCol +: tiebreak,
      breakWhen = prev => col(tsCol) - prev(tsCol) > gap)
    mode match {
      case "rollup" => Sessionize.rollup(tagged, keys, tsCol, minEvents)
      case "assign" => tagged
      case other => throw new IllegalArgumentException(
        s"mode must be rollup|assign, got $other")
    }
  }

  /** [[graft.sources.Layout.cluster]] over a view: the Z-ordered
    * rewrite of the view's rows (same rows, layout-defining order) for
    * `CREATE TABLE ... AS SELECT` / `INSERT OVERWRITE` maintenance jobs
    * written entirely in SQL. The write that consumes this preserves the
    * range partitioning and in-partition order, so the written files get
    * the tight per-file envelopes LayoutSpec pins. Runs the layout's one
    * 1-row min/max statistics job when the query is assembled (the
    * `graft_heavy_hitters` eagerness trade, surfaced unchanged). */
  def zorderCluster(spark: SparkSession, out: String, view: String,
                    cols: Seq[String], numPartitions: Int,
                    scaling: String = "linear"): DataFrame = {
    val df = zorderClusterDf(spark, view, cols, numPartitions, scaling)
    df.createOrReplaceTempView(out)
    df
  }

  private[graft] def zorderClusterDf(spark: SparkSession, view: String,
                                     cols: Seq[String], numPartitions: Int,
                                     scaling: String = "linear"): DataFrame =
    graft.sources.Layout.cluster(spark.table(view), cols, numPartitions, scaling)

  /** [[graft.sources.Layout.prunedRead]] over a PATH: read a
    * Z-order-maintained parquet table through its persisted `.envelopes`
    * file-skipping index — files the index proves outside the box are
    * never opened; exact under stale/missing indexes (see the operator).
    * Box bounds take any comparable literal — integer, double, string,
    * `DATE '...'`, `TIMESTAMP '...'` — matching the indexed column's
    * type family (the SQL face `graft_pruned_read` passes them through
    * verbatim). */
  def prunedRead(spark: SparkSession, out: String, path: String,
                 box: Seq[(String, Any, Any)]): DataFrame = {
    val df = prunedReadDf(spark, path, box)
    df.createOrReplaceTempView(out)
    df
  }

  private[graft] def prunedReadDf(spark: SparkSession, path: String,
                                  box: Seq[(String, Any, Any)]): DataFrame =
    graft.sources.Layout.prunedRead(spark, path, box)

  def connectedComponents(spark: SparkSession, out: String, pairs: String,
                          aCol: String, bCol: String,
                          algorithm: String = "propagation"): DataFrame = {
    val df = connectedComponentsDf(spark, pairs, aCol, bCol, algorithm)
    df.createOrReplaceTempView(out)
    df
  }

  private[graft] def connectedComponentsDf(spark: SparkSession, pairs: String,
                                           aCol: String, bCol: String,
                                           algorithm: String): DataFrame = {
    val t = spark.table(pairs)
    algorithm match {
      case "propagation" => Dedup.connectedComponents(t, aCol, bCol)
      case "stars"       => Dedup.connectedComponentsStars(t, aCol, bCol)
      case other => throw new IllegalArgumentException(
        s"algorithm must be propagation|stars, got $other")
    }
  }
}
