package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join: match each point row to every interval row of the
  * same key whose `[start, end]` contains the point's timestamp — the
  * relational shape behind "which session does this event belong to"
  * enrichment (the batch generalization of the reference's in-window
  * cluster membership checks, `ossplugins/timeout-analysis/processor.go:180-199`).
  *
  * == Spark-first plan ==
  * The naive encoding `p JOIN i ON p.k = i.k AND i.s <= p.ts AND p.ts <= i.e`
  * is an equi-join on the key whose range conjuncts only filter AFTER the
  * per-key cross product — quadratic in per-key row counts, the classic
  * range-join blowup. This operator bucketizes time into fixed-width cells:
  * each interval is replicated to the cells it overlaps, each point lands in
  * exactly ONE cell, and the join becomes a pure equi-join on (key, cell)
  * followed by the exact containment filter. Each (point, interval) pair
  * meets in exactly one cell — the point's — so no post-join dedup is
  * needed.
  *
  * Scale notes: the only data growth is the interval side's replication
  * factor, E[span/bucketWidth] + 1 — pick `bucketWidth` near the typical
  * interval span to keep it ~2×. Points (the big side at 100 TB) are never
  * replicated. The equi-join shuffles both sides on (key, cell), is
  * AQE-skew-splittable (unlike a window), and broadcast-eligible when the
  * replicated interval side is small.
  */
object IntervalJoin {

  /** Arithmetic floor division on longs, in pure long arithmetic
    * (negative-safe: `div` alone truncates toward zero, which would put
    * ts −1 and +1 in the same bucket; Column `/` goes through DOUBLE,
    * which is inexact past 2^53). Shared with [[AsOfJoin.backwardChunked]].
    * Callers must pre-validate the width with [[requireWidth]]: the
    * `(x % w + w) % w` normalization overflows when `w > Long.MaxValue/2`. */
  private[operators] def floorDiv(name: String, w: Long): Column =
    floorDiv(col(name), w)

  /** [[floorDiv]] over an arbitrary long Column: `pmod` is the
    * `((x % w) + w) % w` normalization, `div` the exact integral divide
    * (Column `/` would detour through DOUBLE — inexact past 2^53). */
  private[operators] def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Validity gate for every bucket/chunk width: positive, and small
    * enough that [[floorDiv]]'s modular normalization cannot overflow
    * (`x % w + w` needs `w ≤ Long.MaxValue/2`; silently corrupt buckets
    * otherwise). Shared with [[AsOfJoin]]'s chunked variants. */
  private[operators] def requireWidth(w: Long, name: String): Unit =
    require(w > 0 && w <= Long.MaxValue / 2,
      s"$name must be in (0, Long.MaxValue/2], got $w - floorDiv's modular bucketing overflows past that")

  /** Internal working columns (`__cell`, `__ts`, …) are appended to caller
    * frames; a caller column already using the reserved `__` prefix would
    * collide — analysis error at best, silently wrong bucketing at worst —
    * so fail loudly up front. Shared with [[AsOfJoin]]. */
  private[operators] def requireNoReserved(df: DataFrame, side: String): Unit = {
    val bad = df.columns.filter(_.startsWith("__"))
    require(bad.isEmpty,
      s"$side columns ${bad.mkString(",")} use the reserved '__' prefix (internal working columns)")
  }

  /** @param points      big side; one row per event
    * @param intervals   side with `[startCol, endCol]` (inclusive bounds)
    * @param keys        equi-join key columns present on both sides
    * @param pointTs     long event-time column on `points`
    * @param startCol    long interval start on `intervals` (inclusive)
    * @param endCol      long interval end on `intervals` (inclusive)
    * @param bucketWidth time-cell width, same unit as the ts columns; must
    *                    be chosen from the interval-span distribution
    *
    * Inner semantics: uncovered points drop, a point inside k overlapping
    * intervals yields k rows. For uncovered-point preservation use
    * [[pointInIntervalLeft]].
    *
    * Pathological spans are structurally harmless: an interval only needs
    * replicating to cells where a point could meet it, so its cell range
    * is CLAMPED to the observed point-time range (one 1-row aggregate over
    * the points). An open-ended sentinel end (`Long.MaxValue` for "still
    * open") replicates to at most the points' own span of cells instead of
    * attempting a billion-element `sequence()`.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long
  ): DataFrame = {
    requireWidth(bucketWidth, "bucketWidth")
    requireNoReserved(points, "points"); requireNoReserved(intervals, "intervals")
    val overlap = points.columns.filterNot(keys.contains).toSet
      .intersect(intervals.columns.filterNot(keys.contains).toSet)
    require(overlap.isEmpty, s"non-key columns must be disjoint, both sides have: ${overlap.mkString(",")}")

    val iv = clampedIntervalCells(points, intervals, pointTs, startCol, endCol, bucketWidth)
    val pt = points.filter(col(pointTs).isNotNull)
      .withColumn("__cell", floorDiv(pointTs, bucketWidth))

    val contained = col(startCol) <= col(pointTs) && col(pointTs) <= col(endCol)
    pt.join(iv, keys :+ "__cell").filter(contained).drop("__cell")
  }

  /** The interval side of [[pointInInterval]], replicated to its clamped
    * cell range: validity-filtered, pre-pruned to the observed point-time
    * range, exploded to one row per `__cell`. Shared by the inner and the
    * LEFT-outer formulations so the replication semantics are defined
    * once. */
  private def clampedIntervalCells(
      points: DataFrame, intervals: DataFrame, pointTs: String,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    // Observed point-time range: the only cells where a pair can meet.
    // One bounded 1-row aggregate (the medianSpanWidth pattern); an empty
    // or all-null point side yields an empty inner result regardless.
    // A STREAMING point side can't be pre-aggregated — unbounded sentinels
    // disable the clamp there (greatest/least with ±Long.MaxValue are
    // identities), so streaming callers must bound their own spans.
    val (minTs, maxTs) =
      if (points.isStreaming) (Long.MinValue, Long.MaxValue)
      else {
        val rangeRow = points.agg(
          min(col(pointTs).cast("long")), max(col(pointTs).cast("long"))).head()
        if (rangeRow.isNullAt(0)) (0L, -1L) else (rangeRow.getLong(0), rangeRow.getLong(1))
      }

    intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) <= col(endCol))
      // no point exists outside [minTs, maxTs] → intervals fully outside
      // can't match; survivors replicate only across the clamped range
      .filter(col(startCol) <= maxTs && col(endCol) >= minTs)
      .withColumn("__cell",
        explode(cellSeq(
          floorDiv(greatest(col(startCol), lit(minTs)), bucketWidth),
          floorDiv(least(col(endCol), lit(maxTs)), bucketWidth))))
  }

  /** Left-outer [[pointInInterval]]: every point row is preserved;
    * uncovered points carry null interval columns. A DIRECT left-outer
    * join: points land in exactly ONE cell each (only intervals
    * replicate), so `pt LEFT OUTER iv ON keys ∧ cell ∧ contained` emits
    * the inner pairs plus exactly one null-extended row per uncovered
    * point — no second evaluation of the matched subtree, no anti join,
    * no union (the previous `matched ∪ (points ANTI matched-ids)`
    * composition computed the whole join twice: once for the output,
    * once under the anti join's build side).
    *
    * @param pointId a column UNIQUE per point row (contract — uniqueness
    *                is the caller's to guarantee and is relied on by the
    *                rewrite-rule routing; the direct join itself no
    *                longer distinguishes rows by id, so a duplicate or
    *                repeated-NULL id can no longer drop rows).
    * @param innerFilter extra JOIN-CONDITION predicate over the matched
    *                rows (strict-bound re-filters, residual conjuncts of
    *                a naive LEFT join): a conjunct of the outer join
    *                condition, so a point whose every candidate fails it
    *                null-extends — semantics a post-filter on the outer
    *                OUTPUT could not express (it would drop the
    *                null-extended rows).
    */
  def pointInIntervalLeft(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointId: String,
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      innerFilter: Option[Column] = None
  ): DataFrame = {
    require(points.columns.contains(pointId), s"pointId $pointId must be a points column")
    require(!keys.contains(pointId), "pointId must not be a join key")
    requireWidth(bucketWidth, "bucketWidth")
    requireNoReserved(points, "points"); requireNoReserved(intervals, "intervals")
    val overlap = points.columns.filterNot(keys.contains).toSet
      .intersect(intervals.columns.filterNot(keys.contains).toSet)
    require(overlap.isEmpty, s"non-key columns must be disjoint, both sides have: ${overlap.mkString(",")}")

    val iv = clampedIntervalCells(points, intervals, pointTs, startCol, endCol, bucketWidth)
    // NO isNotNull pre-filter on the point side (unlike the inner join):
    // a null-ts point gets a null __cell, matches nothing, and is
    // preserved null-extended — the left-outer contract.
    val pt = points.withColumn("__cell", floorDiv(pointTs, bucketWidth))
    val contained = iv(startCol) <= pt(pointTs) && pt(pointTs) <= iv(endCol)
    val cond0 = (keys.map(k => pt(k) === iv(k)) :+
      (pt("__cell") === iv("__cell")) :+ contained).reduce(_ && _)
    val cond = innerFilter.map(cond0 && _).getOrElse(cond0)
    val ptRest = points.columns.filterNot(keys.contains)
    val ivRest = intervals.columns.filterNot(keys.contains)
    // column order pinned to the previous composition's: keys (from the
    // preserved side), point rest, interval rest
    pt.join(iv, cond, "left_outer")
      .select(keys.map(k => pt(k)) ++ ptRest.map(c => pt(c)) ++ ivRest.map(c => iv(c)): _*)
  }

  /** Interval-preserved outer [[pointInInterval]] (a RIGHT OUTER in the
    * operator's (points, intervals) argument order): every INTERVAL row
    * is preserved; intervals covering no point carry null point columns.
    * Same composition and anti-join as [[pointInIntervalLeft]] with the
    * sides swapped — and the same [[graft.plans.IntervalRewriteRule]]
    * role, rescuing the naive `intervals LEFT JOIN points ON k AND ts
    * BETWEEN s AND e` spelling. A MALFORMED interval (null bounds or
    * `start > end`) matches nothing and is preserved null-extended,
    * [[overlapLeft]]'s valid-span contract.
    *
    * @param intervalId a column UNIQUE per interval row —
    *                   [[pointInIntervalLeft]]'s pointId contract,
    *                   including the null-safe NULL-id rule.
    * @param innerFilter join-condition predicate over matched rows,
    *                   applied BEFORE the unmatched-set computation. */
  def pointInIntervalRight(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      intervalId: String,
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      innerFilter: Option[Column] = None
  ): DataFrame = {
    require(intervals.columns.contains(intervalId), s"intervalId $intervalId must be an intervals column")
    require(!keys.contains(intervalId), "intervalId must not be a join key")
    val matchedAll = pointInInterval(points, intervals, keys, pointTs, startCol, endCol, bucketWidth)
    val matched = innerFilter.map(matchedAll.filter).getOrElse(matchedAll)
    val ptCols = matched.columns.filterNot(intervals.columns.contains)
    // groupBy, not distinct() — see pointInIntervalLeft
    val matchedIds = matched.groupBy(col(intervalId)).agg(count(lit(1)).as("__n")).drop("__n")
    val unmatched = antiByIdNullSafe(intervals, matchedIds, intervalId)
      .select(intervals.columns.toSeq.map(col) ++
        ptCols.toSeq.map(c => lit(null).cast(matched.schema(c).dataType).as(c)): _*)
    matched.unionByName(unmatched)
  }

  /** `rows LEFT ANTI matchedIds` on the id column, NULL-SAFE: a plain
    * USING anti-join compares with `=`, under which NULL never equals
    * NULL — a row whose id is NULL and that DID match would re-emit as a
    * spurious null-extended "unmatched" row. The rewrite rules' outer
    * path feeds the id from an Aggregate's grouping attribute, whose one
    * NULL group is a legitimate id value, so the comparison must be
    * `<=>`. The rename to a reserved name keeps the condition
    * unambiguous ([[requireNoReserved]] bars callers from `__`). */
  private def antiByIdNullSafe(rows: DataFrame, matchedIds: DataFrame, id: String): DataFrame = {
    val ids = matchedIds.withColumnRenamed(id, "__gmid")
    rows.join(ids, rows(id) <=> ids("__gmid"), "left_anti")
  }

  /** Data-derived bucket width: the MEDIAN of the POSITIVE interval spans
    * (approximate, one cheap aggregate), floored at 1 — the operator's
    * own tuning rule, automated. q113's first cut hard-coded "a month
    * sounds natural" against 825-day-average synthetic spans and ran
    * 3.5× slower (PLANS.md round 9); deriving the width from the span
    * distribution makes that class of mistake impossible. Results are
    * width-invariant (spec-pinned), so this affects cost only — safe to
    * call per run even when the distribution drifts.
    *
    * Zero-width spans are EXCLUDED from the statistic: point-like
    * intervals replicate to one cell at any width, so they carry no
    * tuning signal — but a majority of them would otherwise drag the
    * median to 0 → width 1, and every genuinely wide interval would then
    * explode to span-many cells (measured: an OOM, not a slowdown, on
    * per-hour activity spans where most hours hold one event). */
  def medianSpanWidth(intervals: DataFrame, startCol: String, endCol: String): Long = {
    val row = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) < col(endCol))
      .agg(expr(s"approx_percentile(`$endCol` - `$startCol`, 0.5)"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }

  /** Ceiling on cells one interval may replicate to — far above any sane
    * width choice (≈4M cells), hit only when `bucketWidth` is orders of
    * magnitude below the span scale. Failing LOUDLY here beats the
    * alternative: a silent multi-billion-row explode that OOMs the
    * executor with no hint of why. */
  private[operators] val MaxCellsPerInterval = 1L << 22

  /** Guarded cell-range sequence: `sequence(lo, hi)` with a codegen'd
    * per-row width check (no extra job, no silent truncation). Every call
    * site guarantees `lo ≤ hi`, so a NEGATIVE `hi - lo` proves the
    * subtraction overflowed (cell ranges spanning most of the long
    * domain — width near 1 with the clamp disabled on a streaming side)
    * and must hit the same loud diagnostic, not fall through to
    * `sequence()`'s generic array-size failure. */
  private def cellSeq(lo: Column, hi: Column): Column = {
    val guarded = when(hi - lo >= MaxCellsPerInterval || hi - lo < 0L,
      raise_error(concat(
        lit(s"IntervalJoin: one interval spans more than $MaxCellsPerInterval bucket cells ("),
        (hi - lo + 1L).cast("string"),
        lit(") - bucketWidth is far below the span scale; pick it near the median span " +
          "(see medianSpanWidth)")))
        .cast("long"))
      .otherwise(hi)
    sequence(lo, guarded)
  }

  /** Interval-overlap join: all (left, right) interval pairs of the same
    * key with `[lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅` (inclusive bounds) —
    * e.g. concurrent sessions, overlapping order-fulfillment spans.
    *
    * Both sides replicate to their covering cells; a candidate pair meets
    * in every cell BOTH occupy, so the join keeps a pair only in the
    * canonical first such cell — `max(cell(lStart), cell(rStart))` — which
    * makes each overlapping pair emit exactly once with no distinct pass.
    * Replication is span/width + 1 per side; at 100 TB pick the width near
    * the median span so the equi-join (AQE-skew-splittable, broadcastable
    * when one side is small) dominates, not the explode.
    *
    * For a self-join, pass the same frame twice with non-key columns
    * renamed apart (the operator requires disjointness); apply an
    * anti-reflexive predicate (`a_id < b_id`) on the result.
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long
  ): DataFrame = {
    requireWidth(bucketWidth, "bucketWidth")
    requireNoReserved(left, "left"); requireNoReserved(right, "right")
    val overlapCols = left.columns.filterNot(keys.contains).toSet
      .intersect(right.columns.filterNot(keys.contains).toSet)
    require(overlapCols.isEmpty, s"non-key columns must be disjoint, both sides have: ${overlapCols.mkString(",")}")

    // A pair meets ONLY in its canonical cell, cell(max(lStart, rStart)),
    // whose value for any partner of interval X lies in
    // [max(X.start, other side's min start), min(X.end, global max start)]
    // — so replication is CLAMPED to that range (one 1-row aggregate over
    // the starts) and rows with an empty range (no possible partner) drop.
    // Pathological open-ended sentinels (`Long.MaxValue` end /
    // `Long.MinValue` start) replicate across the partners' start span
    // instead of attempting a billion-cell sequence. A streaming side
    // can't be pre-aggregated: sentinels disable the clamp there.
    val (maxStart, lMinStart, rMinStart) =
      if (left.isStreaming || right.isStreaming) (Long.MaxValue, Long.MinValue, Long.MinValue)
      else {
        val row = left.select(col(lStart).cast("long").as("s"), lit("l").as("side"))
          .unionByName(right.select(col(rStart).cast("long").as("s"), lit("r").as("side")))
          .agg(max(col("s")),
            min(when(col("side") === "l", col("s"))),
            min(when(col("side") === "r", col("s"))))
          .head()
        def at(i: Int, dflt: Long) = if (row.isNullAt(i)) dflt else row.getLong(i)
        (at(0, Long.MaxValue), at(1, Long.MinValue), at(2, Long.MinValue))
      }

    def cells(df: DataFrame, s: String, e: String, otherMinStart: Long) = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("__lo", greatest(col(s), lit(otherMinStart)))
      .withColumn("__hi", least(col(e), lit(maxStart)))
      .filter(col("__lo") <= col("__hi"))
      .withColumn("__cell", explode(cellSeq(
        floorDiv(col("__lo"), bucketWidth), floorDiv(col("__hi"), bucketWidth))))
      .drop("__lo", "__hi")

    val overlaps  = col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
    val canonical = col("__cell") === greatest(floorDiv(lStart, bucketWidth), floorDiv(rStart, bucketWidth))
    cells(left, lStart, lEnd, rMinStart)
      .join(cells(right, rStart, rEnd, lMinStart), keys :+ "__cell")
      .filter(overlaps && canonical)
      .drop("__cell")
  }

  /** Left-outer [[overlap]]: every LEFT interval row is preserved; rows
    * with no same-key overlapping partner carry null right columns —
    * `matched ∪ (left LEFT ANTI matched-ids)`, the
    * [[pointInIntervalLeft]] construction. Matching follows [[overlap]]'s
    * valid-span contract: a malformed left interval (null bounds or
    * `start > end`) matches nothing and is preserved null-extended.
    *
    * @param leftId a column UNIQUE per left row (the anti-join key —
    *               same contract as [[pointInIntervalLeft]]'s pointId)
    * @param innerFilter extra JOIN-CONDITION predicate over matched
    *               pairs, applied BEFORE the unmatched-set computation
    *               (outer-join-condition semantics, not a post-filter) */
  def overlapLeft(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftId: String,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long,
      innerFilter: Option[Column] = None
  ): DataFrame = {
    require(left.columns.contains(leftId), s"leftId $leftId must be a left-side column")
    require(!keys.contains(leftId), "leftId must not be a join key")
    val matchedAll = overlap(left, right, keys, lStart, lEnd, rStart, rEnd, bucketWidth)
    val matched = innerFilter.map(matchedAll.filter).getOrElse(matchedAll)
    val rCols = matched.columns.filterNot(left.columns.contains)
    // groupBy, not distinct() — see pointInIntervalLeft (a Deduplicate
    // injected post-optimization would reach the planner unreplaced)
    val matchedIds = matched.groupBy(col(leftId)).agg(count(lit(1)).as("__n")).drop("__n")
    val unmatched = antiByIdNullSafe(left, matchedIds, leftId)
      .select(left.columns.toSeq.map(col) ++
        rCols.toSeq.map(c => lit(null).cast(matched.schema(c).dataType).as(c)): _*)
    matched.unionByName(unmatched)
  }
}
