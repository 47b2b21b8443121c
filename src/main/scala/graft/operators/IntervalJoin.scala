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
    * which is inexact past 2^53). Shared with [[AsOfJoin.backwardChunked]]. */
  private[operators] def floorDiv(name: String, w: Long): Column =
    expr(s"(`$name` - (((`$name` % ${w}L) + ${w}L) % ${w}L)) div ${w}L")

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
    * intervals yields k rows. (A left-outer variant needs a unique point id
    * to restore uncovered rows — compose it as `points LEFT ANTI matched`
    * unioned with the matched set when one exists.)
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
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.filterNot(keys.contains).toSet
      .intersect(intervals.columns.filterNot(keys.contains).toSet)
    require(overlap.isEmpty, s"non-key columns must be disjoint, both sides have: ${overlap.mkString(",")}")

    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) <= col(endCol))
      .withColumn("__cell",
        explode(sequence(floorDiv(startCol, bucketWidth), floorDiv(endCol, bucketWidth))))
    val pt = points.filter(col(pointTs).isNotNull)
      .withColumn("__cell", floorDiv(pointTs, bucketWidth))

    val contained = col(startCol) <= col(pointTs) && col(pointTs) <= col(endCol)
    pt.join(iv, keys :+ "__cell").filter(contained).drop("__cell")
  }

  /** Data-derived bucket width: the MEDIAN interval span (approximate,
    * one cheap aggregate), floored at 1 — the operator's own tuning rule,
    * automated. q113's first cut hard-coded "a month sounds natural"
    * against 825-day-average synthetic spans and ran 3.5× slower
    * (PLANS.md round 9); deriving the width from the span distribution
    * makes that class of mistake impossible. Results are width-invariant
    * (spec-pinned), so this affects cost only — safe to call per run
    * even when the distribution drifts. */
  def medianSpanWidth(intervals: DataFrame, startCol: String, endCol: String): Long = {
    val row = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) <= col(endCol))
      .agg(expr(s"approx_percentile(`$endCol` - `$startCol`, 0.5)"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
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
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlapCols = left.columns.filterNot(keys.contains).toSet
      .intersect(right.columns.filterNot(keys.contains).toSet)
    require(overlapCols.isEmpty, s"non-key columns must be disjoint, both sides have: ${overlapCols.mkString(",")}")

    def cells(df: DataFrame, s: String, e: String) = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("__cell", explode(sequence(floorDiv(s, bucketWidth), floorDiv(e, bucketWidth))))

    val overlaps  = col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
    val canonical = col("__cell") === greatest(floorDiv(lStart, bucketWidth), floorDiv(rStart, bucketWidth))
    cells(left, lStart, lEnd)
      .join(cells(right, rStart, rEnd), keys :+ "__cell")
      .filter(overlaps && canonical)
      .drop("__cell")
  }
}
