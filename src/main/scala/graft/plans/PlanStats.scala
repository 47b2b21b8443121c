package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim

import graft.operators.IntervalJoin

/** Optimization-time statistics for the naive-pattern rewrite rules —
  * the cost model that lets [[AsOfRewriteRule]] and [[IntervalRewriteRule]]
  * run DEFAULT-ON: each is a rescue for plans that are quadratic in
  * per-key row counts, so the firing decision is exactly a per-key
  * DENSITY estimate (rows / approx-distinct keys, per join side). Below
  * the break-even the naive plan is already cheap and the rewrite's
  * constant overhead (an extra shuffle + the width statistic) would make
  * it a pessimization — measured in PLANS.md: ~13 rows/key (the q110
  * shape) loses slightly, ~1.2k rows/key wins 16×; break-even sits near
  * 100 rows/key per side, the [[DefaultMinRowsPerKey]].
  *
  * The estimates are Spark jobs run AT OPTIMIZATION TIME (the trade
  * dynamic partition pruning also makes): a `count` +
  * `approx_count_distinct` over just the key columns — column-pruned at
  * the scan, map-side partial, 1-row result. To keep the recurring cost
  * out of plan-only operations (explain, re-optimization of cached
  * views), every statistic is CACHED per canonicalized input plan for
  * the JVM's lifetime: the cache key is the canonical form of the
  * aliased sub-plan the job would run over, so the same naive query
  * re-optimized hits the cache, and any structural change (different
  * source, filter, columns) misses it. Staleness under appended data is
  * possible and harmless — every cached value affects COST only, never
  * results (gate mis-fire = the naive-vs-rewritten choice; width
  * mis-pick = a suboptimal bucket size; both plans stay exact).
  */
private[graft] object PlanStats {

  /** Shared firing threshold for both rewrite rules, in estimated rows
    * per key PER SIDE: the rules fire (in `auto` mode) only when both
    * join sides meet it. */
  val MinRowsPerKeyConf = "spark.graft.rewrite.minRowsPerKey"
  val DefaultMinRowsPerKey = 100.0

  /** Bounded JVM-wide cache; cleared wholesale on overflow (statistics
    * are cheap to recompute — bounding matters more than retention). */
  private val cache = new ConcurrentHashMap[(String, LogicalPlan), AnyRef]()
  private val MaxEntries = 1024

  /** Negative-cache marker: a statistic job that failed DETERMINISTICALLY.
    * Only `AnalysisException` is negative-cached — a plan that cannot
    * analyze today cannot analyze on the next re-optimization either, so
    * re-submitting its job on EVERY re-optimization would pay
    * job-submission latency for a guaranteed failure. TRANSIENT failures
    * (lost executor, a file deleted by a concurrent compaction, a
    * cancelled job) are NOT cached: they propagate once — the rules catch
    * `NonFatal` per query and keep the naive plan — and the next call
    * simply retries, so one flake can never permanently poison the
    * user-facing verbs (`pointInInterval`, the TVFs) that share this
    * cache with the optimizer rules. */
  private final case class Failed(err: Throwable)

  private[graft] def cached[T <: AnyRef](tag: String, key: LogicalPlan)(compute: => T): T = {
    val k = (tag, key)
    cache.get(k) match {
      case Failed(err) => throw new IllegalStateException(
        "PlanStats: this plan's statistic job failed deterministically earlier in this JVM " +
          "(negative-cached; no job re-run) - fix the underlying failure or set the rewrite " +
          "conf off", err)
      case hit if hit != null => hit.asInstanceOf[T]
      case _ =>
        val v = try compute catch {
          case e: org.apache.spark.sql.AnalysisException =>
            if (cache.size >= MaxEntries) cache.clear()
            cache.put(k, Failed(e))
            throw e
        }
        if (cache.size >= MaxEntries) cache.clear()
        cache.put(k, v)
        v
    }
  }

  /** Test hook: drop all cached statistics (specs that re-profile the
    * same plan under changed expectations). */
  private[graft] def clearCache(): Unit = cache.clear()

  /** Estimated rows per distinct key tuple of `plan`, keyed by `keys`.
    * One cached (count, approx_count_distinct) job over the key columns
    * only. An empty side estimates 0 — the gate then correctly declines
    * (nothing is quadratic over an empty side). */
  def rowsPerKey(session: SparkSession, plan: LogicalPlan, keys: Seq[Attribute]): Double = {
    val aliased = Project(
      keys.zipWithIndex.map { case (a, i) => Alias(a, s"gstat_k$i")() }, plan)
    val df = GraftSqlShim.ofRows(session, aliased)
    val key = df.queryExecution.analyzed.canonicalized
    val (rows, distinct) = cached("density", key) {
      val row = df.agg(
        count(lit(1)),
        approx_count_distinct(struct(df.columns.toSeq.map(col): _*))).head()
      (Long.box(row.getLong(0)), Long.box(row.getLong(1)))
    }
    rows.longValue.toDouble / math.max(1L, distinct.longValue)
  }

  /** [[IntervalJoin.medianSpanWidth]] with the same per-canonical-plan
    * caching — the rewrite rules' width statistic no longer re-runs on
    * every re-optimization of the same query. */
  def cachedWidth(df: DataFrame, startCol: String, endCol: String): Long = {
    val key = df.select(col(startCol), col(endCol)).queryExecution.analyzed.canonicalized
    cached("width", key)(
      Long.box(IntervalJoin.medianSpanWidth(df, startCol, endCol))).longValue
  }

  /** The tri-state rewrite-rule switch, shared by both rules:
    * `false`/`off` → never fire; `true`/`force` → fire on every matched
    * shape (the pre-round-11 opt-in behavior, and what plan-pinning
    * specs use); `auto` (the default) → fire only when [[gateFires]]
    * says the naive plan is past break-even. Unknown values fail loudly
    * at the next query — a silently ignored typo would quietly disable
    * the rescue. */
  sealed trait Mode
  case object Off extends Mode
  case object Force extends Mode
  case object Auto extends Mode
  def mode(raw: String, confKey: String): Mode = raw.trim.toLowerCase match {
    case "false" | "off"  => Off
    case "true" | "force" => Force
    case "auto"           => Auto
    case other => throw new IllegalArgumentException(
      s"$confKey must be auto|true|force|false|off, got '$other'")
  }

  /** The density gate: both sides at or above the threshold. */
  def gateFires(session: SparkSession, threshold: Double,
                left: LogicalPlan, leftKeys: Seq[Attribute],
                right: LogicalPlan, rightKeys: Seq[Attribute]): Boolean =
    rowsPerKey(session, left, leftKeys) >= threshold &&
      rowsPerKey(session, right, rightKeys) >= threshold
}
