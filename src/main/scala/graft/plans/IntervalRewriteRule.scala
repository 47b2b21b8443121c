package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.GraftSqlShim

import graft.operators.IntervalJoin

/** Catalyst rewrite: the NAIVE point-in-interval encoding — an inner
  * equi-join whose two range conjuncts (`i.s ≤ p.ts AND p.ts ≤ i.e`) only
  * FILTER after the per-key product — becomes
  * [[IntervalJoin.pointInInterval]]'s bucketized plan: intervals
  * replicated to time cells, points landing in exactly one cell, a pure
  * equi-join on (key, cell). Same trap, same medicine as
  * [[AsOfRewriteRule]]: Spark plans the naive form as an equi-join on the
  * key with the range as a post-join filter, O(points·intervals/keys)
  * per key; the bucketized plan's per-key cost is linear in rows ×
  * replication (~2 at the derived width).
  *
  * Recognized: `Join(Inner, equi-keys ∧ lo-bound ∧ hi-bound)` where the
  * two bounds compare ONE side's single timestamp column against the
  * other side's two distinct columns (any conjunct order / comparison
  * orientation / side assignment, plain column references, ≥1 equi key).
  * When each side instead contributes one start and one end —
  * `a.s ≤ b.e AND b.s ≤ a.e`, the INTERVAL-OVERLAP pattern — the join
  * rewrites to [[IntervalJoin.overlap]]'s canonical-cell plan, with two
  * (usually empty) fallback joins carrying pairs whose own interval is
  * inverted (`s > e`): the operator drops those as malformed, but the
  * naive condition never compares a side's start to its own end, so
  * exactness on arbitrary data needs them. Strict bounds (`<`) are
  * accepted in both shapes: the operator's inclusive containment is a
  * superset, and the original strict predicates re-filter the output
  * (exactness preserved). Additional conjuncts that are NOT bound-shaped
  * (inequality tests involving arithmetic, `!=`, UDF predicates, …) ride
  * along as RESIDUAL post-filters — exact, because unlike the as-of
  * argmax every joined pair here is independent. A third bound-shaped
  * cross-side inequality (e.g. a self-join's `a.id < b.id`
  * anti-reflexive, once pushdown folds it into the join) still vetoes
  * the match: with three candidate bounds the interval pairing is
  * ambiguous, and pairing the wrong columns as a pseudo-interval could
  * trade the quadratic plan for a worse one. A POINT-PRESERVED outer
  * join (LEFT with the points on the left, or the mirror RIGHT) rewrites
  * to [[IntervalJoin.pointInIntervalLeft]] when the point side exposes a
  * provably-unique id (the single grouping attribute of an Aggregate —
  * the one uniqueness the rule can see structurally); strict bounds and
  * residual conjuncts route to the operator's `innerFilter`, applied to
  * matched candidates BEFORE the unmatched set is computed — JOIN-
  * CONDITION semantics (a post-filter would instead drop the naive
  * plan's unmatched null rows). Unmatched points then keep one row with
  * null interval columns — including null interval keys, exactly the
  * naive null-extended rows. The INTERVAL-PRESERVED outer (intervals
  * LEFT JOIN points, or the mirror RIGHT) is the same rescue through
  * [[IntervalJoin.pointInIntervalRight]], gated on a provably-unique
  * INTERVAL id — uncovered intervals keep one row with null point
  * columns (including null point keys). FULL OUTER deliberately keeps
  * the naive plan: with BOTH sides preserved, the rewrite's column-null
  * indicators (interval start for point-preserved rows, point ts for
  * interval-preserved rows) turn ambiguous on preserved rows whose OWN
  * indicator column is legitimately null (a null-ts point, a null-bound
  * interval) — exactness would need side-tagged operator output, a
  * structural change declined until a workload shows demand. Any other
  * outer shape keeps the naive plan.
  *
  * The bucket width is the operator's own tuning rule
  * ([[IntervalJoin.medianSpanWidth]]), which runs one 1-row aggregate at
  * OPTIMIZATION time (the same adaptive-statistics trade dynamic
  * partition pruning makes; the job's own plan contains no join+range
  * pattern, so the rule cannot recurse) — CACHED per canonicalized
  * interval-side plan ([[PlanStats.cachedWidth]]), so plan-only
  * re-optimizations of the same query don't re-run it. Results are
  * width-invariant — the statistic affects cost only.
  *
  * ON by default in `auto` mode (`spark.graft.interval.rewrite=auto`):
  * fires only past the per-key-density break-even ([[PlanStats]]);
  * `true`/`force` fires on every match, `false`/`off` disables.
  * Output attributes are re-aliased to the original ids (interval-side
  * equi keys served from the point side — equal on every inner-matched
  * row), so parent operators are untouched. */
class IntervalRewriteRule(session: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

  import IntervalRewriteRule._

  private def mode: PlanStats.Mode =
    PlanStats.mode(conf.getConfString(ConfKey, "auto"), ConfKey)

  /** `auto`-mode firing gate — see [[AsOfRewriteRule.gatePasses]]: fire
    * only when both sides sit at or above the per-key-density break-even
    * (cached [[PlanStats]] jobs); `force` skips the estimate. */
  private def gatePasses(left: LogicalPlan, leftKeys: Seq[AttributeReference],
                         right: LogicalPlan, rightKeys: Seq[AttributeReference]): Boolean =
    mode match {
      case PlanStats.Force => true
      case _ =>
        val threshold = conf.getConfString(
          PlanStats.MinRowsPerKeyConf, PlanStats.DefaultMinRowsPerKey.toString).toDouble
        val fires = PlanStats.gateFires(session, threshold, left, leftKeys, right, rightKeys)
        if (!fires) logInfo("graft interval rewrite: naive range join matched but per-key " +
          s"density is below $threshold rows/key on at least one side - leaving the naive plan")
        fires
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (mode == PlanStats.Off) plan
    else plan.transformUp {
      case j: Join if !j.isStreaming =>
        try rewrite(j) match {
          case Some(replaced) =>
            logInfo("graft interval rewrite: replaced a naive range join with the bucketized plan")
            replaced
          case None => j
        }
        catch {
          case NonFatal(e) =>
            logWarning(s"graft interval rewrite: failed to assemble replacement, " +
              s"leaving the naive plan: $e")
            j
        }
    }

  /** One recognized bound: the interval-side column, whether it is the
    * LOWER bound, and whether the comparison is strict. */
  private case class Bound(ivCol: AttributeReference, lower: Boolean, strict: Boolean)

  private case class Shape(
      keys: Seq[(AttributeReference, AttributeReference)], // (point, interval)
      ts: AttributeReference,
      lo: Bound,
      hi: Bound,
      residuals: Seq[Expression],
      // Some(uniquePointIdAttr) when the join is point-preserved OUTER
      // and the rewrite may route to pointInIntervalLeft
      outerPointId: Option[AttributeReference],
      // Some(uniqueIntervalIdAttr) when the join is INTERVAL-preserved
      // OUTER (intervals LEFT JOIN points, or the mirror RIGHT) and the
      // rewrite may route to pointInIntervalRight
      outerIntervalId: Option[AttributeReference])

  /** Interval-overlap variant of the pattern: `a.s ≤ b.e AND b.s ≤ a.e`
    * — each side contributes one start and one end (when both bounds hit
    * the SAME column of a side, that side is a point and [[Shape]]
    * matches instead). */
  private case class OverlapShape(
      keys: Seq[(AttributeReference, AttributeReference)], // (a, b)
      aS: AttributeReference, aE: AttributeReference,
      bS: AttributeReference, bE: AttributeReference,
      strictAB: Boolean, // a.s REL b.e
      strictBA: Boolean, // b.s REL a.e
      residuals: Seq[Expression])

  private def rewrite(join: Join): Option[LogicalPlan] =
    matchShape(join, join.left, join.right)
      .filter(s => gatePasses(join.left, s.keys.map(_._1), join.right, s.keys.map(_._2)))
      .map(s => build(join, join.left, join.right, s))
      .orElse(matchShape(join, join.right, join.left)
        .filter(s => gatePasses(join.right, s.keys.map(_._1), join.left, s.keys.map(_._2)))
        .map(s => build(join, join.right, join.left, s)))
      .orElse(matchOverlap(join)
        .filter(s => gatePasses(join.left, s.keys.map(_._1), join.right, s.keys.map(_._2)))
        .map(s => buildOverlap(join, s)))

  /** A column provably unique per row of `plan`: the single grouping
    * attribute of an Aggregate (each output row IS one distinct value of
    * it), surviving any attribute-only Projects above. The conservative
    * inference [[IntervalJoin.pointInIntervalLeft]]'s uniqueness contract
    * needs — anything weaker (a filter over a unique source, a join
    * preserving a key) would require constraint propagation this rule
    * deliberately does not attempt. */
  private def uniquePointId(plan: LogicalPlan): Option[AttributeReference] = plan match {
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      uniquePointId(child).filter(a => plan.outputSet.contains(a))
    case Aggregate(Seq(g: AttributeReference), _, _, _) if plan.outputSet.contains(g) =>
      Some(g)
    case _ => None
  }

  private def matchShape(join: Join, points: LogicalPlan, intervals: LogicalPlan): Option[Shape] = {
    // Point-preserved OUTER joins (LEFT with points on the left, or the
    // mirror-image RIGHT with points on the right) route to
    // pointInIntervalLeft; INTERVAL-preserved outers (LEFT with the
    // intervals on the left, or the mirror RIGHT) to pointInIntervalRight
    // — each ONLY when the preserved side exposes a provably-unique id
    // and the bounds/conjuncts translate exactly (checked after the
    // bound classification below).
    val pointPreserved = (join.joinType == LeftOuter && (points eq join.left)) ||
      (join.joinType == RightOuter && (points eq join.right))
    val intervalPreserved = (join.joinType == LeftOuter && (intervals eq join.left)) ||
      (join.joinType == RightOuter && (intervals eq join.right))
    if (!(join.joinType == Inner || pointPreserved || intervalPreserved) ||
        join.condition.isEmpty) return None
    // RECURSION BREAKER: in the operator fixed-point batch, filter
    // pushdown folds the rewritten plan's containment filter back into
    // its (key, cell) equi-join — which would re-match this very pattern
    // and loop. The rewrite's own working columns are identifiable by
    // name (the fresh prefix and the operator's `__cell`); never rewrite
    // a join that touches them. [[AsOfRewriteRule.FreshPrefix]] is vetoed
    // too so the two rules' breakers are MUTUAL by construction — today
    // the as-of replacement plan contains zero joins, but that is an
    // implicit invariant this veto makes explicit rather than relied on.
    if (join.condition.get.references.exists(a =>
        a.name.startsWith(FreshPrefix) || a.name.startsWith("__") ||
        a.name.startsWith(AsOfRewriteRule.FreshPrefix))) return None
    val conjuncts = splitConjunctivePredicates(join.condition.get)
    var keys   = Vector.empty[(AttributeReference, AttributeReference)]
    var bounds = Vector.empty[(AttributeReference, Bound)] // (point ts, bound)
    def attr(x: Expression): Option[AttributeReference] = x match {
      case ar: AttributeReference => Some(ar)
      case _                      => None
    }
    // normalize to (ivCol REL ts): `lowerIfIvFirst` is the bound kind when
    // the INTERVAL column is the comparison's left operand under ≤/<
    def bound(l: Expression, r: Expression, strict: Boolean): Boolean =
      (attr(l), attr(r)) match {
        case (Some(a), Some(b))
            if intervals.outputSet.contains(a) && points.outputSet.contains(b) =>
          bounds :+= ((b, Bound(a, lower = true, strict))); true // iv ≤ ts → lower bound
        case (Some(a), Some(b))
            if points.outputSet.contains(a) && intervals.outputSet.contains(b) =>
          bounds :+= ((a, Bound(b, lower = false, strict))); true // ts ≤ iv → upper bound
        case _ => false
      }
    // anything that is neither an equi key nor a bound-shaped comparison
    // rides along as a RESIDUAL post-filter — exact, because unlike the
    // as-of argmax every (point, interval) pair here is independent.
    // Bound-SHAPED comparisons are never residuals: a third one would
    // make the pairing ambiguous, so it vetoes below instead.
    var residuals = Vector.empty[Expression]
    val ok = conjuncts.forall {
      case c @ EqualTo(l, r) =>
        (attr(l), attr(r)) match {
          case (Some(a), Some(b)) if points.outputSet.contains(a) && intervals.outputSet.contains(b) =>
            keys :+= ((a, b)); true
          case (Some(a), Some(b)) if intervals.outputSet.contains(a) && points.outputSet.contains(b) =>
            keys :+= ((b, a)); true
          case _ => residuals :+= c; c.deterministic
        }
      case c @ LessThanOrEqual(l, r)    => bound(l, r, strict = false) || { residuals :+= c; c.deterministic }
      case c @ LessThan(l, r)           => bound(l, r, strict = true) || { residuals :+= c; c.deterministic }
      case c @ GreaterThanOrEqual(l, r) => bound(r, l, strict = false) || { residuals :+= c; c.deterministic } // a >= b  ≡  b <= a
      case c @ GreaterThan(l, r)        => bound(r, l, strict = true) || { residuals :+= c; c.deterministic }
      case c                            => residuals :+= c; c.deterministic
    }
    if (!ok || keys.isEmpty || bounds.size != 2) return None
    val (ts1, b1) = bounds(0)
    val (ts2, b2) = bounds(1)
    // one point ts, two DISTINCT interval columns, one bound of each kind
    if (!ts1.semanticEquals(ts2) || b1.lower == b2.lower ||
        b1.ivCol.semanticEquals(b2.ivCol)) return None
    if (keys.exists(k => k._1.semanticEquals(ts1) ||
        k._2.semanticEquals(b1.ivCol) || k._2.semanticEquals(b2.ivCol))) return None
    val (lo, hi) = if (b1.lower) (b1, b2) else (b2, b1)
    // Exactness under OUTER needs a per-row unique id on the PRESERVED
    // side (the operator's anti-join key) that is not itself a join key.
    // Strict bounds and residual conjuncts are fine either way: they
    // route to the operator's `innerFilter` — applied to matched
    // candidates BEFORE the unmatched set is computed, i.e.
    // join-condition semantics, not a post-filter (which would drop the
    // naive plan's null-extended rows).
    val pid: Option[AttributeReference] =
      if (!pointPreserved) None
      else uniquePointId(points) match {
        case Some(id) if !keys.exists(_._1.exprId == id.exprId) => Some(id)
        case _                                                  => return None
      }
    val ivId: Option[AttributeReference] =
      if (!intervalPreserved) None
      else uniquePointId(intervals) match {
        // also veto an id doubling as a bound column — a grouped
        // attribute that IS the start/end would make the null-extension
        // indicator ambiguous; conservative, like every veto here
        case Some(id) if !keys.exists(_._2.exprId == id.exprId) &&
            !id.semanticEquals(lo.ivCol) && !id.semanticEquals(hi.ivCol) => Some(id)
        case _ => return None
      }
    Some(Shape(keys, ts1, lo, hi, residuals, pid, ivId))
  }

  /** Classify the overlap pattern on (left = a, right = b); the shape is
    * symmetric, so one orientation suffices. */
  private def matchOverlap(join: Join): Option[OverlapShape] = {
    val (a, b) = (join.left, join.right)
    if (join.joinType != Inner || join.condition.isEmpty) return None
    if (join.condition.get.references.exists(x =>
        x.name.startsWith(FreshPrefix) || x.name.startsWith("__") ||
        x.name.startsWith(AsOfRewriteRule.FreshPrefix))) return None
    val conjuncts = splitConjunctivePredicates(join.condition.get)
    var keys  = Vector.empty[(AttributeReference, AttributeReference)]
    // normalized to (x ≤ y): (xAttr, yAttr, strict, xIsA)
    var ineqs = Vector.empty[(AttributeReference, AttributeReference, Boolean, Boolean)]
    def attr(x: Expression): Option[AttributeReference] = x match {
      case ar: AttributeReference => Some(ar)
      case _                      => None
    }
    def le(l: Expression, r: Expression, strict: Boolean): Boolean =
      (attr(l), attr(r)) match {
        case (Some(x), Some(y)) if a.outputSet.contains(x) && b.outputSet.contains(y) =>
          ineqs :+= ((x, y, strict, true)); true
        case (Some(x), Some(y)) if b.outputSet.contains(x) && a.outputSet.contains(y) =>
          ineqs :+= ((x, y, strict, false)); true
        case _ => false
      }
    // non-key, non-bound-shaped conjuncts ride along as residual
    // post-filters (pairs are independent — exact); a third bound-shaped
    // inequality vetoes below (ambiguous pairing)
    var residuals = Vector.empty[Expression]
    val ok = conjuncts.forall {
      case c @ EqualTo(l, r) =>
        (attr(l), attr(r)) match {
          case (Some(x), Some(y)) if a.outputSet.contains(x) && b.outputSet.contains(y) =>
            keys :+= ((x, y)); true
          case (Some(x), Some(y)) if b.outputSet.contains(x) && a.outputSet.contains(y) =>
            keys :+= ((y, x)); true
          case _ => residuals :+= c; c.deterministic
        }
      case c @ LessThanOrEqual(l, r)    => le(l, r, strict = false) || { residuals :+= c; c.deterministic }
      case c @ LessThan(l, r)           => le(l, r, strict = true) || { residuals :+= c; c.deterministic }
      case c @ GreaterThanOrEqual(l, r) => le(r, l, strict = false) || { residuals :+= c; c.deterministic }
      case c @ GreaterThan(l, r)        => le(r, l, strict = true) || { residuals :+= c; c.deterministic }
      case c                            => residuals :+= c; c.deterministic
    }
    if (!ok || keys.isEmpty || ineqs.size != 2) return None
    // exactly one a→b and one b→a inequality, four DISTINCT columns
    // (a shared column on one side is the point pattern, handled above)
    val (ab, ba) = ineqs.partition(_._4)
    if (ab.size != 1 || ba.size != 1) return None
    val (aS, bE, strictAB, _) = ab.head
    val (bS, aE, strictBA, _) = ba.head
    if (aS.semanticEquals(aE) || bS.semanticEquals(bE)) return None
    val rangeCols = Seq(aS, aE, bS, bE)
    if (keys.exists(k => rangeCols.exists(c => k._1.semanticEquals(c) || k._2.semanticEquals(c))))
      return None
    Some(OverlapShape(keys, aS, aE, bS, bE, strictAB, strictBA, residuals))
  }

  /** Assemble the overlap replacement. [[IntervalJoin.overlap]] only
    * emits VALID intervals (`s ≤ e`) — the naive condition can also
    * match rows whose own columns are inverted (it never compares a
    * side's start to its own end) — so two fallback joins (usually
    * planned over empty inputs) carry the invalid-side pairs and keep
    * the rewrite exact on arbitrary data. Strict bounds re-impose as a
    * post-filter of the inclusive operator output. */
  private def buildOverlap(join: Join, shape: OverlapShape): LogicalPlan = {
    val (a, b) = (join.left, join.right)
    val keyName = shape.keys.indices.map(i => s"${FreshPrefix}k$i")
    def aKeyIdx(x: Attribute): Option[Int] =
      shape.keys.indexWhere(_._1.exprId == x.exprId) match { case -1 => None; case i => Some(i) }
    def bKeyIdx(x: Attribute): Option[Int] =
      shape.keys.indexWhere(_._2.exprId == x.exprId) match { case -1 => None; case i => Some(i) }
    val aName: Map[ExprId, String] = a.output.zipWithIndex.map { case (x, i) =>
      x.exprId -> aKeyIdx(x).map(keyName).getOrElse(s"${FreshPrefix}a$i")
    }.toMap
    val bName: Map[ExprId, String] = b.output.zipWithIndex.map { case (x, i) =>
      x.exprId -> bKeyIdx(x).map(keyName).getOrElse(s"${FreshPrefix}b$i")
    }.toMap
    val aProj = Project(
      a.output.filter(x => aKeyIdx(x).isEmpty).map(x => Alias(x, aName(x.exprId))()) ++
        shape.keys.zipWithIndex.map { case ((ak, _), i) => Alias(ak, keyName(i))() },
      a)
    val bProj = Project(
      b.output.filter(x => bKeyIdx(x).isEmpty).map(x => Alias(x, bName(x.exprId))()) ++
        shape.keys.zipWithIndex.map { case ((_, bk), i) => Alias(bk, keyName(i))() },
      b)
    val aDf = GraftSqlShim.ofRows(session, aProj)
    val bDf = GraftSqlShim.ofRows(session, bProj)
    val (aSN, aEN) = (aName(shape.aS.exprId), aName(shape.aE.exprId))
    val (bSN, bEN) = (bName(shape.bS.exprId), bName(shape.bE.exprId))

    val width = PlanStats.cachedWidth(
      aDf.select(col(aSN).as("s"), col(aEN).as("e"))
        .unionByName(bDf.select(col(bSN).as("s"), col(bEN).as("e"))), "s", "e")
    val rangeCond =
      (if (shape.strictAB) col(aSN) < col(bEN) else col(aSN) <= col(bEN)) &&
      (if (shape.strictBA) col(bSN) < col(aEN) else col(bSN) <= col(aEN))
    val main = IntervalJoin.overlap(aDf, bDf, keyName, aSN, aEN, bSN, bEN, width)
      .filter(rangeCond)
    val fb1 = aDf.filter(col(aSN) > col(aEN))
      .join(bDf, keyName).filter(rangeCond)
    val fb2 = aDf.filter(col(aSN) <= col(aEN))
      .join(bDf.filter(col(bSN) > col(bEN)), keyName).filter(rangeCond)
    val cols = main.columns.toSeq.map(col)
    val out  = main.unionByName(fb1.select(cols: _*)).unionByName(fb2.select(cols: _*))

    val outPlan = out.queryExecution.analyzed
    val byName  = outPlan.output.map(x => x.name -> x).toMap
    def renamed(x: Attribute): Attribute =
      if (a.outputSet.contains(x)) aKeyIdx(x) match {
        case Some(i) => byName(keyName(i))
        case None    => byName(aName(x.exprId))
      }
      else bKeyIdx(x) match {
        case Some(i) => byName(keyName(i)) // inner join: equal to the a key
        case None    => byName(bName(x.exprId))
      }
    val withResiduals =
      if (shape.residuals.isEmpty) outPlan
      else Filter(
        shape.residuals
          .map(_.transformUp { case ar: AttributeReference => renamed(ar) })
          .reduce(And), outPlan)
    val aliases = join.output.map(x => Alias(renamed(x), x.name)(x.exprId, x.qualifier))
    Project(aliases, withResiduals)
  }

  private def build(join: Join, points: LogicalPlan, intervals: LogicalPlan,
                    shape: Shape): LogicalPlan = {
    val keyName = shape.keys.indices.map(i => s"${FreshPrefix}k$i")
    def pKeyIdx(a: Attribute): Option[Int] =
      shape.keys.indexWhere(_._1.exprId == a.exprId) match { case -1 => None; case i => Some(i) }
    def ivKeyIdx(a: Attribute): Option[Int] =
      shape.keys.indexWhere(_._2.exprId == a.exprId) match { case -1 => None; case i => Some(i) }

    // rename EVERYTHING (the operator requires non-key disjointness; fresh
    // names satisfy it by construction); every output column survives
    val pName: Map[ExprId, String] = points.output.zipWithIndex.map { case (a, i) =>
      a.exprId -> pKeyIdx(a).map(keyName).getOrElse(s"${FreshPrefix}p$i")
    }.toMap
    val ivName: Map[ExprId, String] = intervals.output.zipWithIndex.map { case (a, i) =>
      a.exprId -> ivKeyIdx(a).map(keyName).getOrElse(s"${FreshPrefix}i$i")
    }.toMap

    // keys aliased PER PAIR (a column reused in two key pairs needs both
    // fresh key names), non-key columns once each
    val pProj = Project(
      points.output.filter(a => pKeyIdx(a).isEmpty)
        .map(a => Alias(a, pName(a.exprId))()) ++
        shape.keys.zipWithIndex.map { case ((pk, _), i) => Alias(pk, keyName(i))() },
      points)
    val ivProj = Project(
      intervals.output.filter(a => ivKeyIdx(a).isEmpty)
        .map(a => Alias(a, ivName(a.exprId))()) ++
        shape.keys.zipWithIndex.map { case ((_, ivk), i) => Alias(ivk, keyName(i))() },
      intervals)

    val pDf  = GraftSqlShim.ofRows(session, pProj)
    val ivDf = GraftSqlShim.ofRows(session, ivProj)
    val sName  = ivName(shape.lo.ivCol.exprId)
    val eName  = ivName(shape.hi.ivCol.exprId)
    val tsName = pName(shape.ts.exprId)

    val width = PlanStats.cachedWidth(ivDf, sName, eName)
    // fresh-name forms of the strict-bound re-filters and residuals: under
    // OUTER they must act as join-condition predicates on the matched
    // candidates (the operator's innerFilter), under INNER as ordinary
    // post-filters — same expressions either way
    def freshRef(x: AttributeReference): String =
      if (points.outputSet.contains(x)) pName(x.exprId)
      else ivKeyIdx(x).map(keyName).getOrElse(ivName(x.exprId))
    val freshResiduals = shape.residuals.map(r => GraftSqlShim.column(
      r.transformUp { case ar: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(freshRef(ar))
      }))
    val strictFilters =
      (if (shape.lo.strict) Seq(col(sName) < col(tsName)) else Nil) ++
      (if (shape.hi.strict) Seq(col(tsName) < col(eName)) else Nil)
    val isOuter = shape.outerPointId.isDefined || shape.outerIntervalId.isDefined
    var out = (shape.outerPointId, shape.outerIntervalId) match {
      case (Some(id), _) => // point-preserved outer: unmatched points keep
        // one null-extended row, keyed off the provably-unique point id;
        // strict bounds + residuals applied INSIDE, before the anti-join
        IntervalJoin.pointInIntervalLeft(pDf, ivDf, keyName, pName(id.exprId),
          tsName, sName, eName, width,
          innerFilter = (strictFilters ++ freshResiduals).reduceOption(_ && _))
      case (_, Some(id)) => // interval-preserved outer: the mirror —
        // uncovered intervals keep one row with null point columns
        IntervalJoin.pointInIntervalRight(pDf, ivDf, keyName, ivName(id.exprId),
          tsName, sName, eName, width,
          innerFilter = (strictFilters ++ freshResiduals).reduceOption(_ && _))
      case _ =>
        IntervalJoin.pointInInterval(pDf, ivDf, keyName, tsName, sName, eName, width)
    }
    // the operator's containment is inclusive; re-impose strict bounds
    // (inner path — the outer paths folded them into innerFilter above)
    if (!isOuter) strictFilters.foreach(f => out = out.filter(f))

    val outPlan = out.queryExecution.analyzed
    val byName  = outPlan.output.map(a => a.name -> a).toMap
    def renamed(x: Attribute): Attribute =
      if (points.outputSet.contains(x)) byName(pName(x.exprId))
      else ivKeyIdx(x) match {
        case Some(i) => byName(keyName(i)) // equal to the point key on matched rows
        case None    => byName(ivName(x.exprId))
      }
    def outExpr(x: Attribute): Expression = renamed(x) match {
      case pk if shape.outerPointId.isDefined && !points.outputSet.contains(x) &&
          ivKeyIdx(x).isDefined =>
        // the naive outer plan's unmatched rows carry NULL interval keys;
        // the point-side stand-in only holds where a match exists (the
        // operator null-extends the interval START on unmatched rows)
        If(IsNotNull(byName(sName)), pk, Literal.create(null, pk.dataType))
      case pk if shape.outerIntervalId.isDefined && points.outputSet.contains(x) &&
          pKeyIdx(x).isDefined =>
        // the mirror: unmatched INTERVAL rows carry NULL point keys; the
        // match indicator is the point TS (matched rows always have it —
        // the operator drops null-ts points before the join)
        If(IsNotNull(byName(tsName)), pk, Literal.create(null, pk.dataType))
      case other => other
    }
    val withResiduals =
      if (shape.residuals.isEmpty || isOuter) outPlan // outer: inside
      else Filter(
        shape.residuals
          .map(_.transformUp { case ar: AttributeReference => renamed(ar) })
          .reduce(And), outPlan)
    val aliases = join.output.map(a => Alias(outExpr(a), a.name)(a.exprId, a.qualifier))
    Project(aliases, withResiduals)
  }
}

object IntervalRewriteRule {
  /** Tri-state switch ([[PlanStats.mode]]): `auto` (default) fires past
    * the density break-even, `true`/`force` on every match, `false`/`off`
    * never. */
  val ConfKey = "spark.graft.interval.rewrite"

  /** Shares [[AsOfRewriteRule.FreshPrefix]]'s naming contract. */
  val FreshPrefix = "givj_"

  /** Idempotently attach to a live session (see
    * [[AsOfRewriteRule.ensure]] for why). */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[IntervalRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new IntervalRewriteRule(spark)
  }
}
