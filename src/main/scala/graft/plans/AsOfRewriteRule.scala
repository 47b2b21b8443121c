package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.IntegerType

import graft.operators.AsOfJoin

/** Catalyst rewrite: the NAIVE as-of encoding — an inner equi-join whose
  * inequality conjunct only filters, followed by an argmax per left row —
  * becomes [[AsOfJoin.asof]]'s union+window plan (one shuffle, ZERO joins,
  * |L|+|R| intermediate) automatically.
  *
  * The naive pattern is the natural way to write "latest right at-or-before
  * each left" in SQL or the DataFrame API, and it silently costs
  * O(|L|·|R|/keys): every left row pairs with EVERY earlier right row of
  * its key before the rank/argmax throws all but one away — exactly the
  * trap [[AsOfJoin]]'s scaladoc warns about. Users who know the operator
  * API call it; this rule is for the ones who don't (SURVEY §7.3's
  * reserved "custom `Rule` if we build a DSL on top" slot).
  *
  * == Recognized shapes ==
  * Two argmax spellings, both over `probe JOIN version ON equi-keys AND
  * version.ts ≤/</≥/> probe.ts` (any conjunct order, either comparison
  * orientation, ≥1 equi key, plain column references throughout). An
  * additional tolerance-band conjunct — `version.ts >= probe.ts - tol`
  * (backward) / `version.ts <= probe.ts + tol` (forward), or the
  * distance spelling `probe.ts - version.ts <= tol`, with a literal
  * non-negative `tol` — maps to the operator's `tolerance` flag (the
  * latest match within the band IS the latest match, nulled past it):
  *
  *  1. **rank-1**: `Filter(rn = 1, Window(row_number() OVER (PARTITION BY
  *     <probe cols> ORDER BY version.ts DESC|ASC), join))` — fires when
  *     the partition covers exactly the surviving probe columns (so the
  *     window's groups are distinct probe tuples, including the probe
  *     timestamp and all equi keys), the single ORDER BY column is the
  *     version timestamp, and its direction agrees with the inequality
  *     (DESC for ≤/< backward, ASC for ≥/> forward).
  *  2. **max_by**: `Aggregate(GROUP BY <probe cols>, max_by(expr,
  *     version.ts) / max(version.ts) …, join)` (`min_by`/`min` in the
  *     forward direction) — fires when every grouping column is a probe
  *     column (again including the probe timestamp and all equi keys) and
  *     every aggregate is an argmax-by-version-ts over version columns.
  *
  * == Exactness ==
  * Both shapes produce one row per DISTINCT probe tuple that has a match —
  * so the rewrite probes from `Distinct(probe)` and is exact even when
  * probe rows duplicate. Equal-version-timestamp ties are nondeterministic
  * in the naive plan (row_number/max_by pick an arbitrary winner) and
  * resolved deterministically by the rewrite — value parity is guaranteed
  * when (keys, ts) is unique on the version side, the same determinism
  * contract as DuckDB's ASOF JOIN. Version-side equi-key output columns
  * are served from the probe side (equal on every matched row by the join
  * predicate). Unmatched probe tuples drop under INNER; a LEFT OUTER
  * naive join (probe side preserved) — or the mirror-image RIGHT OUTER
  * with the probe as the right child, normalized before matching — maps
  * to the operator's `joinType="left"`: unmatched probes keep one row
  * with null version columns, including null version keys, exactly the
  * naive plan's null-extended rows.
  *
  * ON by default in `auto` mode (`spark.graft.asof.rewrite=auto`): a
  * matched shape fires only past the measured per-key-density break-even
  * ([[PlanStats]] — ~100 rows/key per side; below it the naive plan is
  * already cheap and the rewrite's constant overhead loses). `true` /
  * `force` fires on every matched shape regardless of density (the
  * pre-gate opt-in behavior); `false`/`off` disables. The rule replaces
  * the matched subtree with the analyzed [[AsOfJoin.asof]] plan and
  * re-aliases its output to the original attribute ids, so parent
  * operators are untouched; any unexpected failure while assembling the
  * replacement logs and leaves the plan as written. */
class AsOfRewriteRule(session: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

  import AsOfRewriteRule._

  private def mode: PlanStats.Mode =
    PlanStats.mode(conf.getConfString(ConfKey, "auto"), ConfKey)

  /** `auto`-mode firing gate: the rewrite rescues a plan quadratic in
    * per-key density, so fire only when BOTH sides sit at or above the
    * measured break-even (~100 rows/key, [[PlanStats]]); below it the
    * naive plan is already cheap and the rewrite's constant overhead
    * would be a pessimization. Cached per canonicalized side plan. */
  private def gatePasses(probe: LogicalPlan, version: LogicalPlan,
                         shape: JoinShape): Boolean = mode match {
    case PlanStats.Force => true
    case _ =>
      val threshold = conf.getConfString(
        PlanStats.MinRowsPerKeyConf, PlanStats.DefaultMinRowsPerKey.toString).toDouble
      val fires = PlanStats.gateFires(session, threshold,
        probe, shape.keys.map(_._1), version, shape.keys.map(_._2))
      if (!fires) logInfo("graft as-of rewrite: naive argmax matched but per-key density " +
        s"is below $threshold rows/key on at least one side - leaving the naive plan (cheap there)")
      fires
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (mode == PlanStats.Off) plan
    else plan.transformUp {
      case f: Filter if !f.isStreaming =>
        attempt(s"rank-1 at ${f.nodeName}")(rewriteRankOne(f)).getOrElse(f)
      case a: Aggregate if !a.isStreaming =>
        attempt(s"max_by at ${a.nodeName}")(rewriteMaxBy(a)).getOrElse(a)
    }

  private def attempt[T](what: String)(body: => Option[T]): Option[T] =
    try {
      val out = body
      if (out.isDefined)
        logInfo(s"graft as-of rewrite: replaced a naive $what argmax with the union+window plan")
      out
    } catch {
      case NonFatal(e) =>
        logWarning(s"graft as-of rewrite: failed to assemble $what, leaving the naive plan: $e")
        None
    }

  // ---------------------------------------------------------------- shape 1

  private def rewriteRankOne(f: Filter): Option[LogicalPlan] = f.child match {
    case w: Window if w.windowExpressions.size == 1 && w.orderSpec.size == 1 =>
      (w.windowExpressions.head, w.orderSpec.head) match {
        case (al @ Alias(WindowExpression(RowNumber(), _), _),
              SortOrder(ordAttr: AttributeReference, ordDir, _, _))
            if isRankOne(f.condition, al.toAttribute) =>
          for {
            (survivors, join) <- stripToJoin(w.child)
            parts             <- asAttrs(w.partitionSpec)
            result <- bothWays(join) { (probe, version) =>
              for {
                shape <- matchJoin(join, probe, version)
                // ORDER BY must be the version ts, in the direction the
                // inequality selects
                if version.outputSet.contains(ordAttr) && shape.vTs.semanticEquals(ordAttr) &&
                  (if (shape.forward) ordDir == Ascending else ordDir == Descending)
                // PARTITION BY must be exactly the surviving probe columns
                // (groups = distinct probe tuples), incl. ts and keys
                partSet = AttributeSet(parts)
                surviveProbe = survivors.intersect(probe.outputSet)
                if partSet.subsetOf(surviveProbe) && surviveProbe.subsetOf(partSet) &&
                  coversShape(partSet, shape)
                // density gate LAST: it is the only check that runs jobs
                if gatePasses(probe, version, shape)
                built <- build(shape, probe, version,
                  probeCols = parts,
                  neededVersion = survivors.intersect(version.outputSet).toSeq)
              } yield built
            }
          } yield {
            val (byId, asofPlan) = result
            // f.output = join survivors ++ rn; rn post-filter is literally 1
            val outs = f.output.map { a =>
              if (a.exprId == al.exprId) Alias(Literal(1, IntegerType), a.name)(a.exprId, a.qualifier)
              else Alias(byId(a.exprId), a.name)(a.exprId, a.qualifier)
            }
            Project(outs, asofPlan)
          }
        case _ => None
      }
    case _ => None
  }

  // ---------------------------------------------------------------- shape 2

  private def rewriteMaxBy(a: Aggregate): Option[LogicalPlan] =
    for {
      (_, join) <- stripToJoin(a.child)
      groups    <- asAttrs(a.groupingExpressions)
      result <- bothWays(join) { (probe, version) =>
        for {
          shape <- matchJoin(join, probe, version)
          groupSet = AttributeSet(groups)
          if groups.forall(probe.outputSet.contains) && coversShape(groupSet, shape)
          aggs <- collectArgmaxAggs(a.aggregateExpressions, groupSet, version.outputSet,
            shape.vTs, shape.forward)
          // density gate LAST: it is the only check that runs jobs
          if gatePasses(probe, version, shape)
          built <- build(shape, probe, version,
            probeCols = groups,
            neededVersion = AttributeSet(aggs.flatMap(_._2.references))
              .intersect(version.outputSet).toSeq)
        } yield (built, aggs.toMap)
      }
    } yield {
      val ((byId, asofPlan), aggValues) = result
      val outs = a.aggregateExpressions.map {
        case ar: AttributeReference =>
          Alias(byId(ar.exprId), ar.name)(ar.exprId, ar.qualifier)
        case al @ Alias(child, name) =>
          val value = aggValues.get(al).getOrElse(child) // passthrough alias keeps its child
          val substituted = value.transformUp {
            case ar: AttributeReference => byId(ar.exprId)
          }
          Alias(substituted, name)(al.exprId, al.qualifier)
        case other =>
          // unreachable: collectArgmaxAggs only accepts the forms above
          throw new IllegalStateException(s"unexpected aggregate expression $other")
      }
      Project(outs, asofPlan)
    }

  /** Every aggregate expression must be a grouping passthrough or an
    * argmax-by-version-ts in the matched direction; returns each argmax
    * alias with the value expression under it. */
  private def collectArgmaxAggs(
      aggExprs: Seq[NamedExpression],
      groupSet: AttributeSet,
      versionSet: AttributeSet,
      vTs: AttributeReference,
      forward: Boolean): Option[Seq[(Alias, Expression)]] = {
    val picked: Seq[Option[Option[(Alias, Expression)]]] = aggExprs.map {
      case ar: AttributeReference if groupSet.contains(ar)             => Some(None)
      case Alias(child: AttributeReference, _) if groupSet.contains(child) => Some(None)
      case al @ Alias(ae: AggregateExpression, _) =>
        argmaxValue(ae) match {
          case Some(v)
              if argmaxOrd(ae).exists(_.semanticEquals(vTs)) &&
                argmaxForward(ae).contains(forward) &&
                v.references.subsetOf(versionSet) && v.deterministic =>
            Some(Some((al, v)))
          case _ => None
        }
      case _ => None
    }
    if (picked.forall(_.isDefined)) Some(picked.flatten.flatten) else None
  }

  // ---------------------------------------------------------------- common

  /** The join halves of the naive pattern, normalized: equi key pairs
    * (probe attr, version attr) and the single inequality's timestamps +
    * direction/strictness. */
  private case class JoinShape(
      keys: Seq[(AttributeReference, AttributeReference)],
      pTs: AttributeReference,
      vTs: AttributeReference,
      forward: Boolean,
      strict: Boolean,
      tolerance: Option[Long],
      leftOuter: Boolean)

  /** The probe-side column set the pattern groups on must pin the probe ts
    * and every equi key — otherwise the naive query's groups span several
    * as-of probes and the pattern is NOT an as-of join. */
  private def coversShape(cols: AttributeSet, shape: JoinShape): Boolean =
    cols.contains(shape.pTs) && shape.keys.forall(k => cols.contains(k._1))

  private def bothWays[T](join: Join)(f: (LogicalPlan, LogicalPlan) => Option[T]): Option[T] =
    f(join.left, join.right).orElse(f(join.right, join.left))

  private def matchJoin(join: Join, probe: LogicalPlan, version: LogicalPlan): Option[JoinShape] = {
    // Outer joins map to the operator's joinType="left" — but only with
    // the PRESERVED side as the probe (a version-preserved orientation is
    // not an as-of); the rank-1/argmax then resolves each unmatched
    // probe's single null-extended row, exactly the operator's left
    // semantics. A RIGHT OUTER whose preserved side is the probe is the
    // SAME query spelled backwards (`version RIGHT JOIN probe`), so it
    // normalizes here instead of being rejected — `bothWays` already
    // tries both (probe, version) assignments, and everything downstream
    // keys off side MEMBERSHIP, never off left/right position.
    val leftOuter = (join.joinType == LeftOuter && (probe eq join.left)) ||
      (join.joinType == RightOuter && (probe eq join.right))
    if (!(join.joinType == Inner || leftOuter)) return None
    if (join.condition.isEmpty) return None
    // recursion breaker (see IntervalRewriteRule.matchShape): never match
    // a join over the rewrites' own working columns
    if (join.condition.get.references.exists(a =>
        a.name.startsWith(FreshPrefix) || a.name.startsWith("__") ||
        a.name.startsWith(IntervalRewriteRule.FreshPrefix))) return None
    val conjuncts = splitConjunctivePredicates(join.condition.get)
    var keys      = Vector.empty[(AttributeReference, AttributeReference)]
    var ineqs     = Vector.empty[(AttributeReference, AttributeReference, Boolean, Boolean)]
    var leftovers = Vector.empty[Expression]
    def attr(x: Expression): Option[AttributeReference] = x match {
      case ar: AttributeReference => Some(ar)
      case _                      => None
    }
    // normalize each bare comparison to (vTs REL pTs); `vFirstForward` is
    // the direction when the VERSION ts is the comparison's left operand
    def asOfPair(l: Expression, r: Expression, vFirstForward: Boolean, strict: Boolean): Boolean =
      (attr(l), attr(r)) match {
        case (Some(a), Some(b))
            if version.outputSet.contains(a) && probe.outputSet.contains(b) =>
          ineqs :+= ((b, a, vFirstForward, strict)); true
        case (Some(a), Some(b))
            if probe.outputSet.contains(a) && version.outputSet.contains(b) =>
          ineqs :+= ((a, b, !vFirstForward, strict)); true
        case _ => false
      }
    conjuncts.foreach {
      case c @ EqualTo(l, r) =>
        (attr(l), attr(r)) match {
          case (Some(a), Some(b)) if probe.outputSet.contains(a) && version.outputSet.contains(b) =>
            keys :+= ((a, b))
          case (Some(a), Some(b)) if version.outputSet.contains(a) && probe.outputSet.contains(b) =>
            keys :+= ((b, a))
          case _ => leftovers :+= c
        }
      case c @ LessThanOrEqual(l, r)    => if (!asOfPair(l, r, vFirstForward = false, strict = false)) leftovers :+= c // v <= p → backward
      case c @ LessThan(l, r)           => if (!asOfPair(l, r, vFirstForward = false, strict = true)) leftovers :+= c
      case c @ GreaterThanOrEqual(l, r) => if (!asOfPair(l, r, vFirstForward = true, strict = false)) leftovers :+= c  // v >= p → forward
      case c @ GreaterThan(l, r)        => if (!asOfPair(l, r, vFirstForward = true, strict = true)) leftovers :+= c
      case c                            => leftovers :+= c
    }
    if (ineqs.size != 1 || keys.isEmpty) return None
    val (pTs, vTs, forward, strict) = ineqs.head
    if (keys.exists(_._2.semanticEquals(vTs))) return None
    // any remaining conjunct must be a tolerance band bounding the match
    // distance with a literal, consistent with the direction
    val tols = leftovers.map(bandTolerance(_, pTs, vTs, forward))
    if (tols.exists(_.isEmpty)) return None
    Some(JoinShape(keys, pTs, vTs, forward, strict,
      tols.flatten.reduceOption((a, b) => math.min(a, b)), leftOuter))
  }

  /** Recognize the tolerance-band conjunct of a bounded as-of: backward
    * `vTs >= pTs - tol` / `pTs - vTs <= tol`, forward `vTs <= pTs + tol` /
    * `vTs - pTs <= tol` (either operand order, non-negative literal
    * `tol`) — [[AsOfJoin]]'s `tolerance` flag, spelled as a join
    * predicate. Inclusive comparisons only: the operator's tolerance is
    * inclusive, so a strict band has no exact mapping. */
  private def bandTolerance(c: Expression, pTs: AttributeReference,
                            vTs: AttributeReference, forward: Boolean): Option[Long] = {
    def litVal(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Long, _)  => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case _                    => None
    }
    def isP(e: Expression) = e match { case a: AttributeReference => a.semanticEquals(pTs); case _ => false }
    def isV(e: Expression) = e match { case a: AttributeReference => a.semanticEquals(vTs); case _ => false }
    // the match distance as the operator defines it: backward pTs - vTs,
    // forward vTs - pTs
    def isDist(e: Expression) = e match {
      case Subtract(a, b, _) => if (forward) isV(a) && isP(b) else isP(a) && isV(b)
      case _                 => false
    }
    // pTs ± tol with the literal on either Add operand
    def boundOf(e: Expression): Option[Long] = e match {
      case Subtract(p, l, _) if !forward && isP(p)      => litVal(l)
      case Add(x, y, _) if forward && isP(x)            => litVal(y)
      case Add(x, y, _) if forward && isP(y)            => litVal(x)
      case _                                            => None
    }
    val tol = c match {
      case LessThanOrEqual(d, l) if isDist(d)                  => litVal(l) // dist <= tol
      case GreaterThanOrEqual(l, d) if isDist(d)               => litVal(l)
      case GreaterThanOrEqual(v, b) if !forward && isV(v)      => boundOf(b) // v >= p - tol
      case LessThanOrEqual(b, v) if !forward && isV(v)         => boundOf(b)
      case LessThanOrEqual(v, b) if forward && isV(v)          => boundOf(b) // v <= p + tol
      case GreaterThanOrEqual(b, v) if forward && isV(v)       => boundOf(b)
      case _                                                   => None
    }
    tol.filter(_ >= 0)
  }

  /** Peel attribute-only Projects (the analyzer's window child projection,
    * optimizer pruning) and `WindowGroupLimit` (inserted below a rank-1
    * filter by `InferWindowGroupLimit` when the rule runs after that
    * batch, e.g. via `experimental.extraOptimizations`) down to the Join;
    * the surviving attribute set is what the pattern's output can
    * reference. Dropping the group limit is sound: it is a pure pre-filter
    * of rows the rank-1 filter discards anyway. */
  private def stripToJoin(plan: LogicalPlan): Option[(AttributeSet, Join)] = plan match {
    case j: Join => Some((j.outputSet, j))
    case p @ Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      stripToJoin(child).map { case (_, j) => (p.outputSet, j) }
    case wgl: WindowGroupLimit =>
      stripToJoin(wgl.child)
    case _ => None
  }

  private def asAttrs(exprs: Seq[Expression]): Option[Seq[AttributeReference]] = {
    val attrs = exprs.collect { case ar: AttributeReference => ar }
    if (attrs.size == exprs.size && attrs.nonEmpty) Some(attrs) else None
  }

  private def isRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: AttributeReference, Literal(1, IntegerType))         => a.exprId == rn.exprId
    case EqualTo(Literal(1, IntegerType), a: AttributeReference)         => a.exprId == rn.exprId
    case LessThanOrEqual(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn.exprId
    case _                                                               => false
  }

  private def argmaxValue(ae: AggregateExpression): Option[Expression] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case MaxBy(v, _) => Some(v)
      case MinBy(v, _) => Some(v)
      case Max(v)      => Some(v) // max(version.ts) IS the matched ts
      case Min(v)      => Some(v)
      case _           => None
    }

  private def argmaxOrd(ae: AggregateExpression): Option[Expression] = ae.aggregateFunction match {
    case MaxBy(_, o) => Some(o)
    case MinBy(_, o) => Some(o)
    case Max(v)      => Some(v)
    case Min(v)      => Some(v)
    case _           => None
  }

  private def argmaxForward(ae: AggregateExpression): Option[Boolean] = ae.aggregateFunction match {
    case _: MaxBy | _: Max => Some(false)
    case _: MinBy | _: Min => Some(true)
    case _                 => None
  }

  /** Assemble the replacement: rename both halves to collision-free
    * columns, run them through the spec-pinned [[AsOfJoin.asof]], and hand
    * back the analyzed plan plus the original-exprId → new-output map.
    * Version equi keys are served from their probe partner (equal on
    * every matched row); under LEFT OUTER they are additionally guarded
    * by match-ness — the naive plan's null-extended rows carry NULL
    * version keys, so the probe value only stands in when a match exists
    * (`rightTs IS NOT NULL`).
    *
    * @param probeCols     probe attrs the output needs (the pattern's
    *                      partition/grouping columns; include pTs + keys)
    * @param neededVersion version attrs the output needs */
  private def build(
      shape: JoinShape,
      probe: LogicalPlan,
      version: LogicalPlan,
      probeCols: Seq[AttributeReference],
      neededVersion: Seq[Attribute]): Option[(Map[ExprId, Expression], LogicalPlan)] = {

    // --- name assignment (collision-free by construction)
    val keyName = shape.keys.indices.map(i => s"${FreshPrefix}k$i")
    def probeKeyIdx(a: Attribute): Option[Int] =
      shape.keys.indexWhere(_._1.exprId == a.exprId) match { case -1 => None; case i => Some(i) }
    def versionKeyIdx(a: Attribute): Option[Int] =
      shape.keys.indexWhere(_._2.exprId == a.exprId) match { case -1 => None; case i => Some(i) }
    val distinctProbeCols = probeCols.foldLeft(Vector.empty[AttributeReference])((acc, a) =>
      if (acc.exists(_.exprId == a.exprId)) acc else acc :+ a)
    val probeName: Map[ExprId, String] = distinctProbeCols.zipWithIndex.map { case (a, i) =>
      a.exprId -> probeKeyIdx(a).map(keyName).getOrElse(s"${FreshPrefix}p$i")
    }.toMap
    val vTsName = s"${FreshPrefix}vts"
    val versionPayload = neededVersion.filter(v =>
      v.exprId != shape.vTs.exprId && versionKeyIdx(v).isEmpty)
      .foldLeft(Vector.empty[Attribute])((acc, v) =>
        if (acc.exists(_.exprId == v.exprId)) acc else acc :+ v)
    val versionName: Map[ExprId, String] =
      (versionPayload.zipWithIndex.map { case (v, i) => v.exprId -> s"${FreshPrefix}v$i" } :+
        (shape.vTs.exprId -> vTsName)).toMap

    // --- the two renamed halves; probe deduplicated (the naive pattern's
    // groups are distinct probe tuples)
    val probeProj = Project(
      shape.keys.zipWithIndex.map { case ((pk, _), i) => Alias(pk, keyName(i))() } ++
        distinctProbeCols.filter(a => probeKeyIdx(a).isEmpty)
          .map(a => Alias(a, probeName(a.exprId))()),
      probe)
    val versionProj = Project(
      shape.keys.zipWithIndex.map { case ((_, vk), i) => Alias(vk, keyName(i))() } ++
        Seq(Alias(shape.vTs, vTsName)()) ++
        versionPayload.map(v => Alias(v, versionName(v.exprId))()),
      version)

    // group-on-everything Aggregate rather than dropDuplicates: the rule
    // runs after ReplaceDeduplicateWithAggregate, so an injected
    // Deduplicate node would reach the planner unreplaced
    val distinctProbe = Aggregate(probeProj.output, probeProj.output, probeProj, None)
    val probeDf   = GraftSqlShim.ofRows(session, distinctProbe)
    val versionDf = GraftSqlShim.ofRows(session, versionProj)

    val asofDf = AsOfJoin.asof(
      probeDf, versionDf,
      keys = keyName,
      leftTs = probeName(shape.pTs.exprId),
      rightTs = vTsName,
      forward = shape.forward,
      strict = shape.strict,
      tolerance = shape.tolerance,
      joinType = if (shape.leftOuter) "left" else "inner",
      tiebreak = Nil)

    val asofPlan = asofDf.queryExecution.analyzed
    val byName   = asofPlan.output.map(a => a.name -> a).toMap

    val mapped: Map[ExprId, Expression] =
      probeCols.map(a => a.exprId -> (byName(probeName(a.exprId)): Expression)).toMap ++
        neededVersion.map { v =>
          val out: Expression = versionKeyIdx(v) match {
            case Some(i) =>
              val probeKey = byName(probeName(shape.keys(i)._1.exprId))
              if (shape.leftOuter) // null on unmatched rows, like the naive plan
                If(IsNotNull(byName(vTsName)), probeKey, Literal.create(null, probeKey.dataType))
              else probeKey // equal on every (matched) row
            case None => byName(versionName(v.exprId))
          }
          v.exprId -> out
        }.toMap
    Some((mapped, asofPlan))
  }
}

object AsOfRewriteRule {
  /** Tri-state switch ([[PlanStats.mode]]): `auto` (default) fires past
    * the density break-even, `true`/`force` on every match, `false`/`off`
    * never. */
  val ConfKey = "spark.graft.asof.rewrite"

  /** Idempotently attach the rule to a live session through
    * `experimental.extraOptimizations` — for callers that cannot know
    * whether the session was BUILT with [[graft.GraftExtensions]] (the
    * extension list is fixed at session creation). Registering both ways
    * is harmless: the second instance finds no pattern left to rewrite. */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[AsOfRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new AsOfRewriteRule(spark)
  }

  /** Prefix for the rewrite's internal column names — distinct from the
    * operator-internal `__` family (which [[AsOfJoin]] rejects on caller
    * frames) and vanishingly unlikely in user schemas. */
  val FreshPrefix = "gasof_"
}
