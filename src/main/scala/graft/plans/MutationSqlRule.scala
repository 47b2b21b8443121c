package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.LongType

import graft.sources.Layout

/** SQL surface for the file-grain mutation verbs — a real user's first
  * spelling of a delete is `DELETE FROM`, not a Scala call:
  *
  * {{{
  *   DELETE FROM parquet.`/warehouse/events`
  *   WHERE user_id BETWEEN 3 AND 6 AND ts_us BETWEEN 10 AND 20
  *
  *   UPDATE parquet.`/warehouse/events`
  *   SET value = value * 2 WHERE user_id BETWEEN 3 AND 6
  *
  *   MERGE INTO parquet.`/warehouse/events` AS t
  *   USING updates AS s ON t.event_id = s.event_id
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark parses these natively ([[DeleteFromTable]] / [[MergeIntoTable]])
  * but supports them only on v2 tables; this resolution rule (injected by
  * [[graft.GraftExtensions]]) intercepts the analyzed shapes over a
  * path-based parquet relation and lowers them onto
  * [[Layout.deleteWhere]] / [[Layout.upsert]] — same classification over
  * the envelope index, same retire-then-promote commit, same manifest.
  * Each returns the [[Layout.MutationStats]] triple as its result row.
  *
  * DECLINES LOUDLY (never silently narrows semantics):
  *   - a DELETE or UPDATE predicate that is not a conjunction of closed
  *     per-column ranges (`c BETWEEN lo AND hi`, `c >= lo AND c <= hi`,
  *     `c = v`) — the box the index can classify files against;
  *   - an UNCONDITIONAL UPDATE (a whole-table rewrite must be spelled
  *     explicitly), or an assignment that is nondeterministic or carries
  *     a subquery;
  *   - a MERGE outside the keyed shapes: the ON condition must be a
  *     conjunction of `t.k = s.k` equalities on distinct same-named
  *     columns; matched arms `WHEN MATCHED [AND <cond>] THEN
  *     UPDATE SET * | UPDATE SET c = <expr>, … | DELETE` (several,
  *     FIRST-MATCH-WINS; an unconditional arm only last; assignments
  *     may reference both sides but never a key column); at
  *     most ONE not-matched arm,
  *     `WHEN NOT MATCHED [AND <cond>] THEN INSERT *` (its condition
  *     over SOURCE columns only — an unmatched row has no target
  *     side); `WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
  *     UPDATE SET c = <expr>, … | DELETE` arms (target columns only;
  *     NOTE these make every file a candidate — a full-table rewrite,
  *     the clause's honest cost). Conditions must be deterministic and
  *     subquery-free. The
  *     unconditional update-star + insert-star pair lowers onto the
  *     one-pass [[Layout.upsertKeyed]]; every other accepted shape
  *     onto [[Layout.merge]].
  * Everything else is left for Spark to reject with its own v2-only
  * error, so non-graft tables keep their stock behavior. */
class MutationSqlRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import MutationSqlRule._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(rel, cond) if rel.resolved && cond.resolved =>
      parquetDir(rel) match {
        case Some(dir) =>
          GraftDeleteCommand(dir, boxOf(cond, rel, dir))
        case None => plan
      }
    case UpdateTable(rel, assignments, condOpt)
        if rel.resolved && condOpt.forall(_.resolved) &&
           assignments.forall(_.resolved) =>
      parquetDir(rel) match {
        case Some(dir) =>
          def decline(what: String): Nothing = throw new UnsupportedOperationException(
            s"graft UPDATE $dir: $what. Spell the predicate as per-column closed " +
              "ranges and assign plain deterministic expressions over the table's " +
              "columns, or use the Scala updateWhere/rewrite path.")
          val cond = condOpt.getOrElse(decline(
            "unconditional UPDATE rewrites the whole table - state the WHERE range explicitly"))
          val set = assignments.map {
            case Assignment(t: AttributeReference, v)
                if v.deterministic && !v.exists(_.isInstanceOf[PlanExpression[_]]) =>
              // re-anchor the value expression by NAME: the verb re-reads
              // the snapshot with fresh exprIds, so ids cannot survive
              t.name -> v.transform {
                case a: AttributeReference =>
                  org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
              }
            case other => decline(s"unsupported assignment ${other.sql}")
          }
          GraftUpdateCommand(dir, boxOf(cond, rel, dir), set)
        case None => plan
      }
    // gate on cond.resolved too: the rule runs every resolution
    // iteration, and declining while the ON condition is still
    // unresolved would throw on perfectly good SQL
    case m @ MergeIntoTable(target, source, cond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution)
        if target.resolved && source.resolved && cond.resolved &&
           (matched ++ notMatched ++ notMatchedBySource).forall(actionReady) =>
      parquetDir(target) match {
        case Some(dir) =>
          def decline(what: String): Nothing = throw new UnsupportedOperationException(
            s"graft MERGE INTO $dir: unsupported shape - supported are a key-equality " +
              "ON condition (a conjunction of t.k = s.k on distinct columns), at most " +
              "one WHEN MATCHED [AND <cond>] THEN UPDATE SET * | DELETE, and at most " +
              s"one unconditional WHEN NOT MATCHED THEN INSERT *; got $what")
          // WITH SCHEMA EVOLUTION: source columns absent from the target
          // (case-insensitive) become NULLABLE metadata-commit additions
          // ([[Layout.addColumnsIfAbsent]]) before the merge runs; a
          // same-named column with a DIFFERENT type declines — evolution
          // is additive only, never a re-type
          val evolveCols: Seq[(String, String)] =
            if (!withSchemaEvolution) Nil
            else {
              val tgtByName = target.output.map(a => a.name.toLowerCase -> a).toMap
              source.output.foreach { a =>
                tgtByName.get(a.name.toLowerCase).foreach { t =>
                  if (t.dataType != a.dataType)
                    decline(s"WITH SCHEMA EVOLUTION cannot change column ${t.name} " +
                      s"from ${t.dataType.sql} to ${a.dataType.sql} - evolution is " +
                      "additive only (new nullable columns)")
                }
              }
              source.output.filterNot(a => tgtByName.contains(a.name.toLowerCase))
                .map(a => a.name -> a.dataType.json)
            }
          val keys = keysOf(cond, target, source).getOrElse(decline(
            s"ON condition ${cond.sql} (need a conjunction of t.k = s.k equalities " +
              "on distinct, same-named columns)"))
          def gateCond(c: Expression, what: String): Unit =
            if (!c.deterministic || c.exists(_.isInstanceOf[PlanExpression[_]]))
              decline(s"non-deterministic or subquery $what condition ${c.sql}")
          // (present, condition) of the single not-matched insert arm
          val (insert, insertCond) = notMatched match {
            case Nil => (false, None)
            case Seq(InsertStarAction(c)) => (true, c)
            case Seq(InsertAction(c, assignments))
                if assignmentsAreStar(assignments, target, source) => (true, c)
            case acts => decline(s"not-matched actions ${acts.mkString(", ")}")
          }
          insertCond.foreach { c =>
            gateCond(c, "not-matched")
            // an unmatched row HAS no target side — the condition must
            // be over source columns alone
            if (c.references.exists(target.outputSet.contains))
              decline(s"not-matched condition ${c.sql} references target columns")
          }
          def reCond(c: Option[Expression]): Option[Reanchored] = c.map { e =>
            gateCond(e, "matched")
            Reanchored(reanchorMatchedCond(e, target, source, keys))
          }
          // the matched arms, in clause order (first-match-wins)
          val arms: Seq[MergeArm] = matched.map {
            case UpdateStarAction(c) => ArmUpdateAll(reCond(c))
            case UpdateAction(c, assignments, _)
                if assignmentsAreStar(assignments, target, source) =>
              ArmUpdateAll(reCond(c))
            case UpdateAction(c, assignments, _) =>
              val keySet = keys.toSet
              val set = assignments.map {
                case Assignment(t: AttributeReference, _) if keySet.contains(t.name) =>
                  decline(s"assignment to key column ${t.name} (re-keying a keyed " +
                    "rewrite has no sound classification)")
                case Assignment(t: AttributeReference, v)
                    if target.outputSet.contains(t) && v.deterministic &&
                       !v.exists(_.isInstanceOf[PlanExpression[_]]) =>
                  t.name -> Reanchored(reanchorMatchedCond(v, target, source, keys))
                case other => decline(s"unsupported assignment ${other.sql}")
              }
              ArmUpdateSet(set, reCond(c))
            case DeleteAction(c) => ArmDelete(reCond(c))
            case other => decline(s"matched action $other")
          }
          // NOT MATCHED BY SOURCE arms act on target rows alone — their
          // conditions and assignments must not reference the source
          def targetOnly(e: Expression, what: String): Expression = {
            if (e.references.exists(source.outputSet.contains))
              decline(s"$what ${e.sql} references source columns - a NOT MATCHED " +
                "BY SOURCE row has no source side")
            gateCond(e, "not-matched-by-source")
            reanchorMatchedCond(e, target, source, keys)
          }
          val bySrcArms: Seq[MergeArm] = notMatchedBySource.map {
            case DeleteAction(c) =>
              ArmDelete(c.map(e => Reanchored(targetOnly(e, "condition"))))
            case UpdateAction(c, assignments, _) =>
              val keySet = keys.toSet
              val set = assignments.map {
                case Assignment(t: AttributeReference, _) if keySet.contains(t.name) =>
                  decline(s"assignment to key column ${t.name}")
                case Assignment(t: AttributeReference, v)
                    if target.outputSet.contains(t) =>
                  t.name -> Reanchored(targetOnly(v, "assignment"))
                case other => decline(s"unsupported assignment ${other.sql}")
              }
              ArmUpdateSet(set, c.map(e => Reanchored(targetOnly(e, "condition"))))
            case other => decline(s"not-matched-by-source action $other")
          }
          if (arms.isEmpty && !insert && bySrcArms.isEmpty) decline("no actionable clauses")
          def checkReachable(as: Seq[MergeArm], what: String): Unit =
            as.zipWithIndex.foreach { case (a, i) =>
              val uncond = a match {
                case ArmUpdateAll(None) | ArmDelete(None) => true
                case ArmUpdateSet(_, None)                => true
                case _                                    => false
              }
              if (uncond && i != as.size - 1)
                decline(s"$what arm ${i + 1} of ${as.size} is unconditional - " +
                  "later arms are unreachable")
            }
          checkReachable(arms, "matched")
          checkReachable(bySrcArms, "not-matched-by-source")
          // re-anchor by NAME: source columns keep their plain names on
          // the source frame the verb filters
          val insCondRe = insertCond.map(c => Reanchored(c.transform {
            case a: AttributeReference =>
              org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
          }))
          arms match {
            case Seq(ArmUpdateAll(None))
                if insert && insCondRe.isEmpty && bySrcArms.isEmpty =>
              // the exact upsert shape — the one-pass verb, no
              // source join in the rewrite
              GraftMergeCommand(dir, source, keys, evolveCols)
            case as =>
              GraftMergeGeneralCommand(dir, source, keys, as, insert, insCondRe,
                bySrcArms, evolveCols)
          }
        case None => m
      }
    // INSERT INTO a MANIFEST-maintained table lowers onto Layout.append
    // (manifest-committed, index refreshed, snapshot-visible) — stock
    // Spark would write files straight past the manifest, leaving them
    // invisible to snapshot readers and loudly rejected by the next
    // mutation's stray guard. Gated on the ManifestFileIndex read shape
    // (a GraftCatalog name or graft_read_snapshot target): plain
    // ``parquet.`dir` `` inserts keep their stock behavior untouched.
    case InsertIntoStatement(rel, partitionSpec, userCols, query,
        overwrite, _, byName) if rel.resolved && query.resolved =>
      manifestDir(rel) match {
        case Some(dir) =>
          def decline(what: String): Nothing = throw new UnsupportedOperationException(
            s"graft INSERT INTO $dir: $what. Use plain INSERT INTO (all columns, " +
              "no static partition spec) - it appends through the manifest " +
              "(Layout.append) - or the Scala Layout verbs for anything else.")
          if (overwrite)
            decline("INSERT OVERWRITE is not supported on a manifest-maintained " +
              "table (an empty table is not representable; rewrite via the " +
              "mutation verbs or clusterPartitions instead)")
          if (partitionSpec.exists(_._2.nonEmpty))
            decline("static PARTITION specs are not supported - partition values " +
              "come from the rows (the append is hive-partitioned automatically)")
          if (userCols.nonEmpty)
            decline("a column list is not supported - append needs every table " +
              "column (old files cannot be rewritten to default-fill the rest)")
          val colOrder = rel.output.map(_.name)
          if (!byName && query.output.size != colOrder.size)
            decline(s"the query produces ${query.output.size} columns, the table " +
              s"has ${colOrder.size}")
          GraftAppendCommand(dir, query, if (byName) Nil else colOrder)
        case None => plan
      }
    case _ => plan
  }

  /** A merge action we can JUDGE: star actions are shape-complete as
    * parsed; assignment actions must have resolved references. */
  private def actionReady(a: MergeAction): Boolean = a match {
    case _: UpdateStarAction | _: InsertStarAction => true
    case other => other.resolved
  }

  /** The single root dir when `plan` is a path-based single-root parquet
    * relation (possibly under a SubqueryAlias); None otherwise. Also
    * sees through the engine's OWN deletion-vector read shape — the
    * probe Filter ([[graft.sources.DvDeleted]]) plus the analyzer's
    * metadata-restoring Project — which is what a [[graft.GraftCatalog]]
    * name resolves to on a DV-carrying table: the verbs re-derive DV
    * semantics from the dir, so extracting it through the filter is
    * sound. Arbitrary user Projects/Filters (views with real
    * projections) still decline. */
  private def parquetDir(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => parquetDir(child)
    case f: Filter
        if f.condition.exists(_.isInstanceOf[graft.sources.DvDeleted]) =>
      parquetDir(f.child)
    case p: Project
        if p.projectList.forall(_.isInstanceOf[AttributeReference]) &&
           (p.child match {
             case f: Filter =>
               f.condition.exists(_.isInstanceOf[graft.sources.DvDeleted])
             case _ => false
           }) =>
      parquetDir(p.child)
    // the SPLIT deletion-vector read (round 18): clean files plain UNION
    // DV'd files probed — every branch (modulo the analyzer's alignment
    // Projects) must resolve to the SAME dir and the probe must be
    // present somewhere (arbitrary user unions never qualify; DELETE
    // FROM a real union is not valid SQL anyway)
    case u: Union
        if u.exists {
          case f: Filter => f.condition.exists(_.isInstanceOf[graft.sources.DvDeleted])
          case _ => false
        } =>
      def branch(p: LogicalPlan): Option[String] = p match {
        case SubqueryAlias(_, c) => branch(c)
        case pr: Project
            if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
          branch(pr.child)
        case f: Filter
            if f.condition.exists(_.isInstanceOf[graft.sources.DvDeleted]) =>
          branch(f.child)
        case r: LogicalRelation => relationDir(r)
        case _ => None
      }
      val dirs = u.children.map(branch)
      if (dirs.forall(_.isDefined) && dirs.flatten.distinct.size == 1) dirs.head
      else None
    case r: LogicalRelation => relationDir(r)
    case _ => None
  }

  private def relationDir(r: LogicalRelation): Option[String] = r.relation match {
    case h: HadoopFsRelation
        if h.fileFormat.isInstanceOf[ParquetFileFormat] &&
           h.location.rootPaths.size == 1 && h.bucketSpec.isEmpty =>
      Some(h.location.rootPaths.head.toString)
    case _ => None
  }

  /** Like [[parquetDir]], but ONLY for the engine's own
    * manifest-snapshot read shape ([[ManifestFileIndex]] at the root) —
    * the gate for intercepting statements Spark otherwise handles
    * itself (INSERT), where a plain path-based parquet relation must
    * keep its stock behavior. */
  private def manifestDir(plan: LogicalPlan): Option[String] = {
    def manifestRooted(fi: org.apache.spark.sql.execution.datasources.FileIndex): Boolean =
      fi match {
        case _: ManifestFileIndex => true
        case s: SkippingFileIndex => manifestRooted(s.base)
        case _ => false
      }
    def rooted(p: LogicalPlan): Boolean = p match {
      case SubqueryAlias(_, child) => rooted(child)
      case f: Filter => rooted(f.child)
      case pr: Project => rooted(pr.child)
      case u: Union => u.children.forall(rooted)
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation => manifestRooted(h.location)
        case _ => false
      }
      case _ => false
    }
    if (rooted(plan)) parquetDir(plan) else None
  }

  /** Translate a DELETE predicate into the verbs' box form — a closed
    * range per column — failing loudly on anything else. */
  private def boxOf(cond: Expression, rel: LogicalPlan,
                    dir: String): Seq[(String, Any, Any)] = {
    def decline(what: String): Nothing = throw new UnsupportedOperationException(
      s"graft DELETE FROM $dir: predicate not expressible as per-column closed " +
        s"ranges (c BETWEEN lo AND hi / c >= lo AND c <= hi / c = v): $what. " +
        "Rewrite the predicate as ranges, or use the Scala deleteWhere/rewrite path.")
    def catalystLit(e: Expression): (Any, org.apache.spark.sql.types.DataType) = e match {
      case f if f.foldable && f.deterministic =>
        val v = f.eval()
        if (v == null) decline(s"NULL bound in ${e.sql}")
        (v, f.dataType)
      case other => decline(s"non-literal bound ${other.sql}")
    }
    def attrName(e: Expression): String = e match {
      case a: AttributeReference => a.name
      case other => decline(s"bound side ${other.sql} is not a plain column " +
        "(implicit casts on the column decline: the index proof runs on the raw column)")
    }
    // INTERSECT bounds per column — a column may appear in several
    // conjuncts (`a = 5 AND a BETWEEN 1 AND 10`), and a last-wins
    // overwrite would silently WIDEN the box past the predicate
    // (order-dependent data loss). lo = max of lower bounds, hi = min of
    // upper bounds, compared with the bound type's own Catalyst ordering;
    // post-analysis every bound on one column carries the column's type,
    // so a type mismatch here means an unexpected shape — decline loudly.
    var lo = Map.empty[String, (Any, org.apache.spark.sql.types.DataType)]
    var hi = Map.empty[String, (Any, org.apache.spark.sql.types.DataType)]
    // numeric view for CROSS-TYPE bound comparison: the rule fires during
    // resolution, where one conjunct's literal may already be coerced to
    // the column's type (BIGINT) while another's is still its parsed type
    // (INT) — BigDecimal compares them exactly (every integral and
    // decimal value round-trips; finite float/double too)
    def num(v: Any, dt: org.apache.spark.sql.types.DataType): Option[java.math.BigDecimal] = {
      import org.apache.spark.sql.types._
      dt match {
        case ByteType    => Some(java.math.BigDecimal.valueOf(v.asInstanceOf[Byte].toLong))
        case ShortType   => Some(java.math.BigDecimal.valueOf(v.asInstanceOf[Short].toLong))
        case IntegerType => Some(java.math.BigDecimal.valueOf(v.asInstanceOf[Int].toLong))
        case LongType    => Some(java.math.BigDecimal.valueOf(v.asInstanceOf[Long]))
        case FloatType if java.lang.Float.isFinite(v.asInstanceOf[Float]) =>
          Some(new java.math.BigDecimal(v.asInstanceOf[Float].toDouble))
        case DoubleType if java.lang.Double.isFinite(v.asInstanceOf[Double]) =>
          Some(new java.math.BigDecimal(v.asInstanceOf[Double]))
        case _: DecimalType => Some(v.asInstanceOf[Decimal].toJavaBigDecimal)
        case _ => None
      }
    }
    def tighten(m: Map[String, (Any, org.apache.spark.sql.types.DataType)],
                c: String, v: (Any, org.apache.spark.sql.types.DataType),
                takeMax: Boolean) = m.get(c) match {
      case None => m + (c -> v)
      case Some((pv, pdt)) =>
        val keepPrev: Boolean =
          if (pdt == v._2) {
            val ord = org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(pdt)
            val cmp = ord.compare(pv, v._1)
            if (takeMax) cmp >= 0 else cmp <= 0
          } else (num(pv, pdt), num(v._1, v._2)) match {
            case (Some(a), Some(b)) =>
              val cmp = a.compareTo(b)
              if (takeMax) cmp >= 0 else cmp <= 0
            case _ =>
              decline(s"$c is bounded at two incomparable types (${pdt.sql} vs ${v._2.sql})")
          }
        if (keepPrev) m else m + (c -> v)
    }
    splitConjunctivePredicates(cond).foreach {
      // BETWEEN parses to the RuntimeReplaceable Between node
      case b: Between =>
        lo = tighten(lo, attrName(b.input), catalystLit(b.lower), takeMax = true)
        hi = tighten(hi, attrName(b.input), catalystLit(b.upper), takeMax = false)
      case GreaterThanOrEqual(a: AttributeReference, v) =>
        lo = tighten(lo, attrName(a), catalystLit(v), takeMax = true)
      case LessThanOrEqual(a: AttributeReference, v) =>
        hi = tighten(hi, attrName(a), catalystLit(v), takeMax = false)
      case GreaterThanOrEqual(v, a: AttributeReference) if v.foldable =>
        hi = tighten(hi, attrName(a), catalystLit(v), takeMax = false)
      case LessThanOrEqual(v, a: AttributeReference) if v.foldable =>
        lo = tighten(lo, attrName(a), catalystLit(v), takeMax = true)
      case EqualTo(a: AttributeReference, v) if v.foldable =>
        val x = catalystLit(v)
        lo = tighten(lo, attrName(a), x, takeMax = true)
        hi = tighten(hi, attrName(a), x, takeMax = false)
      case EqualTo(v, a: AttributeReference) if v.foldable =>
        val x = catalystLit(v)
        lo = tighten(lo, attrName(a), x, takeMax = true)
        hi = tighten(hi, attrName(a), x, takeMax = false)
      case other => decline(other.sql)
    }
    val cols = (lo.keySet ++ hi.keySet).toSeq.sorted
    if (cols.isEmpty) decline("empty predicate")
    cols.map { c =>
      def toScala(v: (Any, org.apache.spark.sql.types.DataType)): Any =
        CatalystTypeConverters.convertToScala(v._1, v._2)
      (c,
        toScala(lo.getOrElse(c, decline(s"$c has an upper bound but no lower bound"))),
        toScala(hi.getOrElse(c, decline(s"$c has a lower bound but no upper bound"))))
    }
  }

  /** `WHEN MATCHED THEN UPDATE SET *`, unconditional — star-form, or the
    * resolved assignment form where every target column is assigned its
    * same-named source column. */
  private def isUpdateStar(actions: Seq[MergeAction], target: LogicalPlan,
                           source: LogicalPlan): Boolean = actions match {
    case Seq(UpdateStarAction(None)) => true
    case Seq(UpdateAction(None, assignments, _)) =>
      assignmentsAreStar(assignments, target, source)
    case _ => false
  }

  private def isInsertStar(actions: Seq[MergeAction], target: LogicalPlan,
                           source: LogicalPlan): Boolean = actions match {
    case Seq(InsertStarAction(None)) => true
    case Seq(InsertAction(None, assignments)) =>
      assignmentsAreStar(assignments, target, source)
    case _ => false
  }

  private def assignmentsAreStar(assignments: Seq[Assignment], target: LogicalPlan,
                                 source: LogicalPlan): Boolean = {
    val srcByName = source.output.map(a => a.name -> a.exprId).toMap
    assignments.nonEmpty && assignments.forall {
      case Assignment(t: AttributeReference, s: AttributeReference) =>
        srcByName.get(t.name).contains(s.exprId)
      case _ => false
    } && assignments.size == target.output.size
  }

  /** The merge key columns when `cond` is a conjunction of `t.k = s.k`
    * equalities on distinct same-named columns (either operand order). */
  private def keysOf(cond: Expression, target: LogicalPlan,
                     source: LogicalPlan): Option[Seq[String]] = {
    val tIds = target.outputSet
    val sIds = source.outputSet
    val parts = splitConjunctivePredicates(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tIds.contains(a) && sIds.contains(b) && a.name == b.name => Some(a.name)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tIds.contains(b) && sIds.contains(a) && a.name == b.name => Some(b.name)
      case _ => None
    }
    val names = parts.flatten
    if (parts.exists(_.isEmpty) || names.isEmpty || names.distinct.size != names.size) None
    else Some(names)
  }

  /** Re-anchor a matched-arm condition by NAME onto [[Layout.merge]]'s
    * joined matched-pair frame: target columns keep their names, source
    * NON-KEY columns go through the documented `_src_` prefix (key
    * columns are equal on both sides, so the plain name serves both).
    * RuntimeReplaceable nodes (BETWEEN and friends) are stripped to
    * their replacement FIRST: a transformed wrapper whose lazy
    * replacement mixes re-anchored and original attributes fails
    * re-analysis with an unresolved-object internal error. */
  private def reanchorMatchedCond(c: Expression, target: LogicalPlan,
                                  source: LogicalPlan, keys: Seq[String]): Expression = {
    val tIds = target.outputSet
    val sIds = source.outputSet
    val keySet = keys.toSet
    def unreplace(e: Expression): Expression = e match {
      case r: RuntimeReplaceable => unreplace(r.replacement)
      // BETWEEN's replacement is a With common-subexpression node whose
      // refs re-analysis cannot resolve once the def's attribute is
      // re-anchored — inline each ref with its definition's child
      case w: With =>
        val byId = w.defs.map(d => d.id -> unreplace(d.child)).toMap
        unreplace(w.child).transform {
          // a ref bound by an ENCLOSING With scope is absent from this
          // With's map — leave it for the outer scope's pass (nested
          // common-subexpression definitions must not throw here)
          case ref: CommonExpressionRef => byId.getOrElse(ref.id, ref)
        }
      case other => other.mapChildren(unreplace)
    }
    unreplace(c).transform {
      case a: AttributeReference if tIds.contains(a) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
      case a: AttributeReference if sIds.contains(a) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(
          if (keySet.contains(a.name)) a.name else "_src_" + a.name)
    }
  }
}

object MutationSqlRule {

  private val StatsOutput = Seq(
    AttributeReference("dropped_files", LongType, nullable = false)(),
    AttributeReference("rewritten_files", LongType, nullable = false)(),
    AttributeReference("untouched_files", LongType, nullable = false)(),
    AttributeReference("dv_files", LongType, nullable = false)())

  /** Session conf picking DELETE's physical strategy: `copy` (default,
    * rewrite candidate files) or `dv` (merge-on-read deletion vectors —
    * candidates stay byte-untouched, positions go to a sidecar). Read at
    * RUN time, so `SET spark.graft.delete.mode=dv` flips the next
    * `DELETE FROM` without re-planning. */
  val DeleteModeConf = "spark.graft.delete.mode"

  /** Same toggle for `MERGE INTO` — BOTH the exact-upsert shape
    * (unconditional `UPDATE SET *` + `INSERT *`) and the general arm
    * matrix (conditional/partial-SET/DELETE/by-source arms): `dv` marks
    * every arm-fired row's position in the sidecar and appends update
    * images + inserts as new files instead of rewriting candidate
    * files — the CDC-apply trickle MERGE economics. */
  val MergeModeConf = "spark.graft.merge.mode"

  /** Same toggle for `UPDATE … WHERE`: `dv` marks the matched rows'
    * positions and appends their updated versions. */
  val UpdateModeConf = "spark.graft.update.mode"

  /** Opaque holder keeping a NAME-anchored (deliberately unresolved)
    * expression out of a command's `expressions` traversal: the
    * analyzer's CheckAnalysis would otherwise reject attributes that
    * only resolve against the verb's own frames at run time. (The
    * matched arm's tuple and GraftUpdateCommand's `(name, expr)` pairs
    * are opaque the same way — tuples are not traversed.) */
  final case class Reanchored(e: Expression)

  /** The matched arm of a lowered MERGE, expressions held opaquely. */
  sealed trait MergeArm
  final case class ArmUpdateAll(cond: Option[Reanchored]) extends MergeArm
  final case class ArmUpdateSet(set: Seq[(String, Reanchored)],
                                cond: Option[Reanchored]) extends MergeArm
  final case class ArmDelete(cond: Option[Reanchored]) extends MergeArm

  /** `DELETE FROM parquet.`dir`` lowered onto [[Layout.deleteWhere]] —
    * runs at execution time (a lazily-built DataFrame does not mutate). */
  final case class GraftDeleteCommand(dir: String, box: Seq[(String, Any, Any)])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = StatsOutput
    override def run(sparkSession: SparkSession): Seq[Row] = {
      val mode = sparkSession.conf.get(DeleteModeConf, "copy")
      val s = Layout.deleteWhere(sparkSession, dir, box, mode)
      Seq(Row(s.droppedFiles, s.rewrittenFiles, s.untouchedFiles, s.dvFiles))
    }
  }

  /** Box-predicate `UPDATE` lowered onto [[Layout.updateWhere]] —
    * assignment values re-anchored by column name (see the rule). */
  final case class GraftUpdateCommand(dir: String, box: Seq[(String, Any, Any)],
                                      set: Seq[(String, Expression)])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = StatsOutput
    override def run(sparkSession: SparkSession): Seq[Row] = {
      val mode = sparkSession.conf.get(UpdateModeConf, "copy")
      val s = Layout.updateWhere(sparkSession, dir, box,
        set.map { case (n, e) => n -> org.apache.spark.sql.GraftBridge.column(e) },
        mode)
      Seq(Row(s.droppedFiles, s.rewrittenFiles, s.untouchedFiles, s.dvFiles))
    }
  }

  /** Widen `dir` by the evolution columns a `WITH SCHEMA EVOLUTION`
    * merge carries — (name, DataType json) pairs, added NULLABLE as a
    * pure metadata commit before the merge runs. */
  private def applyEvolution(spark: SparkSession, dir: String,
                             evolveCols: Seq[(String, String)]): Unit =
    if (evolveCols.nonEmpty) {
      Layout.addColumnsIfAbsent(spark, dir, evolveCols.map { case (n, j) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromJson(j), nullable = true)
      })
      ()
    }

  /** The exact-upsert `MERGE INTO` shape lowered onto
    * [[Layout.upsertKeyed]]. The source plan executes inside the verb
    * (update uniqueness checked there). */
  final case class GraftMergeCommand(dir: String, source: LogicalPlan, keys: Seq[String],
                                     evolveCols: Seq[(String, String)] = Nil)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = StatsOutput
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(sparkSession: SparkSession): Seq[Row] = {
      applyEvolution(sparkSession, dir, evolveCols)
      val updates = org.apache.spark.sql.GraftBridge.ofRows(sparkSession, source)
      val mode = sparkSession.conf.get(MergeModeConf, "copy")
      val s = Layout.upsertKeyed(sparkSession, dir, updates, keys, mode)
      Seq(Row(s.droppedFiles, s.rewrittenFiles, s.untouchedFiles, s.dvFiles))
    }
  }

  /** The general `MERGE INTO` shapes — conditional matched UPDATE SET *
    * / DELETE, optional unmatched INSERT * — lowered onto
    * [[Layout.merge]]. `matched` is (isUpdate, condition) with the
    * condition already re-anchored by name onto the matched-pair frame
    * (target names plain, source non-key names `_src_`-prefixed). */
  final case class GraftMergeGeneralCommand(dir: String, source: LogicalPlan,
      keys: Seq[String], matched: Seq[MergeArm],
      insertUnmatched: Boolean, insertCond: Option[Reanchored] = None,
      bySource: Seq[MergeArm] = Nil, evolveCols: Seq[(String, String)] = Nil)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = StatsOutput
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(sparkSession: SparkSession): Seq[Row] = {
      applyEvolution(sparkSession, dir, evolveCols)
      def colOf(h: Reanchored) = org.apache.spark.sql.GraftBridge.column(h.e)
      def armsOf(as: Seq[MergeArm]) = as.map {
        case ArmUpdateAll(c) => Layout.MatchedUpdateAll(c.map(colOf))
        case ArmUpdateSet(set, c) =>
          Layout.MatchedUpdateSet(set.map { case (n, h) => n -> colOf(h) }, c.map(colOf))
        case ArmDelete(c) => Layout.MatchedDelete(c.map(colOf))
      }
      val src = org.apache.spark.sql.GraftBridge.ofRows(sparkSession, source)
      val mode = sparkSession.conf.get(MergeModeConf, "copy")
      val s = Layout.merge(sparkSession, dir, src, keys, armsOf(matched),
        insertUnmatched, insertCond.map(colOf), armsOf(bySource), mode)
      Seq(Row(s.droppedFiles, s.rewrittenFiles, s.untouchedFiles, s.dvFiles))
    }
  }

  /** `INSERT INTO` a manifest-maintained table lowered onto
    * [[Layout.append]] — manifest-committed, envelope index refreshed,
    * snapshot-visible, the next mutation's stray guard satisfied.
    * `colOrder` non-empty = positional SQL semantics (the query's
    * columns are renamed to the table's, in relation-output order);
    * empty = BY NAME (append validates the names itself).
    *
    * Store assignment: query columns whose type differs from the
    * table's are CAST to the table's type under ANSI store-assignment
    * rules before the append — `INSERT INTO t VALUES (1, 2)` into
    * BIGINT columns writes longs, exactly as stock INSERT output
    * resolution would; a cast ANSI store assignment forbids (string →
    * int would be fine, struct mismatch would not) declines loudly
    * instead of writing parquet files whose physical types diverge
    * from the pinned manifest schema. */
  final case class GraftAppendCommand(dir: String, query: LogicalPlan,
                                      colOrder: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("manifest_seq", LongType, nullable = false)())
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(sparkSession: SparkSession): Seq[Row] = {
      val df = org.apache.spark.sql.GraftBridge.ofRows(sparkSession, query)
      val rows = if (colOrder.isEmpty) df else df.toDF(colOrder: _*)
      Seq(Row(Layout.append(sparkSession, dir,
        castToTableTypes(sparkSession, dir, rows))))
    }
  }

  /** ANSI store-assignment cast of `rows` onto the table's column types
    * (name-matched; names themselves are validated by
    * [[Layout.append]]). Identity when every dtype already matches. */
  private def castToTableTypes(spark: SparkSession, dir: String,
                               rows: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val info = graft.sources.Manifest.info(spark, dir)
    val target = (info.dataSchema.fields ++ info.partSchema.fields)
      .map(f => f.name -> f.dataType).toMap
    if (rows.schema.fields.forall(f => target.get(f.name).forall(_ == f.dataType)))
      return rows
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val cols = rows.schema.fields.map { f =>
      target.get(f.name) match {
        case Some(t) if t != f.dataType =>
          require(Cast.canANSIStoreAssign(f.dataType, t),
            s"INSERT INTO $dir: column ${f.name} has type ${f.dataType.sql} but the " +
              s"table pins ${t.sql}, and ANSI store assignment does not allow that " +
              "cast - cast the value explicitly or evolve the table schema first")
          org.apache.spark.sql.GraftBridge.column(Cast(
            org.apache.spark.sql.GraftBridge.expression(rows(s"`${f.name}`")),
            t, tz, EvalMode.ANSI)).as(f.name)
        case _ => rows(s"`${f.name}`")
      }
    }
    rows.select(cols.toSeq: _*)
  }

  // NOTE: no live-session `ensure` — analyzer resolution rules are fixed
  // at session construction; DELETE/MERGE SQL needs a session built with
  // `spark.sql.extensions=graft.GraftExtensions` (the documented setup).
}
