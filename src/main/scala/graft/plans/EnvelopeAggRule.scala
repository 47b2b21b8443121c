package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{abs, coalesce, col, greatest, lit, max, min, sum, udf, when}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType, StructType}

import graft.sources.Layout

/** Catalyst rule: answer `COUNT(*)` / `COUNT(c)` / `MIN(c)` / `MAX(c)`
  * over an `.envelopes`-indexed parquet table FROM THE INDEX — one row
  * per data file — instead of scanning the data (the Iceberg/Delta
  * "stats-only aggregate" optimization, over the same index the
  * [[EnvelopePruneRule]] consults for file skipping). At 100 TB the
  * difference is a metadata-scale job (a few MB of index) versus a
  * full-table scan; on a million-file table it is also the difference
  * between a driver-side listing-and-plan stall and an instant answer.
  *
  * == What fires ==
  * `Aggregate(groups, aggs, scan)` — `scan` a non-streaming, single-root
  * parquet relation, optionally through a chain of deterministic
  * renaming/pruning `Project`s and `Filter`s — when EVERY output is
  * derivable from per-file statistics:
  *   - `count(*)`/`count(lit)`  → `sum(rows)` over index rows
  *   - `count(c)`               → `sum(rows - nulls_c)` (needs `nulls_c`)
  *   - `min(c)` / `max(c)`      → `min(min_c)` / `max(max_c)`
  *   - `sum(c)`, integral c     → `sum(sum_c)` — per-file sums are
  *     PROVEN unwrapped by the soundness probe (extrema bounded by
  *     Long.Max/rows), so LEGACY re-sums are bit-identical (mod-2^64
  *     addition is associative over true partials) and ANSI re-sums
  *     overflow iff the total does; TRY declines (null-on-overflow is
  *     not reproducible from partials), as do float/double/decimal sums
  *     (order-dependent rounding / widened intermediate types)
  *   - grouping columns         → index columns PROVEN constant per file
  *     (`min_g <=> max_g` and no mixed-null file), so each file lies
  *     wholly in one group — the hive-partition-column case, without
  *     requiring hive partitioning
  *   - `WHERE` conjuncts        → every referenced column proven constant
  *     per file (as above), so each conjunct takes ONE value across a
  *     file's rows (true/false/null — the latter two both exclude) and
  *     whole-file include/exclude over the index IS the data filter —
  *     `count(*) WHERE dt BETWEEN …` on a date-partitioned table answers
  *     at metadata scale (the conjunct is evaluated by Spark over the
  *     index with column refs bound to the file's constant, so
  *     coercion/NaN/collation semantics are never re-implemented)
  * `DISTINCT`, filtered aggregates (`FILTER (WHERE …)`), any other
  * aggregate function, a filter or grouping column the index cannot
  * prove constant per file, nondeterministic or subquery predicates,
  * and computed projections, all decline — the plan is left untouched
  * and the data scan proceeds.
  *
  * == Exactness ==
  * Two gates make staleness impossible rather than unlikely:
  *   1. FILE-SET EQUALITY: the index's (deduplicated) file set must equal
  *      the relation's current `inputFiles` exactly — a file appended
  *      since the last index refresh, or an indexed file since rewritten
  *      away, fails the gate and the rule declines. (Supersets are NOT
  *      acceptable the way they are for pruning: an extra index row would
  *      inflate counts and widen min/max.)
  *   2. TYPE EQUALITY: each rewritten output's type and nullability must
  *      match the original aggregate's — a column whose type changed
  *      across a rewrite declines even before gate 1 catches it.
  * Replayed [[Layout.appendEnvelopes]] calls can leave duplicate index
  * rows per file (documented there as harmless for pruning); here they
  * would DOUBLE-COUNT, so the rewritten plan deduplicates per file first
  * (an inner `groupBy(file)` — duplicates carry identical envelopes).
  * Min/max are associative — Spark itself computes them as per-partition
  * partials then a merge — so the two-level compute (per-file envelope,
  * then across files) is literally the same computation as the direct
  * scan, including Spark's NaN and collation orderings (the envelopes
  * were written by Spark's own min/max over each file).
  *
  * == Cost model ==
  * The decision needs the index's schema and distinct file set — one
  * footer read and one metadata-scale job, cached per (session, dir,
  * index-listing signature) ALONG WITH the analyzed index scan plan
  * (so repeated optimizations re-read nothing, not even the footer) —
  * index refreshes invalidate by changing the signature; grouped or
  * filtered rewrites add one cached per-file-constancy probe per
  * (session, dir, sig, column). Unindexed tables pay one fs.exists.
  * The rewritten plan is a two-level aggregate over the index — a few
  * rows per data file, never the data. `spark.graft.envelope.agg=false`
  * disables.
  *
  * Self-re-match safety: the rewritten subtree is an aggregate over an
  * aggregate over the index relation — neither inner node matches the
  * rule's relation-or-projected-relation child shape, so the fixed-point
  * batch converges without a marker. */
class EnvelopeAggRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import EnvelopeAggRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate if !agg.isStreaming =>
        try rewrite(agg).getOrElse(agg)
        catch {
          case NonFatal(e) =>
            logWarning(s"graft envelope agg: failed, leaving the aggregate unrewritten: $e")
            agg
        }
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // ---- unwrap a Project/Filter chain down to a parquet relation:
    // Projects may only rename (alias-of-attribute) or drop columns;
    // Filter conjuncts are collected and must later prove evaluable
    // per-file (every referenced column index-proven constant within
    // every file, so the predicate is uniform across a file's rows —
    // whole-file include/exclude, decided over the index)
    var aliasEdge = Map.empty[ExprId, ExprId]
    val conjuncts = Seq.newBuilder[Expression]
    var sawDataFilter = false
    var dvBc: Broadcast[graft.sources.DvLookup] = null
    var rel: LogicalRelation = null
    var node = agg.child
    var depth = 0
    while (rel == null) {
      depth += 1
      if (depth > 8) return None
      node = node match {
        case r: LogicalRelation => rel = r; r
        case Project(projList, child) if projList.forall(_.deterministic) =>
          projList.foreach {
            case a @ Alias(ar: AttributeReference, _) => aliasEdge += a.exprId -> ar.exprId
            case _ => () // plain attrs pass through; computed columns
                         // simply fail name resolution if referenced
          }
          child
        case f: Filter if f.condition.deterministic &&
            !f.condition.exists(_.isInstanceOf[PlanExpression[_]]) =>
          // peel the deletion-vector read probe ([[Manifest.applyDv]]'s
          // single-scan shape) out of the conjunction — the optimizer
          // may have combined it with pushed-down data filters — and
          // record the broadcast sidecar: count(*) stays
          // index-answerable as physical rows minus the sidecar's
          // pending positions (gated below)
          splitConjunctivePredicates(f.condition).foreach {
            case Not(d: graft.sources.DvDeleted) =>
              if (dvBc != null && (dvBc ne d.lookup)) return None
              dvBc = d.lookup
            case other =>
              conjuncts += other
              sawDataFilter = true
          }
          f.child
        // applyDv's SPLIT shape: clean files scanned plain unioned with
        // DV'd files scanned through the probe — count(*)-only, handled
        // whole (a data filter above the union cannot bind names through
        // it, so that shape declines)
        case u: Union if !sawDataFilter => return rewriteDvUnionCount(agg, u)
        case _ => return None
      }
    }
    val relBase = rel.output.map(a => a.exprId -> a.name).toMap
    def baseName(id: ExprId): Option[String] = {
      var cur = id
      var hops = 0
      while (aliasEdge.contains(cur) && hops < 16) { cur = aliasEdge(cur); hops += 1 }
      relBase.get(cur)
    }
    val attrName = relBase // direct ids; aliases resolve via baseName
    val filters = conjuncts.result()
    val fsr = rel.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    if (rel.isStreaming || fsr.bucketSpec.isDefined) return None
    if (!fsr.fileFormat.isInstanceOf[ParquetFileFormat]) return None
    val roots = fsr.location.rootPaths
    if (roots.size != 1) return None
    val dir = roots.head.toString
    if (dir.endsWith(".envelopes")) return None // never answer an index from itself

    def colName(e: Expression): Option[String] = e match {
      case ar: AttributeReference => baseName(ar.exprId)
      case _ => None
    }

    // ---- grouping columns: plain attributes only
    val groupNames: Seq[String] = agg.groupingExpressions.map {
      case ar: AttributeReference => colName(ar).getOrElse(return None)
      case _ => return None
    }
    val groupSet = agg.groupingExpressions.collect {
      case ar: AttributeReference => ar.exprId
    }.toSet

    // ---- every output must be stats-derivable (or a literal passthrough)
    def nonNullLit(e: Expression): Boolean = e match {
      case l: Literal => l.value != null
      case _ => false
    }
    val rws: Seq[Rw] = agg.aggregateExpressions.map {
      case ar: AttributeReference if groupSet.contains(ar.exprId) =>
        RwGroup(colName(ar).getOrElse(return None))
      case a @ Alias(child, _) => child match {
        case ar: AttributeReference if groupSet.contains(ar.exprId) =>
          RwGroup(colName(ar).getOrElse(return None))
        case l: Literal => RwLit(a)
        case AggregateExpression(fn, _, false, None, _) => fn match {
          case Count(cs) if cs.isEmpty || cs.forall(nonNullLit) => RwCount
          case Count(Seq(e)) => RwCountCol(colName(e).getOrElse(return None))
          case Min(e) => RwMin(colName(e).getOrElse(return None))
          case Max(e) => RwMax(colName(e).getOrElse(return None))
          // LEGACY sums re-sum bit-identically (mod-2^64 addition is
          // associative); ANSI sums are safe because statsSound proves
          // per-file no-overflow (|value|·rows bounded) so the stored
          // partials are true sums — the outer ANSI sum then overflows
          // iff the total does. TRY declines: a null-on-overflow cannot
          // be reproduced from partials.
          case Sum(e, ctx) if ctx.evalMode != EvalMode.TRY =>
            RwSum(colName(e).getOrElse(return None))
          // integral avg = sum / non-null count, BOTH from the index —
          // exact only under avgExact's Σ|values| ≤ 2^52 probe (Spark
          // accumulates the avg sum in DOUBLE per row; when every
          // partial sum is an exactly-representable integer, row order
          // and file order compute the same double). Float/double/
          // decimal input declines (order-dependent rounding / widened
          // intermediates), as does TRY.
          case Average(e, em) if em != EvalMode.TRY &&
              (e.dataType == ByteType || e.dataType == ShortType ||
               e.dataType == IntegerType || e.dataType == LongType) =>
            RwAvg(colName(e).getOrElse(return None))
          case _ => return None
        }
        case _ => return None
      }
      case _ => return None
    }
    if (!rws.exists { case RwCount | _: RwCountCol | _: RwMin | _: RwMax |
                           _: RwSum | _: RwAvg => true
                      case _ => false }) return None // nothing to save

    // ---- deletion-vector gate: with a DV present only count(*) (plus
    // literals and grouping columns) stays index-answerable — visible
    // rows per file = physical rows − pending positions, both known at
    // metadata scale. EVERYTHING ELSE DECLINES: a deleted row can hold
    // the extremum (min/max), contribute to sum/avg, or carry the nulls
    // of count(c) — none reconstructible from the sidecar. Grouping and
    // per-file-constant filters stay sound because a file's rows —
    // deleted ones included — share the constant, so whole-file
    // include/exclude and group assignment carry the file's pending
    // count with it.
    if (dvBc != null && !rws.forall {
      case RwCount | _: RwGroup | _: RwLit => true
      case _ => false
    }) return None

    // ---- index gates: existence, coverage, exact file-set match
    val envDir = Layout.envelopesPath(dir)
    val envPath = new org.apache.hadoop.fs.Path(envDir)
    val fs = envPath.getFileSystem(session.sparkContext.hadoopConfiguration)
    if (!fs.exists(envPath)) return None
    val sig = fs.listStatus(envPath).filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",")
    val meta = indexMeta(session, dir, envDir, sig)
    val envType: Map[String, DataType] =
      meta.schema.fields.map(f => f.name -> f.dataType).toMap
    if (!envType.contains("rows")) return None

    // nulls_c required for EVERY role: the soundness probe below needs it
    // to tell a legitimately-null stat (all-null file) from a
    // mixed-generation index row missing the column entirely
    def indexed(c: String): Boolean =
      envType.contains(s"min_$c") && envType.contains(s"max_$c") &&
        envType.contains(s"nulls_$c")
    // a HIVE PARTITION column the index does not cover needs no envelope
    // at all: its per-file constant is IN THE PATH (the same k=v segment
    // partition discovery reads), so its min/max/nulls stats are
    // SYNTHESIZED from the index's file column below — constancy and
    // soundness hold by construction (a file lives in exactly one leaf)
    val partTypes: Map[String, DataType] =
      fsr.partitionSchema.fields.map(f => f.name -> f.dataType).toMap
    def synthesized(c: String): Boolean =
      partTypes.contains(c) && !indexed(c)
    def covered(c: String): Boolean = indexed(c) || synthesized(c)
    val ok = rws.forall {
      case RwCountCol(c) => covered(c)
      case RwMin(c)      => covered(c)
      case RwMax(c)      => covered(c)
      case RwGroup(c)    => covered(c)
      case RwSum(c)      => indexed(c) && envType.get(s"sum_$c").contains(LongType)
      case RwAvg(c)      => indexed(c) && envType.get(s"sum_$c").contains(LongType)
      case _             => true
    }
    if (!ok) return None
    if (groupNames.exists(g => !synthesized(g) &&
      !constantPerFile(session, dir, meta, sig, g))) return None

    // ---- filter conjuncts: every referenced column must be covered and
    // index-proven constant per file — then the conjunct takes the same
    // value on every row of a file (true / false / null, the latter two
    // both excluding under SQL filter semantics), so whole-file
    // include/exclude decided over the index is EXACTLY the data filter
    val filterCols: Seq[String] = {
      val b = Seq.newBuilder[String]
      filters.foreach(_.references.foreach { a =>
        baseName(a.exprId) match {
          case Some(n) => b += n
          case None => return None // computed / non-relation column
        }
      })
      b.result().distinct
    }
    if (filterCols.exists(c => !covered(c))) return None
    if (filterCols.exists(c => !synthesized(c) &&
      !constantPerFile(session, dir, meta, sig, c))) return None

    // If the EnvelopePruneRule already wrapped this relation (it may run
    // first in the shared fixed-point batch), gate against the BASE
    // listing: a rule-planted skip is I/O-only by that rule's soundness
    // contract (every skipped file fails the still-present Filter, which
    // this rewrite applies index-side in full), so the table's true file
    // set — what staleness must be checked against — is the base's. An
    // explicit prunedRead wrap is NOT seen through: there re-applying
    // the box is the caller's contract, not the plan's.
    val gateLocation = fsr.location match {
      case s: SkippingFileIndex if s.semanticsPreserving => s.base
      case l => l
    }
    val current = gateLocation.inputFiles.map(Layout.normPath).toSet
    if (meta.files != current) return None

    // DV soundness: the sidecar must speak THIS table (same root) and
    // name only files of the scanned snapshot — then every pending
    // position subtracts a physical row some index row counted, exactly
    // once (positions are distinct per file and < the file's row count
    // by construction on the mutation side)
    val dvPending: Map[String, Long] =
      if (dvBc == null) Map.empty
      else {
        val lk = dvBc.value
        if (Layout.normPath(dir) != lk.rootNorm) return None
        val m = lk.pendingByFile.map { case (rf, n) => (lk.rootNorm + "/" + rf) -> n }.toMap
        if (!m.keySet.subsetOf(current)) return None
        m
      }

    // ---- soundness probe: a mixed-generation index (rows appended with
    // fewer indexed columns — parquet reads the missing stats as NULL)
    // would silently drop those files' contributions; require every
    // relied-on stat non-null except where legitimately null (all-null
    // file: nulls_c == rows)
    val relyCols: Seq[String] =
      (rws.collect { case RwCountCol(c) => c; case RwMin(c) => c; case RwMax(c) => c
                     case RwGroup(c) => c; case RwSum(c) => c; case RwAvg(c) => c }
        ++ filterCols).distinct.filterNot(synthesized)
    val sumCols: Set[String] = rws.collect { case RwSum(c) => c; case RwAvg(c) => c }.toSet
    if (!statsSound(session, dir, meta, sig, relyCols, sumCols)) return None
    // avg-only exactness probe: Spark accumulates the avg sum per ROW in
    // DOUBLE; reproducing it from per-file integer partials is bit-exact
    // only when every intermediate sum is an exactly-representable
    // integer — guaranteed when Σ rows·max(|min|,|max|) ≤ 2^52 (bounds
    // every subset/prefix sum either side could form)
    val avgCols = rws.collect { case RwAvg(c) => c }.distinct
    if (avgCols.exists(c => !avgExact(session, dir, meta, sig, c))) return None

    // ---- build the replacement: dedup per file, then aggregate the stats
    val needed: Seq[String] = ("rows" +: (rws.flatMap {
      case RwCountCol(c) => Seq(s"nulls_$c")
      case RwMin(c)      => Seq(s"min_$c")
      case RwMax(c)      => Seq(s"max_$c")
      case RwGroup(c)    => Seq(s"min_$c")
      case RwSum(c)      => Seq(s"sum_$c")
      case RwAvg(c)      => Seq(s"sum_$c", s"nulls_$c")
      case _             => Nil
    } ++ filterCols.map(c => s"min_$c"))).distinct
    // synthesize the per-file stats of path-derived partition columns
    // (value parsed from the file's k=v segment, cast exactly as
    // partition discovery casts it — TRY, session timezone)
    val synthCols = ((rws.collect { case RwCountCol(c) => c; case RwMin(c) => c
                                    case RwMax(c) => c; case RwGroup(c) => c }
      ++ filterCols).distinct).filter(synthesized)
    val env = synthCols.foldLeft(
        GraftBridge.ofRows(session, meta.plan)) { (d, g) => // cached analyzed scan
      val raw = partSegUdf(col("file"), lit(g))
      val v = GraftBridge.column(Cast(GraftBridge.expression(raw), partTypes(g),
        Some(session.sessionState.conf.sessionLocalTimeZone), EvalMode.TRY))
      d.withColumn(s"min_$g", v).withColumn(s"max_$g", v)
        .withColumn(s"nulls_$g", when(v.isNull, col("rows")).otherwise(lit(0L)))
    }
    // duplicate rows for a file (replayed appendEnvelopes) carry identical
    // envelopes — min() collapses them to the single true value
    val perFileRaw = env.groupBy(col("file"))
      .agg(min(col(needed.head)).as(needed.head),
        needed.tail.map(c => min(col(c)).as(c)): _*)
    // pending deleted positions per file (0 for clean files) — the map
    // is metadata-scale (bounded by the sidecar capacity cap) and rides
    // the closure of a one-column UDF over the index frame
    val perFile =
      if (dvBc == null) perFileRaw
      else {
        val m = dvPending
        perFileRaw.withColumn("__dv_pending",
          udf((f: String) => m.getOrElse(f, 0L)).apply(col("file")))
      }
    // per-file-uniform filter, evaluated BY SPARK over the index rows
    // with each column reference bound to the file's constant (min_c)
    val kept =
      if (filters.isEmpty) perFile
      else perFile.filter(GraftBridge.column(filters.map(_.transform {
        case ar: AttributeReference =>
          GraftBridge.expression(perFile(s"min_${baseName(ar.exprId).get}"))
      }).reduce(And)))
    val groupCols = groupNames.map(g => col(s"min_$g"))
    val visibleRows: Column =
      if (dvBc == null) col("rows") else col("rows") - col("__dv_pending")
    val outCols: Seq[Column] = rws.collect {
      case RwCount       => coalesce(sum(visibleRows), lit(0L))
      case RwCountCol(c) => coalesce(sum(col("rows") - col(s"nulls_$c")), lit(0L))
      case RwMin(c)      => min(col(s"min_$c"))
      case RwMax(c)      => max(col(s"max_$c"))
      case RwSum(c)      => sum(col(s"sum_$c"))
      case RwAvg(c)      =>
        // Spark's Average: null when the non-null count is 0, else
        // sum/count in double — reproduced verbatim (exact under the
        // avgExact probe; the guard also keeps ANSI division happy)
        val cnt = sum(col("rows") - col(s"nulls_$c"))
        when(coalesce(cnt, lit(0L)) === 0L, lit(null).cast(DoubleType))
          .otherwise(sum(col(s"sum_$c")).cast(DoubleType) / cnt.cast(DoubleType))
    }
    val replaced =
      if (groupCols.isEmpty) kept.agg(outCols.head, outCols.tail: _*)
      else kept.groupBy(groupCols: _*).agg(outCols.head, outCols.tail: _*)
    val newPlan = replaced.queryExecution.analyzed
    val newOut = newPlan.output // groupCols (in order) ++ outCols (in order)

    // ---- re-alias to the original output ids; verify types & nullability
    var aggIdx = groupNames.size - 1
    val projList: Seq[NamedExpression] = agg.aggregateExpressions.zip(rws).map {
      case (_, RwLit(ne)) => ne
      case (orig, RwGroup(c)) =>
        val n = newOut(groupNames.indexOf(c))
        if (n.dataType != orig.dataType || (n.nullable && !orig.toAttribute.nullable))
          return None
        Alias(n, orig.name)(exprId = orig.exprId,
          qualifier = orig.toAttribute.qualifier)
      case (orig, _) =>
        aggIdx += 1
        val n = newOut(aggIdx)
        if (n.dataType != orig.dataType || (n.nullable && !orig.toAttribute.nullable))
          return None
        Alias(n, orig.name)(exprId = orig.exprId,
          qualifier = orig.toAttribute.qualifier)
    }
    logInfo(s"graft envelope agg: $dir aggregate answered from the .envelopes index " +
      s"(${meta.files.size} files, groups=${groupNames.mkString(",")})")
    Some(Project(projList, newPlan))
  }

  /** `count(*)` over [[graft.sources.Manifest.applyDv]]'s SPLIT plan —
    * `Union(clean files scanned plain, DV'd files scanned through the
    * probe filter)` — answered from the index: the two branches
    * PARTITION the snapshot's file set (each side a delegating skip
    * over the same listing), so visible rows = Σ physical rows over the
    * combined set − Σ pending sidecar positions. Count-only by
    * construction: grouping or data filters cannot bind names through
    * the Union here, and every non-count aggregate needs the deleted
    * rows' values. Gated exactly like the single-scan path: index
    * file-set equality over the COMBINED branches, sidecar root match,
    * sidecar files ⊆ scanned files. */
  private def rewriteDvUnionCount(agg: Aggregate, u: Union): Option[LogicalPlan] = {
    if (agg.groupingExpressions.nonEmpty) return None
    if (u.children.size != 2) return None
    def nonNullLit(e: Expression): Boolean = e match {
      case l: Literal => l.value != null
      case _ => false
    }
    val rws: Seq[Rw] = agg.aggregateExpressions.map {
      case a @ Alias(child, _) => child match {
        case l: Literal => RwLit(a)
        case AggregateExpression(Count(cs), _, false, None, _)
            if cs.isEmpty || cs.forall(nonNullLit) => RwCount
        case _ => return None
      }
      case _ => return None
    }
    if (!rws.contains(RwCount)) return None

    // each branch: deterministic Projects over (at most) one DV probe
    // filter over a parquet relation
    def branch(p0: LogicalPlan)
        : Option[(LogicalRelation, Option[Broadcast[graft.sources.DvLookup]])] = {
      var dv: Broadcast[graft.sources.DvLookup] = null
      var node = p0
      var depth = 0
      while (depth <= 8) {
        node match {
          case r: LogicalRelation => return Some((r, Option(dv)))
          case Project(pl, c) if pl.forall(_.deterministic) => node = c
          case Filter(Not(d: graft.sources.DvDeleted), c) if dv == null =>
            dv = d.lookup; node = c
          case _ => return None
        }
        depth += 1
      }
      None
    }
    val (relA, dvA) = branch(u.children.head).getOrElse(return None)
    val (relB, dvB) = branch(u.children(1)).getOrElse(return None)
    val dvBc = (dvA, dvB) match {
      case (Some(d), None) => d
      case (None, Some(d)) => d
      case _ => return None // both-or-neither probed is not the split shape
    }
    def fsrOf(r: LogicalRelation): Option[HadoopFsRelation] = r.relation match {
      case h: HadoopFsRelation if !r.isStreaming && h.bucketSpec.isEmpty &&
          h.fileFormat.isInstanceOf[ParquetFileFormat] &&
          h.location.rootPaths.size == 1 => Some(h)
      case _ => None
    }
    val fsrA = fsrOf(relA).getOrElse(return None)
    val fsrB = fsrOf(relB).getOrElse(return None)
    val dir = fsrA.location.rootPaths.head.toString
    if (Layout.normPath(fsrB.location.rootPaths.head.toString) != Layout.normPath(dir))
      return None
    if (dir.endsWith(".envelopes")) return None

    val envDir = Layout.envelopesPath(dir)
    val envPath = new org.apache.hadoop.fs.Path(envDir)
    val fs = envPath.getFileSystem(session.sparkContext.hadoopConfiguration)
    if (!fs.exists(envPath)) return None
    val sig = fs.listStatus(envPath).filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",")
    val meta = indexMeta(session, dir, envDir, sig)
    if (!meta.schema.fields.exists(f => f.name == "rows" && f.dataType == LongType))
      return None

    // the branches' listings are taken AS SKIPPED (not unwrapped to the
    // base): together they must PARTITION the snapshot's exact file set.
    // Disjointness is load-bearing, not cosmetic: a user-built
    // `readSnapshot(t).union(spark.read.parquet(t))` has both branches
    // carrying the FULL set — their union still equals the index's, but
    // the true count is 2·rows − pending, not rows − pending. Only the
    // applyDv split (clean ⊎ DV'd) passes both gates.
    val filesA = fsrA.location.inputFiles.map(Layout.normPath).toSet
    val filesB = fsrB.location.inputFiles.map(Layout.normPath).toSet
    if (filesA.exists(filesB.contains)) return None
    val current = filesA ++ filesB
    if (meta.files != current) return None
    val lk = dvBc.value
    if (Layout.normPath(dir) != lk.rootNorm) return None
    val pending = lk.pendingByFile.map { case (rf, n) => (lk.rootNorm + "/" + rf) -> n }.toMap
    if (!pending.keySet.subsetOf(current)) return None

    val env = GraftBridge.ofRows(session, meta.plan)
    val perFile = env.groupBy(col("file")).agg(min(col("rows")).as("rows"))
      .withColumn("__dv_pending",
        udf((f: String) => pending.getOrElse(f, 0L)).apply(col("file")))
    val outCols: Seq[Column] = rws.collect {
      case RwCount => coalesce(sum(col("rows") - col("__dv_pending")), lit(0L))
    }
    val replaced = perFile.agg(outCols.head, outCols.tail: _*)
    val newPlan = replaced.queryExecution.analyzed
    val newOut = newPlan.output
    var aggIdx = -1
    val projList: Seq[NamedExpression] = agg.aggregateExpressions.zip(rws).map {
      case (_, RwLit(ne)) => ne
      case (orig, _) =>
        aggIdx += 1
        val n = newOut(aggIdx)
        if (n.dataType != orig.dataType || (n.nullable && !orig.toAttribute.nullable))
          return None
        Alias(n, orig.name)(exprId = orig.exprId,
          qualifier = orig.toAttribute.qualifier)
    }
    logInfo(s"graft envelope agg: $dir DV-split count(*) answered from the " +
      s".envelopes index (${meta.files.size} files, ${pending.size} DV'd)")
    Some(Project(projList, newPlan))
  }
}

object EnvelopeAggRule {

  /** One extracted output column of the aggregate. */
  private sealed trait Rw
  private case object RwCount extends Rw
  private final case class RwCountCol(c: String) extends Rw
  private final case class RwMin(c: String) extends Rw
  private final case class RwMax(c: String) extends Rw
  private final case class RwGroup(c: String) extends Rw
  private final case class RwSum(c: String) extends Rw
  private final case class RwAvg(c: String) extends Rw
  private final case class RwLit(ne: NamedExpression) extends Rw

  /** The raw (unescaped) value of hive-partition segment `name` in a
    * file path, or null when absent / the default-partition marker. The
    * file NAME itself never participates (only directory segments). */
  private val partSegUdf = udf((path: String, name: String) => {
    if (path == null) null
    else {
      var res: String = null
      val segs = path.split('/')
      var i = 0
      while (i < segs.length - 1) { // last segment is the file name
        val seg = segs(i)
        val eq = seg.indexOf('=')
        if (eq > 0 &&
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.take(eq)) == name) {
          val v = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(seg.drop(eq + 1))
          res = if (v == org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null else v
        }
        i += 1
      }
      res
    }
  })

  /** `true` (default) answers stats-derivable aggregates over indexed
    * parquet tables from their `.envelopes` index; `false` disables. */
  val ConfKey = "spark.graft.envelope.agg"

  /** Cached per (session, dir, index-listing signature): the ANALYZED
    * index scan plan (so rewrites never re-infer the index schema — a
    * footer read per optimization otherwise), its schema, the
    * deduplicated indexed file set for the equality gate, and a WEAK
    * reference to the owning session (the plan pins it strongly — the
    * weak ref is how eviction tells a stopped session's entries apart
    * and releases them without waiting for LRU pressure). */
  private final case class IndexMeta(plan: LogicalPlan, schema: StructType,
                                     files: Set[String],
                                     owner: java.lang.ref.WeakReference[SparkSession])

  // LRU caches, (dir, listing-signature)-keyed like the prune rule's
  // skip-set cache: the signature changes whenever the index is
  // refreshed or appended to, so staleness self-invalidates. Bounded by
  // retained file paths (the heavy part of an entry) plus entry count.
  private val MaxEntries = 256
  private val MaxRetainedPaths = 1L << 20
  private var retained = 0L
  // Keys carry the session's UUID: a cached ANALYZED plan must not leak
  // across sessions (it captures the building session's state), and the
  // UUID — unlike an identityHashCode — cannot collide two sessions
  // onto one entry.
  private val metaCache =
    new java.util.LinkedHashMap[(String, String, String), IndexMeta](32, 0.75f, true)
  private val constCache =
    new java.util.LinkedHashMap[(String, String, String, String), Boolean](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String, String), Boolean]): Boolean =
        size > MaxEntries
    }
  private def sid(session: SparkSession): String = GraftBridge.sessionUUID(session)

  private def indexMeta(session: SparkSession, dir: String, envDir: String,
                        sig: String): IndexMeta = {
    metaCache.synchronized(Option(metaCache.get((sid(session), dir, sig)))) match {
      case Some(hit) => hit
      case None =>
        val env = session.read.parquet(envDir) // outside the lock: runs a job
        val files = env.select("file").distinct().collect()
          .map(r => Layout.normPath(r.getString(0))).toSet
        val v = IndexMeta(env.queryExecution.analyzed, env.schema, files,
          new java.lang.ref.WeakReference(session))
        metaCache.synchronized {
          // entries of stopped (or collected) sessions first: their plans
          // can never serve again and must not keep the session reachable
          val dead = metaCache.entrySet().iterator()
          while (dead.hasNext) {
            val e = dead.next()
            val s = e.getValue.owner.get()
            if (s == null || s.sparkContext.isStopped) {
              retained -= e.getValue.files.size
              dead.remove()
            }
          }
          val prior = metaCache.put((sid(session), dir, sig), v)
          retained += v.files.size - (if (prior == null) 0 else prior.files.size)
          val it = metaCache.entrySet().iterator()
          while (metaCache.size > 1 &&
                 (metaCache.size > MaxEntries || retained > MaxRetainedPaths)) {
            val eldest = it.next()
            retained -= eldest.getValue.files.size
            it.remove()
          }
        }
        v
    }
  }

  /** Is `g` PROVEN constant within every indexed file? Constant means
    * `min_g <=> max_g` (null-safe: an all-null file is the NULL group;
    * Spark's `<=>` also treats NaN = NaN as true, matching its grouping
    * semantics) with no mixed-null file (`0 < nulls_g < rows` declines —
    * such a file spans the NULL group and a value group). */
  private def constantPerFile(session: SparkSession, dir: String,
                              meta: IndexMeta, sig: String, g: String): Boolean = {
    constCache.synchronized(Option(constCache.get((sid(session), dir, sig, g)))) match {
      case Some(hit) => hit
      case None =>
        val env = GraftBridge.ofRows(session, meta.plan)
        val violation = !(col(s"min_$g") <=> col(s"max_$g")) ||
          (col(s"nulls_$g") > lit(0L) && col(s"nulls_$g") < col("rows"))
        val v = env.filter(violation).limit(1).count() == 0L
        constCache.synchronized(constCache.put((sid(session), dir, sig, g), v))
        v
    }
  }

  /** Is every relied-on stat of `cols` usable in every index row? A
    * mixed-generation index (rows appended with fewer indexed columns)
    * reads the missing stats as NULL — indistinguishable in type from a
    * legitimate all-null-file stat, so the legit case is whitelisted
    * exactly: `nulls_c == rows`. Any other NULL (including a NULL
    * `nulls_c` itself, or a NULL `sum_c` for a sum-role column) declines
    * the rewrite — aggregating over it would silently drop that file's
    * contribution. */
  private def statsSound(session: SparkSession, dir: String, meta: IndexMeta,
                         sig: String, cols: Seq[String],
                         sumCols: Set[String]): Boolean = {
    if (cols.isEmpty) return true
    val key = (sid(session), dir, sig,
      "sound:" + cols.sorted.mkString(",") + "|" + sumCols.toSeq.sorted.mkString(","))
    constCache.synchronized(Option(constCache.get(key))) match {
      case Some(hit) => hit
      case None =>
        val env = GraftBridge.ofRows(session, meta.plan)
        val allNullFile = (c: String) => col(s"nulls_$c") === col("rows")
        // per-file no-overflow proof for sums: every value lies in
        // [min_c, max_c], so |file sum| <= rows * max(|min_c|, |max_c|);
        // bounding the extrema by Long.Max/rows (floor division —
        // conservative) proves the stored partial is the TRUE sum
        // regardless of the eval mode the index was built under
        val sumUnsafe = (c: String) =>
          col(s"max_$c") > lit(Long.MaxValue) / col("rows") ||
            col(s"min_$c") < lit(-Long.MaxValue) / col("rows")
        val violation = cols.map { c =>
          col(s"nulls_$c").isNull || col("rows").isNull ||
            ((col(s"min_$c").isNull || col(s"max_$c").isNull) && !allNullFile(c)) ||
            (if (sumCols.contains(c))
               (col(s"sum_$c").isNull || sumUnsafe(c)) && !allNullFile(c)
             else lit(false))
        }.reduce(_ || _)
        val v = env.filter(violation).limit(1).count() == 0L
        constCache.synchronized(constCache.put(key, v))
        v
    }
  }

  /** Is `avg(c)` exactly reproducible from per-file integer partials?
    * Spark accumulates the average's sum per ROW in DOUBLE; every
    * intermediate stays an exactly-representable integer — so any
    * accumulation ORDER computes the same double — when the total
    * absolute mass Σ rows·max(|min_c|,|max_c|) is ≤ 2^52 (a margin
    * under double's 2^53 integer range, probe computed in double).
    * All-null files contribute zero mass. */
  private def avgExact(session: SparkSession, dir: String, meta: IndexMeta,
                       sig: String, c: String): Boolean = {
    val key = (sid(session), dir, sig, s"avgexact:$c")
    constCache.synchronized(Option(constCache.get(key))) match {
      case Some(hit) => hit
      case None =>
        val env = GraftBridge.ofRows(session, meta.plan)
        val mass = sum(col("rows").cast(DoubleType) *
          coalesce(greatest(abs(col(s"min_$c").cast(DoubleType)),
            abs(col(s"max_$c").cast(DoubleType))), lit(0d)))
        val row = env.agg(mass).head()
        val v = !row.isNullAt(0) && row.getDouble(0) <= (1L << 52).toDouble
        constCache.synchronized(constCache.put(key, v))
        v
    }
  }

  private[plans] def retainedFilePaths: Long = metaCache.synchronized(retained)

  private[graft] def clearCache(): Unit = {
    metaCache.synchronized { metaCache.clear(); retained = 0L }
    constCache.synchronized(constCache.clear())
  }

  /** Idempotently register on a LIVE session (specs / notebook sessions
    * built without `spark.sql.extensions`). */
  def ensure(spark: SparkSession): Unit = {
    val have = spark.experimental.extraOptimizations.exists(_.isInstanceOf[EnvelopeAggRule])
    if (!have) spark.experimental.extraOptimizations ++= Seq(new EnvelopeAggRule(spark))
  }
}
