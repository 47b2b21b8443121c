package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.sources.Layout

/** Catalyst rule: route a plain `spark.read.parquet(dir).filter(box)`
  * scan through the table's persisted `.envelopes` file-skipping index
  * automatically — the [[Layout.prunedRead]] semantics with ZERO API
  * change (the round-11 lesson applied to the layout layer: an index
  * only helps users who know it exists; this rule makes it reach the
  * ones who don't).
  *
  * == What fires ==
  * `Filter(cond, scan)` where `scan` is a non-streaming, non-bucketed
  * parquet relation — flat (what [[Layout.clusterWrite]] and the
  * streaming self-clustering sink produce) or hive-partitioned (what
  * [[Layout.clusterPartitions]] maintains; the skip composes with
  * Catalyst's partition pruning through a delegating [[FileIndex]], so
  * partition filters prune directories and envelopes subtract files
  * inside the survivors) — over a single root directory whose
  * `<dir>.envelopes` index exists. From `cond`'s conjuncts the rule
  * extracts single-column range constraints — `c >= v`, `c > v`,
  * `c <= v`, `c < v`, `c = v`, `c <=> v`, `c IN (v…)`, either
  * orientation, bare column vs literal only (a cast-wrapped column
  * means the types didn't line up — the envelope can't prove anything
  * there), plus the null-ness conjuncts `c IS [NOT] NULL` when the
  * index carries null counts — and keeps only the ones the index
  * actually covers.
  *
  * == Exactness ==
  * The skip set is `currentListing ∩ {envelope PROVES no row satisfies
  * some extracted conjunct}` — the same listing-intersection
  * construction as [[Layout.prunedRead]], so stale and missing index
  * entries cost I/O, never rows: unindexed files are always read, and
  * the original `Filter` stays on top untouched (pruning I/O, not
  * rows). Per-conjunct proofs: `c >= v` misses iff `max_c < v` (strict
  * forms tighten to ≤/≥), equality misses outside `[min,max]`, `IN`
  * misses outside `[min(list), max(list)]`, and a file whose boxed
  * column is ALL null misses any of them (SQL comparisons reject null;
  * needs the index's `nulls_c` column — older indexes without it just
  * skip less). Proofs are evaluated by a Spark filter OVER THE INDEX
  * TABLE itself, so comparison semantics (type coercion, NaN ordering,
  * collation) are Spark's own, never re-implemented.
  *
  * == Cost model ==
  * No density gate: with the index present, the decision job is a scan
  * of a one-row-per-data-file index — strictly cheaper than opening the
  * files it can skip; when it proves nothing the plan is unchanged. The
  * skip set is CACHED per (dir, index signature, constraint set) — the
  * [[PlanStats]] explain-safety pattern — so re-optimizations (explain,
  * cached views, AQE re-planning) reuse it; the index-dir listing that
  * computes the signature is the only recurring cost, and index
  * refreshes invalidate the cache by changing the signature.
  * `spark.graft.envelope.prune=false` disables.
  *
  * Self-re-match safety (the fixed-point-batch hazard): the replacement
  * relation carries a marker option, so the next optimizer iteration
  * declines it immediately; reading the index table inside the rule
  * cannot recurse because `<dir>.envelopes.envelopes` never exists. */
class EnvelopePruneRule(session: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

  import EnvelopePruneRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation)
          if !f.isStreaming && rel.relation.isInstanceOf[HadoopFsRelation] =>
        try prunedChild(cond, rel).map(Filter(cond, _)).getOrElse(f)
        catch {
          case NonFatal(e) =>
            logWarning(s"graft envelope prune: failed, leaving the scan unpruned: $e")
            f
        }
      // the `select(cols).filter(box)` spelling: a deterministic Project
      // interposed between the Filter and the scan. Filter pushdown
      // usually normalizes this away inside its own batch, but a rule
      // must not DEPEND on batch ordering — constraints are resolved
      // through the projection's attribute aliases, and the pruned
      // relation is re-wrapped under the untouched Project (same output
      // attribute ids, so nothing above re-resolves).
      case f @ Filter(cond, Project(projList, rel: LogicalRelation))
          if !f.isStreaming && rel.relation.isInstanceOf[HadoopFsRelation] &&
             projList.forall(_.deterministic) =>
        try prunedChild(substituteProject(cond, projList), rel)
          .map(nc => Filter(cond, Project(projList, nc))).getOrElse(f)
        catch {
          case NonFatal(e) =>
            logWarning(s"graft envelope prune: failed, leaving the scan unpruned: $e")
            f
        }
    }

  /** Resolve the filter's attribute references through a projection's
    * simple aliases (`Alias(attr, name)`), so a constraint on a renamed
    * column still reaches the underlying relation column; computed
    * aliases are left as-is (and then fail attribute resolution in
    * [[extract]], declining soundly). */
  private def substituteProject(cond: Expression,
                                projList: Seq[NamedExpression]): Expression = {
    val byId = projList.collect {
      case a @ Alias(ar: AttributeReference, _) => a.exprId -> ar
    }.toMap
    cond.transform { case ar: AttributeReference => byId.getOrElse(ar.exprId, ar) }
  }

  /** The pruned replacement for `rel` under extracted constraints of
    * `cond`, or None to leave the plan untouched. Multi-root scans
    * (`spark.read.parquet(dirA, dirB)`) prune per root — each root's own
    * `.envelopes` index contributes its skip set (roots without one
    * contribute nothing) — and the union subtracts from the shared
    * listing. */
  private def prunedChild(cond: Expression, rel: LogicalRelation): Option[LogicalPlan] = {
    val fsr = rel.relation.asInstanceOf[HadoopFsRelation]
    if (fsr.options.contains(PrunedMarker)) return None // already pruned (re-match breaker)
    if (rel.isStreaming || fsr.bucketSpec.isDefined) return None
    if (!fsr.fileFormat.isInstanceOf[ParquetFileFormat]) return None
    val roots = fsr.location.rootPaths
    if (roots.isEmpty) return None
    if (roots.exists(_.toString.endsWith(".envelopes"))) return None // never prune an index with itself

    val constraints = extract(cond, rel.output)
    if (constraints.isEmpty) return None

    val skip = roots.map(r => skipSetForRoot(r.toString, constraints))
      .reduce(_ ++ _)
    if (skip.isEmpty) return None

    val all = fsr.location.inputFiles
    val keep = all.count(f => !skip.contains(Layout.normPath(f)))
    if (keep == all.length) return None
    logInfo(s"graft envelope prune: ${roots.mkString(",")} scan pruned ${all.length - keep}/" +
      s"${all.length} files via the .envelopes index")
    if (keep == 0) return Some(LocalRelation(rel.output))
    val prunedFsr = fsr.copy(
      location = new SkippingFileIndex(fsr.location, skip, semanticsPreserving = true),
      options = fsr.options + (PrunedMarker -> "true"))(fsr.sparkSession)
    Some(rel.copy(relation = prunedFsr))
  }

  /** One root's cached skip set: files its `.envelopes` index proves
    * cannot satisfy some constraint; empty when the root has no index or
    * the index covers none of the constrained columns. */
  private def skipSetForRoot(dir: String, constraints: Seq[Constraint]): Set[String] = {
    val envPath = new org.apache.hadoop.fs.Path(Layout.envelopesPath(dir))
    val fs = envPath.getFileSystem(session.sparkContext.hadoopConfiguration)
    if (!fs.exists(envPath)) return Set.empty
    // index signature: the envelope dir's FULL listing string —
    // refreshes/appends change it, invalidating every cached skip set
    // for this dir. Never collapsed to a hashCode: a 32-bit collision
    // between the pre- and post-refresh listings would keep serving a
    // stale skip set, which can wrongly skip files.
    val sig = fs.listStatus(envPath).filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",")

    val key = (dir, sig, constraints.map(_.cacheKey).sorted.mkString(";"))
    cachedSkipSet(key) {
      val env = session.read.parquet(envPath.toString)
      val envCols = env.columns.toSeq
      val usable = constraints.filter { c =>
        c.op match {
          case "null" | "notnull" => envCols.contains(s"nulls_${c.name}")
          case _ =>
            envCols.contains(s"min_${c.name}") && envCols.contains(s"max_${c.name}")
        }
      }
      if (usable.isEmpty) Set.empty[String]
      else {
        val miss = usable.map(_.missColumn(envCols)).reduce(_ || _)
        env.filter(miss).select("file").collect()
          .map(r => Layout.normPath(r.getString(0))).toSet
      }
    }
  }

  /** Single-column range constraints among `cond`'s conjuncts: bare
    * attribute vs non-null literal, attribute resolved against the
    * relation's output, comparable atomic types only. */
  private def extract(cond: Expression, output: Seq[Attribute]): Seq[Constraint] = {
    val byId = output.map(a => a.exprId -> a.name).toMap
    def name(e: Expression): Option[String] = e match {
      case a: AttributeReference if comparable(a.dataType) => byId.get(a.exprId)
      case _ => None
    }
    def litOk(l: Literal): Boolean = l.value != null && comparable(l.dataType)
    splitConjunctivePredicates(cond).flatMap {
      case GreaterThanOrEqual(a, l: Literal) if litOk(l) => name(a).map(Constraint(_, "ge", Seq(l)))
      case LessThanOrEqual(l: Literal, a) if litOk(l)    => name(a).map(Constraint(_, "ge", Seq(l)))
      case GreaterThan(a, l: Literal) if litOk(l)        => name(a).map(Constraint(_, "gt", Seq(l)))
      case LessThan(l: Literal, a) if litOk(l)           => name(a).map(Constraint(_, "gt", Seq(l)))
      case LessThanOrEqual(a, l: Literal) if litOk(l)    => name(a).map(Constraint(_, "le", Seq(l)))
      case GreaterThanOrEqual(l: Literal, a) if litOk(l) => name(a).map(Constraint(_, "le", Seq(l)))
      case LessThan(a, l: Literal) if litOk(l)           => name(a).map(Constraint(_, "lt", Seq(l)))
      case GreaterThan(l: Literal, a) if litOk(l)        => name(a).map(Constraint(_, "lt", Seq(l)))
      case EqualTo(a, l: Literal) if litOk(l)            => name(a).map(Constraint(_, "eq", Seq(l)))
      case EqualTo(l: Literal, a) if litOk(l)            => name(a).map(Constraint(_, "eq", Seq(l)))
      case EqualNullSafe(a, l: Literal) if litOk(l)      => name(a).map(Constraint(_, "eq", Seq(l)))
      case EqualNullSafe(l: Literal, a) if litOk(l)      => name(a).map(Constraint(_, "eq", Seq(l)))
      case In(a, list) if list.nonEmpty &&
          list.forall { case l: Literal => litOk(l); case _ => false } =>
        name(a).map(Constraint(_, "in", list.map(_.asInstanceOf[Literal])))
      // Catalyst's OptimizeIn has already rewritten every literal IN
      // list past spark.sql.optimizer.inSetConversionThreshold (default
      // 10) into InSet by the time user optimizer rules run — exactly
      // the lists large enough to want bloom refutation. Values are
      // re-wrapped as literals of the probe child's type; sorted by
      // their rendering so the proof (and its cache key) is
      // deterministic across Set iteration orders.
      case InSet(a, hset) if hset.nonEmpty && !hset.contains(null) =>
        name(a).map(Constraint(_, "in",
          hset.toSeq.map(v => Literal(v, a.dataType)).sortBy(_.value.toString)))
      // null-ness conjuncts need only the index's null counts. Catalyst
      // itself infers `isnotnull(c)` for every comparison on c, so via
      // this arm an ALL-NULL file prunes for any filtered query — even
      // when the comparison itself was not extractable (cast-wrapped,
      // column-vs-column).
      case IsNotNull(a) => name(a).map(Constraint(_, "notnull", Nil))
      case IsNull(a)    => name(a).map(Constraint(_, "null", Nil))
      case _ => None
    }
  }

  private def comparable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | TimestampType | TimestampNTZType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }
}

object EnvelopePruneRule {

  /** `true` (default) routes box-filtered parquet scans through their
    * `.envelopes` index when one exists; `false` disables. */
  val ConfKey = "spark.graft.envelope.prune"

  private val PrunedMarker = "graft.envelope.pruned"

  /** Probe a persisted per-file bloom (written by
    * [[Layout.writeEnvelopes]]'s `bloomCols` as the serialized
    * `org.apache.spark.util.sketch.BloomFilter` of `xxhash64(c)`) for a
    * pre-hashed value. NULL blooms (legacy index rows, empty files)
    * answer `true` — "might contain", the safe direction. Runs over the
    * BOUNDED index table only, cached per skip-set key like every other
    * proof. */
  private val bloomMightContain =
    org.apache.spark.sql.functions.udf((bloom: Array[Byte], hash: Long) =>
      bloom == null ||
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bloom)).mightContainLong(hash))

  /** One extracted conjunct: `name <op> values`. [[missColumn]] is its
    * per-file refutation over the envelope table. */
  private final case class Constraint(name: String, op: String, values: Seq[Literal]) {
    // cache key renders the literal's INTERNAL value + catalog type, not
    // Literal.sql: .sql formats TIMESTAMP in session-local wall-clock
    // time, so two distinct instants collide during a DST fall-back hour
    // (and the cache is JVM-global across sessions with different
    // session.timeZone) — the internal Long/UTF8String never does
    def cacheKey: String =
      s"$name $op ${values.map(l => s"${l.dataType.catalogString}:${l.value}").mkString(",")}"

    def missColumn(envCols: Seq[String]): org.apache.spark.sql.Column = {
      def v(l: Literal) = GraftBridge.column(l)
      val mn = col(s"min_$name"); val mx = col(s"max_$name")
      // BLOOM refutation for equality-shaped proofs: the file's bloom
      // (when the index carries one AND this row has it — NULL answers
      // "might contain") says the hashed value is definitely absent.
      // Exactly the hull's complement case: values that INTERLEAVE
      // across files make every [min,max] contain every key, and only
      // the bloom can still prove absence. False positives only ever
      // KEEP a file — the safe direction.
      def bloomAbsent(l: Literal): org.apache.spark.sql.Column =
        if (!envCols.contains(s"bloom_$name"))
          org.apache.spark.sql.functions.lit(false)
        else {
          val h = new XxHash64(Seq(l)).eval().asInstanceOf[Long]
          col(s"bloom_$name").isNotNull &&
            !bloomMightContain(col(s"bloom_$name"),
              org.apache.spark.sql.functions.lit(h))
        }
      op match {
        // a file with NO nulls in c cannot satisfy `c IS NULL`; one
        // that is ALL null (or empty) cannot satisfy `c IS NOT NULL`
        case "null"    => col(s"nulls_$name") === org.apache.spark.sql.functions.lit(0L)
        case "notnull" => col(s"nulls_$name") === col("rows")
        case _ =>
          val range = op match {
            case "ge" => mx < v(values.head)
            case "gt" => mx <= v(values.head)
            case "le" => mn > v(values.head)
            case "lt" => mn >= v(values.head)
            case "eq" =>
              mx < v(values.head) || mn > v(values.head) || bloomAbsent(values.head)
            case "in" =>
              // PER-VALUE refutation for small lists — sound (the file
              // misses iff it can hold NO listed value) and strictly
              // stronger than the hull: `c IN (1, 1000000)` also skips a
              // file covering [5000, 6000], which lies inside the hull
              // but contains no listed value. Longer lists keep the
              // decision predicate small: the hull test, plus — when the
              // index carries a bloom — ONE batched probe of every
              // listed value's hash against the file's bloom (point
              // membership is exactly what blooms answer; a 100-value IN
              // over interleaved keys prunes even though every hull
              // contains every value). Hashes are computed once at plan
              // time, capped so a pathological list cannot stall the
              // driver.
              if (values.size <= InPerValueMax)
                values.map(l => mx < v(l) || mn > v(l) || bloomAbsent(l)).reduce(_ && _)
              else {
                val hull = values.map(l => mx < v(l)).reduce(_ && _) ||
                  values.map(l => mn > v(l)).reduce(_ && _)
                if (!envCols.contains(s"bloom_$name") || values.size > InBloomMax) hull
                else {
                  val hashes = values.map(l =>
                    new XxHash64(Seq(l)).eval().asInstanceOf[Long])
                  hull || (col(s"bloom_$name").isNotNull &&
                    !bloomMightContainAny(col(s"bloom_$name"),
                      org.apache.spark.sql.functions.typedlit(hashes)))
                }
              }
          }
          if (envCols.contains(s"nulls_$name")) range || (col(s"nulls_$name") === col("rows"))
          else range
      }
    }
  }

  /** `IN` lists up to this long get per-value miss proofs; longer ones
    * use the (weaker but O(2)-term-per-value) hull test plus, when the
    * column carries a bloom, one batched all-values bloom probe. */
  private val InPerValueMax = 32

  /** Largest `IN` list the batched bloom probe hashes at plan time. */
  private val InBloomMax = 4096

  /** Batched bloom probe: does the file's bloom admit ANY of the
    * pre-computed hashes? NULL blooms answer "might", the safe
    * direction; `false` is an exact all-absent proof. */
  private val bloomMightContainAny =
    org.apache.spark.sql.functions.udf((bloom: Array[Byte], hashes: Seq[Long]) =>
      bloom == null || {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bloom))
        hashes.exists(bf.mightContainLong)
      })

  /** Bounded skip-set cache (the [[PlanStats]] explain-safety pattern):
    * re-optimizing the same filtered scan — explain, cached views, AQE —
    * reuses the decision instead of re-running the index job.
    *
    * Bounded by RETAINED PATHS, not just entry count: each value is a
    * `Set[String]` of skipped file paths, and on a ~1M-file table where
    * most files miss (the success case!) ONE entry is ~100 MB of driver
    * heap — an entry-count bound alone would not cap memory. Eviction is
    * LRU oldest-first (a `LinkedHashMap` in access order), never
    * all-or-nothing, so a workload cycling through more than the entry
    * budget of distinct (dir, sig, constraints) keys re-runs only the
    * coldest decisions instead of thrashing the whole cache. The most
    * recent entry always survives, even alone over budget — the query
    * that just computed it is about to use it. */
  private val MaxEntries = 1024
  private val MaxRetainedPaths = 1L << 20 // ~1M paths ≈ 100 MB ceiling
  private var retained = 0L
  private val cache =
    new java.util.LinkedHashMap[(String, String, String), Set[String]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String), Set[String]]): Boolean = false
    }

  private[plans] def cachedSkipSet(key: (String, String, String))(
      compute: => Set[String]): Set[String] = {
    cache.synchronized { Option(cache.get(key)) } match {
      case Some(hit) => hit
      case None =>
        val v = compute // outside the lock: the decision job is a Spark action
        cache.synchronized {
          val prior = cache.put(key, v)
          retained += v.size - (if (prior == null) 0 else prior.size)
          val it = cache.entrySet().iterator()
          while (cache.size > 1 &&
                 (cache.size > MaxEntries || retained > MaxRetainedPaths)) {
            val eldest = it.next() // access-order head = least recently used
            retained -= eldest.getValue.size
            it.remove()
          }
        }
        v
    }
  }

  /** Total file paths currently retained across all entries (spec hook
    * for the memory bound). */
  private[plans] def retainedPaths: Long = cache.synchronized(retained)
  private[plans] def cacheEntries: Int = cache.synchronized(cache.size)

  private[graft] def clearCache(): Unit = cache.synchronized {
    cache.clear(); retained = 0L
  }

  /** Idempotently register the rule on a LIVE session (specs and
    * notebook sessions created without `spark.sql.extensions`; the
    * [[graft.GraftExtensions]] injection path covers fresh sessions). */
  def ensure(spark: SparkSession): Unit = {
    val have = spark.experimental.extraOptimizations.exists(_.isInstanceOf[EnvelopePruneRule])
    if (!have) spark.experimental.extraOptimizations ++= Seq(new EnvelopePruneRule(spark))
  }
}
