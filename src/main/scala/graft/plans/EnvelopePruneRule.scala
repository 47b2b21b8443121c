package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
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
        try prune(cond, rel).getOrElse(f)
        catch {
          case NonFatal(e) =>
            logWarning(s"graft envelope prune: failed, leaving the scan unpruned: $e")
            f
        }
    }

  private def prune(cond: Expression, rel: LogicalRelation): Option[Filter] = {
    val fsr = rel.relation.asInstanceOf[HadoopFsRelation]
    if (fsr.options.contains(PrunedMarker)) return None // already pruned (re-match breaker)
    if (rel.isStreaming || fsr.bucketSpec.isDefined) return None
    if (!fsr.fileFormat.toString.toLowerCase.contains("parquet")) return None
    val roots = fsr.location.rootPaths
    if (roots.size != 1) return None
    val dir = roots.head.toString
    if (dir.endsWith(".envelopes")) return None // never prune an index with itself

    val constraints = extract(cond, rel.output)
    if (constraints.isEmpty) return None

    val envPath = new org.apache.hadoop.fs.Path(Layout.envelopesPath(dir))
    val fs = envPath.getFileSystem(session.sparkContext.hadoopConfiguration)
    if (!fs.exists(envPath)) return None
    // index signature: the envelope dir's listing — refreshes/appends
    // change it, invalidating every cached skip set for this dir
    val sig = fs.listStatus(envPath).filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",").hashCode.toString

    val key = (dir, sig, constraints.map(_.cacheKey).sorted.mkString(";"))
    val skip = cachedSkipSet(key) {
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
    if (skip.isEmpty) return None

    val all = fsr.location.inputFiles
    val keep = all.count(f => !skip.contains(Layout.normPath(f)))
    if (keep == all.length) return None
    logInfo(s"graft envelope prune: $dir scan pruned ${all.length - keep}/" +
      s"${all.length} files via the .envelopes index")
    if (keep == 0) return Some(Filter(cond, LocalRelation(rel.output)))
    val prunedFsr = fsr.copy(location = new SkippingFileIndex(fsr.location, skip),
      options = fsr.options + (PrunedMarker -> "true"))(fsr.sparkSession)
    Some(Filter(cond, rel.copy(relation = prunedFsr)))
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

  /** The original relation's [[FileIndex]] minus the skipped files — a
    * pure delegating view, so NOTHING is re-listed and partition
    * semantics are preserved exactly: Catalyst's partition pruning
    * passes its filters straight through to the underlying index, and
    * envelope skipping subtracts files from whatever partitions
    * survive (the composed production read path, automatically).
    * `sizeInBytes` shrinks with the skipped bytes so join-side
    * broadcast estimates benefit from the prune too. */
  private final class SkippingFileIndex(underlying: FileIndex, skip: Set[String])
      extends FileIndex {
    private def kept(p: org.apache.hadoop.fs.Path): Boolean =
      !skip.contains(Layout.normPath(p.toString))
    override def rootPaths: Seq[org.apache.hadoop.fs.Path] = underlying.rootPaths
    override def partitionSchema: StructType = underlying.partitionSchema
    override def metadataOpsTimeNs: Option[Long] = underlying.metadataOpsTimeNs
    override def refresh(): Unit = underlying.refresh()
    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      underlying.listFiles(partitionFilters, dataFilters)
        .map(pd => pd.copy(files = pd.files.filter(f => kept(f.getPath))))
        .filter(_.files.nonEmpty)
    override def inputFiles: Array[String] =
      underlying.inputFiles.filter(f => kept(new org.apache.hadoop.fs.Path(f)))
    override lazy val sizeInBytes: Long =
      listFiles(Nil, Nil).flatMap(_.files).map(_.getLen).sum
  }

  private val PrunedMarker = "graft.envelope.pruned"

  /** One extracted conjunct: `name <op> values`. [[missColumn]] is its
    * per-file refutation over the envelope table. */
  private final case class Constraint(name: String, op: String, values: Seq[Literal]) {
    def cacheKey: String = s"$name $op ${values.map(_.sql).mkString(",")}"

    def missColumn(envCols: Seq[String]): org.apache.spark.sql.Column = {
      def v(l: Literal) = GraftBridge.column(l)
      val mn = col(s"min_$name"); val mx = col(s"max_$name")
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
            case "eq" => mx < v(values.head) || mn > v(values.head)
            case "in" => // sound necessary condition: outside the list's hull
              values.map(l => mx < v(l)).reduce(_ && _) ||
                values.map(l => mn > v(l)).reduce(_ && _)
          }
          if (envCols.contains(s"nulls_$name")) range || (col(s"nulls_$name") === col("rows"))
          else range
      }
    }
  }

  /** Bounded skip-set cache (the [[PlanStats]] pattern): re-optimizing
    * the same filtered scan — explain, cached views, AQE — reuses the
    * decision instead of re-running the index job. */
  private val cache = new ConcurrentHashMap[(String, String, String), Set[String]]()
  private val MaxEntries = 1024

  private def cachedSkipSet(key: (String, String, String))(compute: => Set[String]): Set[String] = {
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val v = compute
      if (cache.size >= MaxEntries) cache.clear()
      cache.put(key, v)
      v
    }
  }

  private[graft] def clearCache(): Unit = cache.clear()

  /** Idempotently register the rule on a LIVE session (specs and
    * notebook sessions created without `spark.sql.extensions`; the
    * [[graft.GraftExtensions]] injection path covers fresh sessions). */
  def ensure(spark: SparkSession): Unit = {
    val have = spark.experimental.extraOptimizations.exists(_.isInstanceOf[EnvelopePruneRule])
    if (!have) spark.experimental.extraOptimizations ++= Seq(new EnvelopePruneRule(spark))
  }
}
