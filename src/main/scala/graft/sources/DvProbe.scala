package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast probe state of a deletion-vector sidecar: one entry per
  * DV'd file mapping the TABLE-RELATIVE path to its SORTED deleted
  * positions, probed per row by [[DvDeleted]]. 8 bytes per pending
  * position (a primitive `long[]` per file) plus one map entry per
  * file — at [[Layout.DvMaxPositionsDefault]] (10M positions) that is
  * ~80 MB, comfortable on any executor; the previous encoding exploded
  * the sidecar into (path-string, position) rows, which carried the
  * 50–100-byte relative path on EVERY row (~0.6–1 GB at the cap).
  *
  * Path resolution (qualified scan path → table-relative — the
  * [[Manifest.dvRelPath]] retire-lifecycle mapping) runs ONCE per
  * distinct file per thread through a last-file cache: `_metadata
  * .file_path` is constant over a file's rows, so the steady-state
  * per-row cost is one UTF8String equality check plus a binary search. */
final class DvLookup(val rootNorm: String,
                     files: Array[String],
                     positions: Array[Array[Long]]) extends Serializable {
  require(files.length == positions.length,
    s"DvLookup: ${files.length} files but ${positions.length} position arrays")

  @transient private lazy val byFile: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]](files.length * 2)
    var i = 0
    while (i < files.length) { m.put(files(i), positions(i)); i += 1 }
    m
  }

  private final class Slot {
    var path: UTF8String = _
    var pos: Array[Long] = _ // null: file carries no deletion vector
  }
  @transient private lazy val slot = new ThreadLocal[Slot] {
    override def initialValue(): Slot = new Slot
  }

  def totalPositions: Long = {
    var s = 0L; var i = 0
    while (i < positions.length) { s += positions(i).length; i += 1 }
    s
  }

  /** The table-relative files carrying a vector — the read path SPLITS
    * its scan on this set so clean files never pay the probe. */
  def relFiles: Array[String] = files

  /** (table-relative file, pending deleted positions) pairs — positions
    * are DISTINCT per file by construction (the mutation side writes
    * `collect_set` and merges with `array_union`), so the count is the
    * exact number of logically-deleted rows in that file. This is what
    * lets [[graft.plans.EnvelopeAggRule]] answer `count(*)` on a
    * DV-carrying table from metadata: visible rows = physical rows
    * (envelope index) − pending positions (here). */
  def pendingByFile: Array[(String, Long)] = {
    val out = new Array[(String, Long)](files.length)
    var i = 0
    while (i < files.length) {
      out(i) = (files(i), positions(i).length.toLong)
      i += 1
    }
    out
  }

  /** Is physical row `pos` of the file scanned at `path` deleted?
    * Called from generated code — one clone per distinct file per
    * thread (the incoming UTF8String may point into a reused buffer). */
  def deleted(path: UTF8String, pos: Long): Boolean = {
    val s = slot.get()
    if (s.path == null || !s.path.equals(path)) {
      s.path = path.clone()
      s.pos = byFile.get(Manifest.dvRelPath(rootNorm, path.toString))
    }
    s.pos != null && java.util.Arrays.binarySearch(s.pos, pos) >= 0
  }
}

/** `graft_dv_deleted(_metadata.file_path, _metadata.row_index)` — the
  * deletion-vector read filter: TRUE exactly when the broadcast sidecar
  * map holds the row's (file, position). A plain codegen'd FILTER over
  * the scan (no join, no shuffle, whole-stage span intact); NULL inputs
  * answer false (metadata columns are never null — conservative both
  * ways). [[graft.plans.EnvelopeAggRule]] cannot fire through it: the
  * filter references `_metadata`, which no envelope covers, so the
  * stats rewrite declines and logically-deleted rows can never be
  * answered from the index. */
case class DvDeleted(lookup: Broadcast[DvLookup],
                     filePath: Expression,
                     rowIndex: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(filePath, rowIndex)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dv_deleted"

  override def checkInputDataTypes(): TypeCheckResult =
    (filePath.dataType, rowIndex.dataType) match {
      case (_: StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (f, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, bigint) inputs, got (${f.sql}, ${r.sql})")
    }

  override def eval(input: InternalRow): Any = {
    val f = filePath.eval(input)
    val p = rowIndex.eval(input)
    if (f == null || p == null) false
    else lookup.value.deleted(f.asInstanceOf[UTF8String], p.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftDvBc", lookup,
      "org.apache.spark.broadcast.Broadcast")
    // hoist the broadcast .value() out of the per-row path
    val lk = ctx.addMutableState("graft.sources.DvLookup", "graftDvLookup",
      v => s"$v = (graft.sources.DvLookup) $bcRef.value();")
    val f = filePath.genCode(ctx)
    val p = rowIndex.genCode(ctx)
    ev.copy(code = code"""
      ${f.code}
      ${p.code}
      boolean ${ev.value} = false;
      if (!${f.isNull} && !${p.isNull}) {
        ${ev.value} = $lk.deleted(${f.value}, ${p.value});
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(filePath = newChildren(0), rowIndex = newChildren(1))
}

/** `_metadata.file_path` → table-relative path ([[Manifest.dvRelPath]])
  * as a codegen'd expression with a per-thread last-file cache — the
  * mutation verbs' position-recording scan annotates every candidate
  * row with its relative file, and the path is constant per file, so a
  * per-row UDF (Path/URI parsing plus ser/de every row) is exactly the
  * wrong tool. */
case class DvRelPathOf(rootNorm: String, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_dv_rel_path"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  private final class Slot {
    var raw: UTF8String = _
    var rel: UTF8String = _
  }
  @transient private lazy val slot = new ThreadLocal[Slot] {
    override def initialValue(): Slot = new Slot
  }

  /** Called from generated code — resolves once per distinct file per
    * thread. */
  def relOf(raw: UTF8String): UTF8String = {
    val s = slot.get()
    if (s.raw == null || !s.raw.equals(raw)) {
      s.raw = raw.clone()
      s.rel = UTF8String.fromString(Manifest.dvRelPath(rootNorm, raw.toString))
    }
    s.rel
  }

  override def nullSafeEval(v: Any): Any = relOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDvRel", this, "graft.sources.DvRelPathOf")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.relOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Loader + cache for [[DvLookup]] broadcasts. Sidecars are IMMUTABLE
  * (UUID-named, written once, never rewritten), so a built broadcast
  * stays valid for the sidecar's lifetime; the cache is keyed by
  * (application, sidecar path, root) and bounded LRU — re-planning a
  * snapshot read (the streaming manifest source replans every batch)
  * reuses the broadcast instead of re-reading and re-shipping the
  * sidecar. Capacity is `spark.graft.dv.probeCacheSize` (default 4) —
  * size it to the number of DV-carrying tables a job cycles over (a
  * multi-table streaming topology re-reading >capacity sidecars pays a
  * driver-side rebuild per cycle; [[rebuildCount]] counts them for
  * exactly that diagnosis). Evicted entries are NOT destroyed: a live
  * plan may still hold the handle; the driver-side map is released and
  * executors GC blocks when the broadcast object goes unreachable. */
private[graft] object DvProbe {

  val ProbeCacheSizeConf = "spark.graft.dv.probeCacheSize"
  val ProbeCacheSizeDefault = 4

  @volatile private var maxCached = ProbeCacheSizeDefault
  private val cache =
    new java.util.LinkedHashMap[String, Broadcast[DvLookup]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Broadcast[DvLookup]]): Boolean =
        size() > maxCached
    }

  private val rebuilds = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Sidecar loads that MISSED the cache (the first load of each
    * sidecar included) — steady state for an N-table topology with
    * `probeCacheSize >= N` is one per distinct sidecar. */
  def rebuildCount: Long = rebuilds.get()

  def lookupFor(spark: SparkSession, dir: String, name: String,
                rootNorm: String): Broadcast[DvLookup] = {
    val sidecar = Manifest.dvsPath(dir) + "/" + name
    val key = spark.sparkContext.applicationId + ":" + sidecar + ":" + rootNorm
    maxCached = math.max(1,
      spark.conf.get(ProbeCacheSizeConf, ProbeCacheSizeDefault.toString).toInt)
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    rebuilds.incrementAndGet()
    // bounded by the mutation-side capacity guard (DvMaxPositionsConf):
    // total positions never exceed the cap, so the driver-side build is
    // metadata-scale by construction
    import spark.implicits._
    val rows = spark.read.parquet(sidecar)
      .select($"file", $"positions").as[(String, Array[Long])].collect()
    val files = new Array[String](rows.length)
    val positions = new Array[Array[Long]](rows.length)
    var i = 0
    while (i < rows.length) {
      files(i) = rows(i)._1
      val p = rows(i)._2
      java.util.Arrays.sort(p) // sidecars sort at write; binary search must not trust it
      positions(i) = p
      i += 1
    }
    val bc = spark.sparkContext.broadcast(new DvLookup(rootNorm, files, positions))
    cache.synchronized {
      val raced = cache.get(key)
      if (raced != null) {
        // the loser's broadcast was never handed to any plan — destroy
        // it, or its driver + executor blocks leak for the app lifetime
        bc.destroy()
        raced
      } else { cache.put(key, bc); bc }
    }
  }
}
