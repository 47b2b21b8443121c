package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** MANIFEST-committed snapshots for swap-maintained tables — the
  * Delta/Iceberg core idea at file-listing scale: each maintenance or
  * streaming-batch commit writes one manifest file naming the table's
  * complete current data-file set, and [[read]] resolves the latest
  * (or a pinned) manifest and plans over EXACTLY that set. A reader
  * racing a [[Layout.clusterPartitions]] OPTIMIZE or the streaming
  * self-clustering sink therefore sees only an old-complete or
  * new-complete snapshot, never a half-swapped mix and never a torn
  * half-committed batch — cross-process, with zero reader-side
  * mutation (healing stays the writer's job; a reader must never
  * rename a live table's directories out from under the writer).
  *
  * == Commit protocol ==
  * `<dir>.manifests/m<seq>` (zero-padded, so lexical = numeric order),
  * written as a hidden tmp file then atomically renamed into place —
  * readers either see a complete manifest or not at all. Content: a
  * version header, the data and partition schemas (JSON, captured at
  * commit time, so later schema changes never re-infer), then one
  * table-relative data-file path per line. The writer is the table's
  * single maintenance owner, so seq assignment needs no coordination.
  *
  * == Why old snapshots stay readable ==
  * [[graft.operators.DirSwap]] rewrites RETIRE the replaced generation
  * (per-file rename into `<dir>.retired/<leaf>/`) instead of deleting
  * it whenever the table is manifest-maintained, and [[read]] resolves
  * each manifest path through a three-step chain — live directory,
  * `<leaf>.compact-backup` (a swap in flight), `<dir>.retired/<leaf>`
  * (a swap completed) — so the file set of a superseded manifest
  * remains addressable through the whole rewrite lifecycle. Retention
  * is bounded: every [[write]] auto-[[vacuum]]s to the newest
  * `keep` manifests, deleting retired files no kept manifest
  * references (the Delta tombstone-retention role; readers must finish
  * within `keep` maintenance cycles).
  *
  * Partition columns survive: each manifest path's `k=v` directory
  * segments are unescaped and cast to the recorded partition schema
  * (by Spark's own `Cast`), and the snapshot's
  * [[graft.plans.ManifestFileIndex]] evaluates Catalyst's partition
  * filters against those values — partition pruning works on a
  * snapshot exactly as on a live read.
  *
  * == Isolation contract, stated honestly ==
  * Snapshot reads are ATOMIC and CONSISTENT (only complete committed
  * file sets, resolved with zero reader-side mutation) but not
  * WAIT-FREE: resolution happens at plan time, and a rewrite that
  * physically RETIRES the resolved generation between an execution's
  * plan and its last task read can fail that read with a loud
  * `FileNotFoundException` — never wrong or torn rows. Such a reader
  * re-resolves and retries; long-running readers raise [[KeepConf]] so
  * their generation outlives them. (Wait-free snapshot reads require
  * never-moving data files — the pure manifest-table layout that gives
  * up plain-listing compatibility; this library keeps plain
  * `spark.read.parquet` working on the live directory and trades the
  * retirement-window retry for it.) */
object Manifest {

  // v1: header, dataSchema, partSchema, files…
  // v2: header, dataSchema, partSchema, envelope-index signature
  //     (listing string of <dir>.envelopes at commit time, or "-"),
  //     files… — so a snapshot records WHICH generation of the skipping
  //     index described it (self-describing commits; a reader can tell
  //     whether the current index postdates its snapshot)
  private val HeaderV1 = "graft-manifest-v1"
  private val Header = "graft-manifest-v2"

  private[graft] def manifestsPath(dir: String): String =
    dir.stripSuffix("/") + ".manifests"
  private[graft] def retiredPath(dir: String): String =
    dir.stripSuffix("/") + ".retired"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seqOf(name: String): Option[Long] =
    if (name.length > 1 && name.startsWith("m") && name.drop(1).forall(_.isDigit))
      Some(name.drop(1).toLong)
    else None

  /** Largest committed manifest seq, or None for a non-manifest table. */
  def latestSeq(spark: SparkSession, dir: String): Option[Long] = {
    val md = new Path(manifestsPath(dir))
    val fs = fsOf(spark, md)
    if (!fs.exists(md)) None
    else fs.listStatus(md).toSeq.filter(_.isFile)
      .flatMap(s => seqOf(s.getPath.getName)).maxOption
  }

  /** Whether `dir` is manifest-maintained (has at least a manifests
    * dir) — the signal for swap healing to retire rather than delete. */
  private[graft] def isManifested(spark: SparkSession, dir: String): Boolean =
    fsOf(spark, new Path(dir)).exists(new Path(manifestsPath(dir)))

  /** [[listData]] for callers outside this object — the mutation verbs'
    * stray-file guard compares this against the committed snapshot. */
  private[sources] def listLive(spark: SparkSession, dir: String): Seq[String] = {
    val fs = fsOf(spark, new Path(dir))
    listData(fs, fs.makeQualified(new Path(dir)))
  }

  /** Recursive current data-file listing as table-relative paths;
    * skips hidden files/dirs and in-flight `.compact-*` swap siblings
    * (the same exclusions partition discovery applies). */
  private def listData(fs: FileSystem, root: Path): Seq[String] = {
    val rootStr = root.toString
    def walk(p: Path): Seq[FileStatus] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith(".") || n.startsWith("_") || n.contains(".compact-")) Nil
        else if (s.isDirectory) walk(s.getPath)
        else if (n.endsWith(".parquet")) Seq(s)
        else Nil
      }
    walk(root).map { s =>
      val full = s.getPath.toString
      require(full.startsWith(rootStr + "/"),
        s"Manifest: $full not under table root $rootStr")
      full.substring(rootStr.length + 1)
    }
  }

  /** How many manifests (≈ generations) [[write]]'s auto-vacuum keeps
    * readable when the caller does not pass `keep` explicitly. Raise it
    * for long-running cross-process readers: a snapshot must be read to
    * completion within `keep` maintenance cycles. */
  val KeepConf = "spark.graft.manifest.keep"
  private val KeepDefault = 2

  private def confKeep(spark: SparkSession): Int = {
    val k = spark.conf.get(KeepConf, KeepDefault.toString).toInt
    require(k >= 1, s"$KeepConf must be >= 1, got $k")
    k
  }

  /** Commit a new manifest of the table's CURRENT file set, then
    * auto-vacuum to the newest `keep` manifests (bounding retired-file
    * growth to ~`keep` generations forever). `keep = 0` (the default)
    * reads [[KeepConf]]. `schemas`, when the caller already knows the
    * (data, partition) schemas — the streaming sink does — skips the
    * footer-inference read (one less job per micro-batch). Returns the
    * committed seq. Caller must be inside the table's single-writer
    * window (the maintenance verbs call this right after their swap
    * completes). */
  def write(spark: SparkSession, dir: String, keep: Int = 0,
            schemas: Option[(StructType, StructType)] = None): Long = {
    require(keep >= 0, s"Manifest.write: keep must be >= 0 (0 = $KeepConf), got $keep")
    val k = if (keep == 0) confKeep(spark) else keep
    val fs = fsOf(spark, new Path(dir))
    val root = fs.makeQualified(new Path(dir))
    require(fs.exists(root), s"Manifest.write: no table at $dir")
    val files = listData(fs, root).sorted
    require(files.nonEmpty, s"Manifest.write: no data files under $dir")
    val (dataSchema, partSchema) = schemas.getOrElse(schemasOf(spark, dir))
    val seq = latestSeq(spark, dir).getOrElse(-1L) + 1
    val md = new Path(manifestsPath(dir))
    fs.mkdirs(md)
    val tmp = new Path(md, s".tmp-m$seq")
    val out = fs.create(tmp, true)
    try out.write((Seq(Header, dataSchema.json, partSchema.json,
      envelopeSignature(fs, dir)) ++ files)
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fin = new Path(md, f"m$seq%020d")
    require(fs.rename(tmp, fin), s"Manifest.write: could not commit $fin")
    vacuum(spark, dir, k)
    seq
  }

  private def schemasOf(spark: SparkSession, dir: String): (StructType, StructType) = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val fsr = spark.read.parquet(dir).queryExecution.analyzed.collectFirst {
      case r: LogicalRelation if r.relation.isInstanceOf[HadoopFsRelation] =>
        r.relation.asInstanceOf[HadoopFsRelation]
    }.getOrElse(throw new IllegalStateException(s"Manifest: no file relation for $dir"))
    (fsr.dataSchema, fsr.partitionSchema)
  }

  /** The `.envelopes` index dir's listing string at this instant (the
    * same signature [[graft.plans.EnvelopePruneRule]] keys its cache
    * by), or `-` when the table has no index. */
  private def envelopeSignature(fs: FileSystem, dir: String): String = {
    val env = new Path(Layout.envelopesPath(dir))
    if (!fs.exists(env)) "-"
    else fs.listStatus(env).filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",") match { case "" => "-"; case s => s }
  }

  /** One committed snapshot's metadata (the files are table-relative). */
  final case class Info(seq: Long, dataSchema: StructType,
                        partSchema: StructType, envelopeSig: String,
                        files: Seq[String])

  /** Parsed metadata of a committed manifest — `seq` defaults to the
    * latest. `envelopeSig == "-"` means no index existed at commit;
    * comparing it against the current index listing tells a reader
    * whether the skipping index postdates its snapshot. */
  def info(spark: SparkSession, dir: String, seq: Option[Long] = None): Info = {
    val fs = fsOf(spark, new Path(dir))
    val target = seq.orElse(latestSeq(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"Manifest.info: $dir has no committed manifest"))
    parse(fs, dir, target)
  }

  private def parse(fs: FileSystem, dir: String, seq: Long): Info = {
    val p = new Path(manifestsPath(dir), f"m$seq%020d")
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val lines = new String(bytes, StandardCharsets.UTF_8).split("\n", -1).toSeq
    val v2 = lines.headOption.contains(Header)
    require(v2 || lines.headOption.contains(HeaderV1),
      s"Manifest: $p is not a graft manifest file")
    val dataSchema = DataType.fromJson(lines(1)).asInstanceOf[StructType]
    val partSchema = DataType.fromJson(lines(2)).asInstanceOf[StructType]
    val (sig, files) = if (v2) (lines(3), lines.drop(4)) else ("-", lines.drop(3))
    Info(seq, dataSchema, partSchema, sig, files.filter(_.nonEmpty))
  }

  /** Read the snapshot a manifest pins — the latest by default, or an
    * explicit retained `seq`. Plans over EXACTLY the manifested file
    * set through a [[graft.plans.ManifestFileIndex]] (one scan node,
    * real partition pruning, O(manifest) driver state); performs no
    * healing and no mutation of any kind. Fails loudly when a
    * referenced file is at none of live/backup/retired — that means
    * the snapshot was vacuumed away, not that the table is broken. */
  def read(spark: SparkSession, dir: String, seq: Option[Long] = None): DataFrame = {
    val fs = fsOf(spark, new Path(dir))
    val target = seq.orElse(latestSeq(spark, dir)).getOrElse(
      throw new IllegalArgumentException(
        s"Manifest.read: $dir has no committed manifest - not a snapshot-maintained " +
          "table (read it plainly, or run a maintenance verb that commits manifests)"))
    val m = parse(fs, dir, target)
    planOver(spark, dir, m, m.files)
  }

  /** Rows of the files PRESENT in snapshot `toSeq` (default: latest)
    * but ABSENT from snapshot `fromSeq` — FILE-level change-data
    * capture between two commits, the incremental-consumption
    * primitive: a downstream dedup-index update, stats refresh, or
    * export job reads only the delta, never the table. File-level by
    * design: a clustering rewrite rewrites every file, so its delta is
    * the whole table (consumers needing row-level idempotence key on
    * the streaming sink's `batch_id` column on top). Both manifests
    * must still be retained (raise [[KeepConf]] for slow consumers);
    * schemas and resolution follow the `toSeq` commit. */
  def readChanges(spark: SparkSession, dir: String, fromSeq: Long,
                  toSeq: Option[Long] = None): DataFrame = {
    val fs = fsOf(spark, new Path(dir))
    val target = toSeq.orElse(latestSeq(spark, dir)).getOrElse(
      throw new IllegalArgumentException(
        s"Manifest.readChanges: $dir has no committed manifest"))
    require(fromSeq <= target,
      s"Manifest.readChanges: fromSeq $fromSeq is newer than toSeq $target")
    val to = parse(fs, dir, target)
    val from = parse(fs, dir, fromSeq).files.toSet
    planOver(spark, dir, to, to.files.filterNot(from))
  }

  /** The snapshot scan plan over a SUBSET of a commit's files: group by
    * leaf (the parent dir relative to root), resolve each leaf's names
    * with one listing per location actually needed, materialize
    * partition values per leaf. */
  private def planOver(spark: SparkSession, dir: String, m: Info,
                       files: Seq[String]): DataFrame = {
    val fs = fsOf(spark, new Path(dir))
    val root = fs.makeQualified(new Path(dir))
    val byLeaf = files.groupBy { f =>
      val i = f.lastIndexOf('/')
      if (i < 0) "" else f.substring(0, i)
    }
    val tz = Option(spark.conf.get("spark.sql.session.timeZone"))
    def resolveOne(leafRel: String, relPaths: Seq[String])
        : (InternalRow, Seq[FileStatus]) = {
      val names = relPaths.map { f =>
        val i = f.lastIndexOf('/'); if (i < 0) f else f.substring(i + 1)
      }
      (partitionValues(leafRel, m.partSchema, tz),
        resolveLeaf(fs, root, dir, leafRel, names, m.seq))
    }
    // one listing per leaf actually present: parallelize past a handful
    // of leaves — a daily-partitioned year is ~365 dir listings, and on
    // an object-store-backed FS each is a round trip (the same reason
    // InMemoryFileIndex lists in parallel)
    val leafSeq = byLeaf.toSeq.sortBy(_._1)
    val partitions =
      if (leafSeq.size <= 8) leafSeq.map { case (l, ps) => resolveOne(l, ps) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, leafSeq.size))
        try leafSeq.map { case (l, ps) =>
          pool.submit(new java.util.concurrent.Callable[(InternalRow, Seq[FileStatus])] {
            override def call(): (InternalRow, Seq[FileStatus]) = resolveOne(l, ps)
          })
        }.map { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        }
        finally pool.shutdown()
      }
    val index = new graft.plans.ManifestFileIndex(root, m.partSchema, partitions)
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      org.apache.spark.sql.GraftBridge.parquetSnapshotPlan(
        spark, index, m.partSchema, m.dataSchema))
  }

  /** Resolve one leaf's file names through the rewrite lifecycle:
    * live dir → `<leaf>.compact-backup` (swap in flight) →
    * `<dir>.retired/<leaf>` (swap completed, generation retired). */
  private def resolveLeaf(fs: FileSystem, root: Path, dir: String, leafRel: String,
                          names: Seq[String], seq: Long): Seq[FileStatus] = {
    val liveDir = if (leafRel.isEmpty) root else new Path(root, leafRel)
    val backupDir = new Path(liveDir.toString + ".compact-backup")
    val retiredDir =
      if (leafRel.isEmpty) new Path(retiredPath(dir))
      else new Path(retiredPath(dir), leafRel)
    def listing(p: Path): Map[String, FileStatus] =
      if (!fs.exists(p)) Map.empty
      else fs.listStatus(p).filter(_.isFile).map(s => s.getPath.getName -> s).toMap
    val live = listing(liveDir)
    lazy val backup = listing(backupDir)
    lazy val retired = listing(retiredDir)
    names.map { n =>
      live.getOrElse(n, backup.getOrElse(n, retired.getOrElse(n,
        throw new java.io.FileNotFoundException(
          s"snapshot m$seq of $dir references ${if (leafRel.isEmpty) n else s"$leafRel/$n"} " +
            "at none of live/backup/retired - the snapshot was vacuumed away " +
            "(raise Manifest.write's keep, or re-resolve the latest manifest)"))))
    }
  }

  /** Partition values of a `k=v/k=v` leaf path, cast to the recorded
    * partition schema by Spark's own Cast (hive default-partition name
    * maps to null, path-escaping undone by Spark's unescape). */
  private def partitionValues(leafRel: String, partSchema: StructType,
                              tz: Option[String]): InternalRow = {
    if (partSchema.isEmpty) return InternalRow.empty
    val kv = leafRel.split('/').flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) None
      else Some(ExternalCatalogUtils.unescapePathName(seg.take(i)) ->
        ExternalCatalogUtils.unescapePathName(seg.drop(i + 1)))
    }.toMap
    InternalRow.fromSeq(partSchema.fields.toSeq.map { f =>
      kv.get(f.name) match {
        case None => null
        case Some(v) if v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME => null
        case Some(v) => Cast(Literal.create(v, StringType), f.dataType, tz).eval()
      }
    })
  }

  /** Keep the newest `keep` manifests; delete older manifest files and
    * every retired file no kept manifest references. Live files are
    * untouched (the newest manifest references exactly those). Safe to
    * run any time inside the writer's window; [[write]] runs it
    * automatically. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 0): Unit = {
    require(keep >= 0, s"Manifest.vacuum: keep must be >= 0 (0 = $KeepConf), got $keep")
    val k = if (keep == 0) confKeep(spark) else keep
    val fs = fsOf(spark, new Path(dir))
    val md = new Path(manifestsPath(dir))
    if (!fs.exists(md)) return
    val seqs = fs.listStatus(md).toSeq.filter(_.isFile)
      .flatMap(s => seqOf(s.getPath.getName)).sorted.reverse
    val (kept, dropped) = seqs.splitAt(k)
    val referenced: Set[String] = kept.flatMap(s => parse(fs, dir, s).files).toSet
    val rd = new Path(retiredPath(dir))
    if (fs.exists(rd)) {
      val rdStr = fs.makeQualified(rd).toString
      def walk(p: Path): Seq[FileStatus] = fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s)
      }
      walk(rd).foreach { s =>
        val rel = s.getPath.toString.stripPrefix(rdStr + "/")
        if (!referenced.contains(rel)) fs.delete(s.getPath, false)
      }
    }
    dropped.foreach(s => fs.delete(new Path(md, f"m$s%020d"), false))
  }
}
