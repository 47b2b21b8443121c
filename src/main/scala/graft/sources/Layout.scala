package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ZOrderExprs
import graft.operators.DirSwap

/** Multi-dimensional data LAYOUT clustering (Z-order / Morton curve) —
  * the physical-design lever for 100 TB scans that partitioning alone
  * can't provide: a table partitioned by date still reads every file of
  * the matched dates for a `user_id` filter. Rewriting each partition in
  * Z-order over the frequently-filtered columns tightens EVERY clustered
  * column's per-file min/max envelope, so parquet footer stats (and any
  * engine's file-level skipping index) prune files for filters on ANY
  * clustered dimension — a lexicographic sort serves only its leading
  * column.
  *
  * Mechanics: each clustered column is normalized to a `bits`-wide cell
  * coordinate (`bits = 63 / n`) — by LINEAR min/max scaling (one cheap
  * 1-row statistics job, the medianSpanWidth pattern) or by QUANTILE
  * (rank) scaling (`scaling = "quantile"`: one `approxQuantile` pass
  * gives equi-POPULATED cells, recovering skipping power on zipf-skewed
  * columns where linear scaling collapses most rows into a few cells) —
  * then the coordinates are bit-interleaved ([[ZOrderExprs.ZInterleave]],
  * native codegen; quantile cells via [[ZOrderExprs.BucketIndex]], also
  * codegen) and the table is range-repartitioned + sorted on the z-value.
  * One shuffle total, sized by `numPartitions` to the target file size;
  * the z column itself is dropped before write (it is layout, not data).
  *
  * Affects COST only, never results: the rewrite is row-preserving by
  * construction (spec-pinned and oracle-checked — q137/q138 query the
  * clustered copy against oracles over the original). Skew in a column
  * concentrates its cells but cannot break correctness; under the
  * default linear scaling heavily skewed dimensions get fewer effective
  * distinct cells — the honest trade for a single-pass min/max
  * statistic — and `scaling = "quantile"` is the measured fix
  * (LayoutSpec pins the skip-fraction recovery on a zipfian column).
  *
  * NULL ordering: nulls map to cell 0 (they sort first within their
  * dimension), so all-null and mostly-null columns degrade to no-op
  * dimensions rather than errors.
  */
object Layout {

  private val ZCol = "__z"

  /** Raw long/double view of a column for range scaling. Monotone in the
    * column's natural order per type; strings use a 7-BYTE UTF-8 prefix
    * read as a 56-bit integer — monotone in Spark's binary string order
    * for ANY script, because UTF-8 byte order equals code-point order
    * (an ASCII-clamped per-character prefix would collapse every
    * non-ASCII character to one value, flattening the cells of a
    * multilingual corpus to nothing; layout-quality only either way,
    * never correctness). All codegen'd builtins: encode → hex → 14 hex
    * digits zero-padded → conv base-16. */
  private def rawNumeric(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => col(c).cast("double")
      case _: DecimalType    => col(c).cast("double")
      case TimestampType     => unix_micros(col(c)).cast("double")
      case TimestampNTZType  => unix_micros(col(c).cast(TimestampType)).cast("double")
      case DateType          => col(c).cast("int").cast("double")
      case StringType =>
        conv(rpad(substring(hex(encode(col(c), "UTF-8")), 1, 14), 14, "0"),
          16, 10).cast("double")
      case other => throw new IllegalArgumentException(
        s"Layout: cannot z-order column '$c' of type ${other.sql}")
    }
  }

  private def checkCols(df: DataFrame, cols: Seq[String]): Unit = {
    require(cols.nonEmpty && cols.size <= 8,
      s"z-order over 1..8 columns (63 shared bits), got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate z-order columns in $cols")
    cols.foreach(c => require(df.columns.contains(c), s"no column '$c' to z-order by"))
    require(!df.isStreaming, "Layout is a batch table-maintenance primitive (OPTIMIZE-style); " +
      "compact streaming sinks with DirSwap-based maintenance instead")
  }

  /** The z-value column for `df` over `cols` with LINEAR min/max cell
    * scaling. Runs ONE 1-row min/max statistics job over the clustered
    * columns (cost-only, like the interval width statistic); the
    * returned column is then pure codegen'd arithmetic per row. */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    checkCols(df, cols)
    val n = cols.size
    val bits = 63 / n
    val maxCell = (1L << bits) - 1
    val raws = cols.map(c => rawNumeric(df, c))
    val aggs = raws.flatMap(r => Seq(min(r), max(r)))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val cells = raws.zipWithIndex.map { case (r, i) =>
      val (mnIdx, mxIdx) = (2 * i, 2 * i + 1)
      if (stats.isNullAt(mnIdx) || stats.isNullAt(mxIdx)) lit(0L)
      else {
        val mn = stats.getDouble(mnIdx); val mx = stats.getDouble(mxIdx)
        val span = mx - mn
        if (!(span > 0) || !java.lang.Double.isFinite(span)) lit(0L)
        else {
          val scaled = floor((r - lit(mn)) / lit(span) * lit(maxCell.toDouble)).cast("long")
          coalesce(least(lit(maxCell), greatest(lit(0L), scaled)), lit(0L))
        }
      }
    }
    ZOrderExprs.zInterleave(array(cells: _*), bits, n)
  }

  /** The z-value column with QUANTILE (rank) cell scaling: one
    * `approxQuantile` pass (relative error 1e-3) picks up to 255
    * per-column bounds, and each row's cell is its rank among them
    * ([[ZOrderExprs.BucketIndex]], codegen'd binary search) — so a
    * zipf-skewed column still spreads over ~256 equi-populated cells
    * where linear min/max scaling would collapse it. 256 cells per
    * dimension is deliberate: layout clustering targets FILE-level
    * (16..1024 files) envelopes, which 256 distinct cell values
    * saturate; finer cells would only grow the quantile statistic.
    * All-null columns degrade to constant cell 0, like linear. */
  def zValueQuantile(df: DataFrame, cols: Seq[String]): Column = {
    checkCols(df, cols)
    val n = cols.size
    val bits = 63 / n
    val maxCell = (1L << bits) - 1
    val nBounds = math.min(255L, maxCell).toInt
    val probs = (1 to nBounds).map(_.toDouble / (nBounds + 1)).toArray
    val raws = cols.map(c => rawNumeric(df, c))
    val qNames = cols.indices.map(i => s"__graft_q$i")
    val rawDf = df.select(raws.zip(qNames).map { case (r, nm) => r.as(nm) }: _*)
    val bounds = rawDf.stat.approxQuantile(qNames.toArray, probs, 1e-3)
    val cells = raws.zip(bounds).map { case (r, bs) =>
      val distinct = bs.distinct.sorted
      if (distinct.isEmpty) lit(0L) // all-null dimension
      else coalesce(ZOrderExprs.bucketIndex(r, distinct), lit(0L))
    }
    ZOrderExprs.zInterleave(array(cells: _*), bits, n)
  }

  private def zValueFor(df: DataFrame, cols: Seq[String], scaling: String): Column =
    scaling match {
      case "linear"   => zValue(df, cols)
      case "quantile" => zValueQuantile(df, cols)
      case other => throw new IllegalArgumentException(
        s"Layout scaling must be linear|quantile, got '$other'")
    }

  /** Rewrite `df` into global Z-order over `cols`: range-repartition on
    * the z-value (one shuffle; each output partition covers a tight,
    * disjoint z-range) and sort within partitions. `numPartitions` is
    * the output file count — size it to the target file size, NOT to
    * cluster parallelism (at 100 TB run this per table-partition, e.g.
    * per date — [[clusterPartitions]] — exactly like an OPTIMIZE job).
    * `scaling`: `linear` (default) or `quantile` (skew-resistant cells;
    * see [[zValueQuantile]]). */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int,
              scaling: String = "linear"): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    require(!df.columns.contains(ZCol), s"column name $ZCol is reserved by Layout")
    df.withColumn(ZCol, zValueFor(df, cols, scaling))
      .repartitionByRange(numPartitions, col(ZCol))
      .sortWithinPartitions(ZCol)
      .drop(ZCol)
  }

  /** [[cluster]] then write parquet (one file per range partition), then
    * refresh the `<dir>.envelopes` skipping index over the same columns
    * ([[writeEnvelopes]]) so [[prunedRead]] — and the
    * [[graft.plans.EnvelopePruneRule]] auto-pruning of plain
    * `read.filter` scans — work out of the box. */
  def clusterWrite(df: DataFrame, cols: Seq[String], numPartitions: Int, dir: String,
                   scaling: String = "linear"): Unit = {
    cluster(df, cols, numPartitions, scaling).write.mode("overwrite").parquet(dir)
    writeEnvelopes(df.sparkSession, dir, cols)
  }

  /** Per-leaf-partition OPTIMIZE: rewrite EVERY leaf directory of a
    * (possibly hive-partitioned) parquet table into Z-order over `cols`
    * independently — cell bounds are computed per partition, so each
    * date's files get tight local envelopes — then refresh ONE
    * table-level `.envelopes` index over `cols ++ indexCols` (pass the
    * partition columns in `indexCols` to let [[prunedRead]] prune whole
    * partitions through the same index). Each leaf is rewritten through
    * the crash-safe [[DirSwap]] (write tmp → swap), so an interruption
    * leaves every partition complete under its live or backup name —
    * heal with [[readHealed]]. WRITER-EXCLUSIVE contract: one
    * maintenance process at a time, but cross-process READERS are fine
    * as long as they go through [[readSnapshot]] — every run commits a
    * [[Manifest]] of the finished layout, and (from the second run on)
    * retires the replaced generation instead of deleting it, so a
    * snapshot reader racing the rewrite sees only the old or the new
    * complete file set, never a half-swapped mix. Plain listing-based
    * readers (`spark.read.parquet`) remain same-process-only: they can
    * observe the in-flight `<leaf>.compact-*` siblings.
    *
    * At 100 TB this is the nightly layout job: the per-leaf loop is
    * embarrassingly parallel across partitions — `parallelism` > 1 runs
    * that many leaves' rewrite JOBS concurrently from a driver-side
    * thread pool (each swap touches only its own directory, and a
    * single leaf's small job rarely fills the cluster; the scheduler
    * interleaves them). `filesPerPartition` sizes files per partition
    * rather than per table. A failing leaf fails the call after the
    * in-flight leaves finish — every completed leaf is already swapped
    * and consistent, the failed one is healed by [[readHealed]]. */
  def clusterPartitions(spark: SparkSession, dir: String, cols: Seq[String],
                        filesPerPartition: Int, scaling: String = "linear",
                        indexCols: Seq[String] = Nil, parallelism: Int = 1): Unit = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"clusterPartitions: no table at $dir")
    // retire replaced generations once the table is manifest-maintained
    // (every run commits one below, so that's from the second run on —
    // the first run has no prior snapshot to preserve)
    val manifested = Manifest.isManifested(spark, dir)
    val qualRoot = fs.makeQualified(root).toString
    def leafRel(leaf: org.apache.hadoop.fs.Path): String = {
      val full = fs.makeQualified(leaf).toString
      if (full == qualRoot) "" else full.stripPrefix(qualRoot + "/")
    }
    def retireTarget(leaf: org.apache.hadoop.fs.Path): Option[String] =
      if (!manifested) None
      else Some(leafRel(leaf) match {
        case ""  => Manifest.retiredPath(dir)
        case rel => Manifest.retiredPath(dir) + "/" + rel
      })
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val subDirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        .filterNot(d => d.getName.startsWith(".") || d.getName.startsWith("_"))
        .filterNot(d => d.getName.contains(".compact-")).toSeq
      if (subDirs.isEmpty) Seq(p) else subDirs.flatMap(leaves)
    }
    def rewriteLeaf(leaf: org.apache.hadoop.fs.Path): Unit =
      if (fs.listStatus(leaf).exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
        DirSwap.swapRewrite(spark, leaf.toString, retireTarget(leaf))(
          cluster(_, cols, filesPerPartition, scaling))(
          (d, out) => d.write.mode("overwrite").parquet(out))
    val work = leaves(root)
    if (parallelism == 1 || work.size <= 1) work.foreach(rewriteLeaf)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, work.size))
      try {
        val futures = work.map { leaf =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = rewriteLeaf(leaf)
          })
        }
        // propagate the FIRST failure, but only after every submitted
        // leaf resolved — no leaf is left mid-swap by a sibling's error
        futures.flatMap(f => scala.util.Try(f.get()).failed.toOption)
          .headOption.foreach {
            case e: java.util.concurrent.ExecutionException => throw e.getCause
            case e => throw e
          }
      } finally pool.shutdown()
    }
    writeEnvelopes(spark, dir, (cols ++ indexCols).distinct)
    // commit the finished layout as a manifest snapshot: cross-process
    // readers resolve this (or the previous, still-resolvable) complete
    // file set through readSnapshot, never a half-swapped listing
    Manifest.write(spark, dir)
    ()
  }

  /** Per-FILE statistics of `cols` for a written table — min/max plus a
    * null count per column (the Delta-stats triple: `nulls_c == rows`
    * proves a file can never satisfy a box predicate, since SQL
    * comparisons reject nulls). The same statistics a file-skipping
    * index (or parquet footer pruning at row-group grain) consults,
    * surfaced as a DataFrame for measurement and for PLANS.md evidence.
    * Distributed: one scan, one row per file. Partitioned dirs work —
    * partition columns are part of the scanned schema, so indexing them
    * gives per-file envelopes that prune whole partitions. */
  def fileEnvelopes(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(dir)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), cols.flatMap(envAggs(df)): _*)
  }

  /** The per-column envelope aggregates: min/max/null-count always, plus
    * a per-file SUM for integral columns (float/double sums are
    * order-dependent and decimal sums widen their intermediate type, so
    * neither is stored). `try_sum`, not `sum`: an epoch-microsecond
    * column at production file sizes overflows a per-file long sum, and
    * under ANSI mode a plain sum would fail the whole INDEX BUILD for a
    * stat most queries never use. try_sum stores NULL for exactly the
    * overflowed files — [[graft.plans.EnvelopeAggRule]]'s soundness
    * probe then declines sum rewrites on that table (and only sum
    * rewrites) while min/max/count stay index-answerable. */
  private def envAggs(df: DataFrame)(c: String): Seq[Column] = {
    val base = Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        base :+ try_sum(col(c)).as(s"sum_$c")
      case _ => base
    }
  }

  /** Persist [[fileEnvelopes]] next to the table (`<dir>.envelopes`) —
    * the file-level skipping index [[prunedRead]] consults (the
    * Delta-stats / Iceberg-manifest role, as a plain parquet table). One
    * scan of the table; overwrite-mode (tiny output, one writer: the
    * layout job that just rewrote the table owns this too). */
  def writeEnvelopes(spark: SparkSession, dir: String, cols: Seq[String]): Unit =
    fileEnvelopes(spark, dir, cols).coalesce(1)
      .write.mode("overwrite").parquet(envelopesPath(dir))

  private[graft] def envelopesPath(dir: String): String =
    dir.stripSuffix("/") + ".envelopes"

  /** Append envelope rows for SPECIFIC files (a streaming sink's fresh
    * batch) to an existing index — incremental maintenance so
    * [[prunedRead]] can skip even files appended since the last full
    * rewrite. One bounded scan of just those files. Crash between the
    * data write and this append leaves the files unindexed →
    * [[prunedRead]] reads them unconditionally (exactness unaffected);
    * a replayed append can leave DUPLICATE index rows for a file —
    * harmless (both rows carry the same envelope, so the skip decision
    * is unchanged) and healed by the next full [[writeEnvelopes]]. */
  def appendEnvelopes(spark: SparkSession, dir: String, files: Seq[String],
                      cols: Seq[String]): Unit = {
    if (files.isEmpty) return
    val df = spark.read.parquet(files: _*)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), cols.flatMap(envAggs(df)): _*)
      .coalesce(1)
      .write.mode("append").parquet(envelopesPath(dir))
  }

  /** The per-file MISS predicate over an envelope table for a box
    * `lo_i <= col_i <= hi_i`: true when the file PROVABLY holds no
    * matching row — its range misses the box on some dimension, or
    * (when the index carries null counts; older indexes may not) every
    * value of a boxed column is null (null fails any SQL comparison).
    * Shared by [[prunedRead]], [[skippableFileFraction]], and the
    * optimizer rule ([[graft.plans.EnvelopePruneRule]] builds the same
    * shape from extracted conjuncts). */
  private[graft] def boxMiss(envColumns: Seq[String], box: Seq[(String, Any, Any)]): Column =
    box.map { case (c, lo, hi) =>
      val range = col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)
      if (envColumns.contains(s"nulls_$c")) range || (col(s"nulls_$c") === col("rows"))
      else range
    }.reduce(_ || _)

  /** Normalized path form for matching `input_file_name()` /
    * `inputFiles` spellings (file:/ vs file:///) against each other. */
  private[graft] def normPath(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  /** Read `dir` with FILE-LEVEL skipping: files whose persisted envelope
    * PROVES the box predicate `lo_i <= col_i <= hi_i` cannot match are
    * never opened — not even their footers (row-group pruning still
    * applies inside the files that are read). EXACT regardless of index
    * staleness, by construction: the skip set is
    * `currentFiles ∩ {envelope proves miss}`, so a file appended after
    * the index was written (absent from it) is always read, and an
    * indexed file that was since rewritten away is simply not in the
    * listing. The caller still applies its own predicate — this prunes
    * I/O, never rows. With no index present, every file is read.
    *
    * The skip-set decision job runs once on the DRIVER over the BOUNDED
    * index table (one row per file); the read itself then keeps the
    * relation's ORIGINAL FileIndex wrapped in a delegating skipping view
    * ([[graft.plans.SkippingFileIndex]], the same class the optimizer
    * rule plants) — an O(1) driver-side relation spec at ANY file count
    * (never an explicit kept-path list, which on a million-file table
    * would mean a million-element relation spec and a fresh listing),
    * with partition discovery preserved. HIVE-PARTITIONED dirs compose:
    * partition columns come from the original index's discovery, a box
    * on an INDEXED partition column prunes through the envelope like any
    * other dimension, and a filter the caller applies on an UNINDEXED
    * partition column still partition-prunes the normal Catalyst way
    * (the wrapper passes partition filters straight through). */
  def prunedRead(spark: SparkSession, dir: String,
                 box: Seq[(String, Any, Any)]): DataFrame = {
    require(box.nonEmpty, "prunedRead needs at least one box predicate")
    val all = spark.read.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(envelopesPath(dir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(envelopesPath(dir)))) return all
    val env = spark.read.parquet(envelopesPath(dir))
    val needed = box.map(_._1).flatMap(c => Seq(s"min_$c", s"max_$c"))
    if (!needed.forall(env.columns.contains)) return all // index over other columns
    // driver-side: one row per file of a BOUNDED index table (file count).
    // Compare by normalized path — input_file_name() and inputFiles
    // render the scheme differently (file:/// vs file:/), and a silent
    // mismatch here would skip NOTHING, a perf bug the spec pins.
    val skip = env.filter(boxMiss(env.columns.toSeq, box))
      .select("file").collect().map(r => normPath(r.getString(0))).toSet
    if (skip.isEmpty) return all
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val pruned = all.queryExecution.analyzed.transform {
      case rel: LogicalRelation if rel.relation.isInstanceOf[HadoopFsRelation] =>
        val fsr = rel.relation.asInstanceOf[HadoopFsRelation]
        rel.copy(relation = fsr.copy(
          location = new graft.plans.SkippingFileIndex(fsr.location, skip))(fsr.sparkSession))
    }
    org.apache.spark.sql.GraftBridge.ofRows(spark, pruned)
  }

  /** SNAPSHOT read of a manifest-maintained table: resolve the latest
    * committed [[Manifest]] (or a pinned `seq`) and plan over exactly
    * that file set — the sanctioned CROSS-PROCESS reader for tables a
    * [[clusterPartitions]] loop or the streaming self-clustering sink
    * maintains. A reader racing a rewrite sees only the old or the new
    * complete set, never a half-swapped mix or a torn half-committed
    * batch, and performs no healing or mutation of any kind (healing
    * stays the writer's job). Retention: superseded snapshots stay
    * resolvable for `keep` maintenance cycles ([[Manifest.write]]'s
    * auto-vacuum, default 2). */
  def readSnapshot(spark: SparkSession, dir: String,
                   seq: Option[Long] = None): DataFrame =
    Manifest.read(spark, dir, seq)

  /** FILE-level change-data capture between two committed snapshots:
    * rows of the files present in `toSeq` (default: latest) but absent
    * from `fromSeq` — see [[Manifest.readChanges]]. The incremental
    * consumption primitive for downstream jobs (index updates, stats
    * refresh) that must not rescan the table each cycle. */
  def readChanges(spark: SparkSession, dir: String, fromSeq: Long,
                  toSeq: Option[Long] = None): DataFrame =
    Manifest.readChanges(spark, dir, fromSeq, toSeq)

  /** Read a swap-maintained table AFTER healing any interrupted
    * [[DirSwap]] state — the sanctioned SAME-PROCESS reader entry point
    * when reader and maintenance take turns in one process (healing
    * MUTATES swap state, so it must never race the writer; a
    * cross-process reader uses [[readSnapshot]] instead, which heals
    * nothing). Heals, in order: the table dir itself, any
    * `<leaf>.compact-*` partition swap left mid-flight, and the
    * `.envelopes` index dir — each via [[DirSwap.recover]]'s
    * deterministic state machine — then reads. On a manifest-maintained
    * table, healing COMPLETES a crashed retirement instead of deleting
    * the backup, so older snapshots stay resolvable. */
  def readHealed(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifested = Manifest.isManifested(spark, dir)
    val qualRoot = fs.makeQualified(root).toString
    def retireTarget(livePath: String): Option[String] =
      if (!manifested) None
      else {
        val full = fs.makeQualified(new org.apache.hadoop.fs.Path(livePath)).toString
        val rel = if (full == qualRoot) "" else full.stripPrefix(qualRoot + "/")
        Some(if (rel.isEmpty) Manifest.retiredPath(dir)
             else Manifest.retiredPath(dir) + "/" + rel)
      }
    DirSwap.recover(spark, dir, retireTarget(dir))
    def heal(p: org.apache.hadoop.fs.Path): Unit =
      if (fs.exists(p)) fs.listStatus(p).filter(_.isDirectory).map(_.getPath).foreach { d =>
        val name = d.getName
        if (name.endsWith(".compact-backup") || name.endsWith(".compact-tmp")) {
          val live = new org.apache.hadoop.fs.Path(p,
            name.stripSuffix(".compact-backup").stripSuffix(".compact-tmp")).toString
          DirSwap.recover(spark, live, retireTarget(live))
        } else heal(d)
      }
    heal(root)
    DirSwap.recover(spark, envelopesPath(dir))
    spark.read.parquet(dir)
  }

  /** Fraction of FILES a box predicate `lo_i <= col_i <= hi_i` can skip,
    * judged purely from [[fileEnvelopes]] — the scale metric that
    * justifies the rewrite (at 100 TB, skipped files are never opened).
    * Two tiny aggregate jobs over the per-file envelope table. */
  def skippableFileFraction(spark: SparkSession, dir: String,
                            box: Seq[(String, Any, Any)]): Double = {
    val env = fileEnvelopes(spark, dir, box.map(_._1))
    val misses = boxMiss(env.columns.toSeq, box)
    val row = env.agg(count(lit(1)), sum(when(misses, 1L).otherwise(0L))).head()
    val total = row.getLong(0)
    if (total == 0) 0.0 else row.getLong(1).toDouble / total
  }
}
