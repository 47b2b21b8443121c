package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ZOrderExprs

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
  * coordinate (`bits = 63 / n`) by linear min/max scaling — one cheap
  * 1-row statistics job, the medianSpanWidth pattern — then the
  * coordinates are bit-interleaved ([[ZOrderExprs.ZInterleave]], native
  * codegen) and the table is range-repartitioned + sorted on the z-value.
  * One shuffle total, sized by `numPartitions` to the target file size;
  * the z column itself is dropped before write (it is layout, not data).
  *
  * Affects COST only, never results: the rewrite is row-preserving by
  * construction (spec-pinned and oracle-checked — q137/q138 query the
  * clustered copy against oracles over the original). Skew in a column
  * concentrates its cells but cannot break correctness; heavily skewed
  * dimensions get fewer effective distinct cells (linear scaling, not
  * rank scaling — the honest trade for a single-pass statistic).
  *
  * NULL ordering: nulls map to cell 0 (they sort first within their
  * dimension), so all-null and mostly-null columns degrade to no-op
  * dimensions rather than errors.
  */
object Layout {

  private val ZCol = "__z"

  /** Raw long/double view of a column for range scaling. Monotone in the
    * column's natural order per type; strings use an 8-byte clamped
    * ASCII prefix (monotone for ASCII text, coarse for non-ASCII — a
    * layout-quality trade, never a correctness one). */
  private def rawNumeric(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => col(c).cast("double")
      case _: DecimalType    => col(c).cast("double")
      case TimestampType     => unix_micros(col(c)).cast("double")
      case TimestampNTZType  => unix_micros(col(c).cast(TimestampType)).cast("double")
      case DateType          => col(c).cast("int").cast("double")
      case StringType =>
        (1 to 8).map(i =>
          least(coalesce(ascii(substring(col(c), i, 1)), lit(0)), lit(255)).cast("double") *
            lit(math.pow(256.0, (8 - i).toDouble))).reduce(_ + _)
      case other => throw new IllegalArgumentException(
        s"Layout: cannot z-order column '$c' of type ${other.sql}")
    }
  }

  /** The z-value column for `df` over `cols`. Runs ONE 1-row min/max
    * statistics job over the clustered columns (cost-only, like the
    * interval width statistic); the returned column is then pure
    * codegen'd arithmetic per row. */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 8,
      s"z-order over 1..8 columns (63 shared bits), got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate z-order columns in $cols")
    cols.foreach(c => require(df.columns.contains(c), s"no column '$c' to z-order by"))
    require(!df.isStreaming, "Layout is a batch table-maintenance primitive (OPTIMIZE-style); " +
      "compact streaming sinks with DirSwap-based maintenance instead")
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

  /** Rewrite `df` into global Z-order over `cols`: range-repartition on
    * the z-value (one shuffle; each output partition covers a tight,
    * disjoint z-range) and sort within partitions. `numPartitions` is
    * the output file count — size it to the target file size, NOT to
    * cluster parallelism (at 100 TB run this per table-partition, e.g.
    * per date, exactly like an OPTIMIZE job). */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    require(!df.columns.contains(ZCol), s"column name $ZCol is reserved by Layout")
    df.withColumn(ZCol, zValue(df, cols))
      .repartitionByRange(numPartitions, col(ZCol))
      .sortWithinPartitions(ZCol)
      .drop(ZCol)
  }

  /** [[cluster]] then write parquet (one file per range partition), then
    * refresh the `<dir>.envelopes` skipping index over the same columns
    * ([[writeEnvelopes]]) so [[prunedRead]] works out of the box. */
  def clusterWrite(df: DataFrame, cols: Seq[String], numPartitions: Int, dir: String): Unit = {
    cluster(df, cols, numPartitions).write.mode("overwrite").parquet(dir)
    writeEnvelopes(df.sparkSession, dir, cols)
  }

  /** Per-FILE min/max envelopes of `cols` for a written table — the same
    * statistics a file-skipping index (or parquet footer pruning at
    * row-group grain) consults, surfaced as a DataFrame for measurement
    * and for PLANS.md evidence. Distributed: one scan, one row per file. */
  def fileEnvelopes(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(dir)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
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
    * a later full [[writeEnvelopes]] (overwrite) resets the index. */
  def appendEnvelopes(spark: SparkSession, dir: String, files: Seq[String],
                      cols: Seq[String]): Unit = {
    if (files.isEmpty) return
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
      .coalesce(1)
      .write.mode("append").parquet(envelopesPath(dir))
  }

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
    * The listing + anti-join run on the DRIVER over the file list — the
    * same O(files) cost every parquet read's FileIndex already pays.
    * FLAT tables only (what [[clusterWrite]] and the streaming
    * self-clustering sink produce): reading an explicit file list cannot
    * reconstruct hive-partition directory columns. */
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
    val misses = box.map { case (c, lo, hi) =>
      col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)
    }.reduce(_ || _)
    // driver-side: one row per file of a BOUNDED index table (file count).
    // Compare by normalized path — input_file_name() and inputFiles
    // render the scheme differently (file:/// vs file:/), and a silent
    // mismatch here would skip NOTHING, a perf bug the spec pins.
    def norm(s: String): String = new org.apache.hadoop.fs.Path(s).toUri.getPath
    val skip = env.filter(misses).select("file").collect().map(r => norm(r.getString(0))).toSet
    val keep = all.inputFiles.filterNot(f => skip.contains(norm(f)))
    if (keep.isEmpty) all.limit(0)
    else spark.read.schema(all.schema).parquet(keep.toSeq: _*)
  }

  /** Fraction of FILES a box predicate `lo_i <= col_i <= hi_i` can skip,
    * judged purely from [[fileEnvelopes]] — the scale metric that
    * justifies the rewrite (at 100 TB, skipped files are never opened).
    * Two tiny aggregate jobs over the per-file envelope table. */
  def skippableFileFraction(spark: SparkSession, dir: String,
                            box: Seq[(String, Any, Any)]): Double = {
    val env = fileEnvelopes(spark, dir, box.map(_._1))
    val misses = box.map { case (c, lo, hi) =>
      col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)
    }.reduce(_ || _)
    val row = env.agg(count(lit(1)), sum(when(misses, 1L).otherwise(0L))).head()
    val total = row.getLong(0)
    if (total == 0) 0.0 else row.getLong(1).toDouble / total
  }
}
