package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderExprs

/** Z-order layout: the interleave expression's exact bit semantics, the
  * rewrite's row preservation, and the property that justifies it — a
  * z-ordered table's per-file envelopes let a box predicate on EITHER
  * dimension skip files, where a lexicographic sort serves only its
  * leading column. */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("ZInterleave: exact Morton bits, MSB-first round-robin") {
    // 2 fields x 2 bits: (a1 a0, b1 b0) -> a1 b1 a0 b0
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
      .select(ZOrderExprs.zInterleave(array($"a", $"b"), bits = 2, n = 2).as("z"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 2L, 1L, 15L, 9L))
    // codegen and interpreted agree (eval() is exercised via a literal fold)
    val lit3 = ZOrderExprs.zInterleave(array(lit(3L), lit(3L)), bits = 2, n = 2)
    assert(spark.range(1).select(lit3.as("z")).as[Long].head() == 15L)
  }

  test("ZInterleave: null element and short array yield null") {
    val df = Seq((Some(1L), Some(1L)), (None, Some(1L))).toDF("a", "b")
      .select(ZOrderExprs.zInterleave(array($"a", $"b"), bits = 4, n = 2).as("z"))
    assert(df.as[Option[Long]].collect().toSeq == Seq(Some(3L), None))
    val short = spark.range(1)
      .select(ZOrderExprs.zInterleave(array(lit(1L)), bits = 4, n = 2).as("z"))
    assert(short.as[Option[Long]].head().isEmpty)
  }

  test("cluster() preserves rows exactly and drops the working column") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 7919 % 1000).toLong, s"r$i"))
      .toDF("x", "y", "tag")
    val out = Layout.cluster(df, Seq("x", "y"), numPartitions = 8)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.collect().toSet == df.collect().toSet)
  }

  test("zValue handles nulls, constant and all-null dimensions, strings, timestamps") {
    val df = Seq(
      (Some(1L), "alpha", Some(5L)),
      (None, "omega", Some(5L)),
      (Some(100L), null.asInstanceOf[String], Some(5L)),
      (Some(50L), "beta", None)
    ).toDF("x", "s", "const")
    // const has span 0 -> cell 0 everywhere; nulls -> cell 0: all defined
    val got = df.select(Layout.zValue(df, Seq("x", "s", "const")).as("z"))
      .as[Long].collect()
    assert(got.length == 4)
    val ts = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-06-01 00:00:00")).toDF("t")
    assert(ts.select(Layout.zValue(ts, Seq("t")).as("z")).as[Long].collect().distinct.length == 2)
  }

  test("graft_zorder_cluster: the pure-SQL layout rewrite preserves rows and feeds a skipping write") {
    graft.GraftTableFunctions.ensure(spark)
    val rnd = new scala.util.Random(11)
    val df = (1 to 20000).map(_ => (rnd.nextInt(512).toLong, rnd.nextInt(512).toLong))
      .toDF("x", "y")
    df.createOrReplaceTempView("layout_tvf_in")
    val clustered = spark.sql("SELECT * FROM graft_zorder_cluster('layout_tvf_in', 'x,y', 8)")
    assert(clustered.collect().toSet == df.collect().toSet)
    // the write CONSUMING the TVF plan inherits the layout: both
    // dimensions skippable on disk (the CTAS / INSERT OVERWRITE path)
    val out = Files.createTempDirectory("layout-tvf").resolve("t").toString
    clustered.write.parquet(out)
    assert(Layout.skippableFileFraction(spark, out, Seq(("x", 50L, 81L))) > 0.3)
    assert(Layout.skippableFileFraction(spark, out, Seq(("y", 50L, 81L))) > 0.3)
    // the optional scaling argument reaches Layout: quantile preserves
    // rows too, and a bad scaling name fails loudly at analysis
    val qnt = spark.sql("SELECT * FROM graft_zorder_cluster('layout_tvf_in', 'x,y', 8, 'quantile')")
    assert(qnt.collect().toSet == df.collect().toSet)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_zorder_cluster('layout_tvf_in', 'x,y', 8, 'nope')").collect()
    }
  }

  test("prunedRead: indexed files are truly not opened; stale and missing indexes stay exact") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 30000).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("layout-pruned").resolve("t").toString
    Layout.clusterWrite(df, Seq("x", "y"), 16, dir) // writes the .envelopes index too
    val box = Seq(("x", 100L, 163L), ("y", 100L, 163L))
    val want = df.filter($"x".between(100L, 163L) && $"y".between(100L, 163L))
      .collect().toSet
    val pruned = Layout.prunedRead(spark, dir, box)
    // the skip is REAL: fewer input files than the full table (this also
    // pins the file:/ vs file:/// path-normalization, whose silent
    // mismatch would skip nothing)
    assert(pruned.inputFiles.length < spark.read.parquet(dir).inputFiles.length,
      s"prunedRead opened all ${pruned.inputFiles.length} files - nothing skipped")
    assert(pruned.filter($"x".between(100L, 163L) && $"y".between(100L, 163L))
      .collect().toSet == want)
    // the relation spec stays O(1) at any file count: the ORIGINAL
    // FileIndex wrapped in the delegating skipping view, a single root
    // path — never an explicit kept-path list (which on a million-file
    // table would be a million-element relation spec on the driver)
    val prunedRel = pruned.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
    }.get
    assert(prunedRel.location.getClass.getSimpleName == "SkippingFileIndex",
      s"prunedRead no longer rides the delegating index: ${prunedRel.location.getClass}")
    assert(prunedRel.location.rootPaths.map(_.toUri.getPath) ==
      Seq(new org.apache.hadoop.fs.Path(dir).toUri.getPath))
    // staleness: a file appended AFTER the index exists is always read
    Seq((120L, 120L)).toDF("x", "y").write.mode("append").parquet(dir)
    val afterAppend = Layout.prunedRead(spark, dir, box)
      .filter($"x" === 120L && $"y" === 120L).count()
    assert(afterAppend >= 1L, "a post-index append was wrongly skipped")
    // a box over unindexed columns falls back to the full read
    assert(Layout.prunedRead(spark, dir, Seq(("nope", 0L, 1L))).count() == 30001L)
    // no index at all -> full read
    val plain = Files.createTempDirectory("layout-noidx").resolve("t").toString
    df.write.parquet(plain)
    assert(Layout.prunedRead(spark, plain, box).count() == 30000L)
    // every file provably missing -> empty result, same schema
    val none = Layout.prunedRead(spark, dir, Seq(("x", 5000L, 6000L)))
    assert(none.columns.toSeq == spark.read.parquet(dir).columns.toSeq)
    // the pure-SQL face: graft_pruned_read with (col, lo, hi) triples
    graft.GraftTableFunctions.ensure(spark)
    val viaTf = spark.sql(
      s"SELECT * FROM graft_pruned_read('$dir', 'x', 100, 163, 'y', 100, 163)")
    assert(viaTf.inputFiles.length == pruned.inputFiles.length ||
      viaTf.inputFiles.length < spark.read.parquet(dir).inputFiles.length)
    val wantNow = spark.read.parquet(dir)
      .filter($"x".between(100L, 163L) && $"y".between(100L, 163L)).collect().toSet
    assert(viaTf.filter($"x".between(100L, 163L) && $"y".between(100L, 163L))
      .collect().toSet == wantNow)
    intercept[Exception] { // malformed triple list fails loudly
      spark.sql(s"SELECT * FROM graft_pruned_read('$dir', 'x', 100)").collect()
    }
  }

  test("UTF-8 string cells: a non-ASCII column still gets monotone cells and real skipping") {
    // keys are PURELY multi-byte (Cyrillic): an ASCII-clamped prefix
    // would collapse every key to one cell (zero skipping); the UTF-8
    // byte prefix must keep them monotone in Spark's binary string order
    val letters = ('а' to 'я').toVector // U+0430..U+044F, 32 letters
    val rnd = new scala.util.Random(29)
    val df = (1 to 4000).map { _ =>
      val l = letters(rnd.nextInt(letters.size))
      (l.toString * 8, rnd.nextInt(100).toLong)
    }.toDF("s", "v")
    val dir = Files.createTempDirectory("layout-utf8").resolve("t").toString
    Layout.clusterWrite(df, Seq("s"), 8, dir)
    // rows preserved exactly (layout never changes data)
    assert(spark.read.parquet(dir).collect().toSet == df.collect().toSet)
    // a 4-letter box out of 32 should skip most of the 8 files
    val lo = letters(8).toString * 8
    val hi = letters(11).toString * 8
    val frac = Layout.skippableFileFraction(spark, dir, Seq(("s", lo, hi)))
    assert(frac >= 0.5, s"non-ASCII skipping fraction only $frac - string cells not monotone")
    // and the skip is exact through prunedRead
    val pruned = Layout.prunedRead(spark, dir, Seq(("s", lo, hi)))
    assert(pruned.filter($"s".between(lo, hi)).collect().toSet ==
      df.filter($"s".between(lo, hi)).collect().toSet)
  }

  test("BucketIndex: exact rank cells, codegen/interpreted parity, null in -> null out") {
    val bounds = Array(1.0, 2.0, 3.0)
    val vals = Seq(Some(0.5), Some(1.0), Some(2.5), Some(3.0), Some(9.9), None)
    val want = Seq(Some(0L), Some(1L), Some(2L), Some(3L), Some(3L), None)
    // codegen path: a real column through whole-stage codegen
    val viaCol = vals.toDF("v")
      .select(ZOrderExprs.bucketIndex($"v", bounds).as("c")).as[Option[Long]]
      .collect().toSeq
    assert(viaCol == want)
    // interpreted path: literal input constant-folds through eval()
    val viaLit = vals.map(v =>
      spark.range(1).select(ZOrderExprs.bucketIndex(
        v.map(lit(_)).getOrElse(lit(null).cast("double")), bounds).as("c"))
        .as[Option[Long]].head())
    assert(viaLit == want, "codegen and interpreted BucketIndex disagree")
  }

  test("quantile scaling recovers file skipping on a zipf-skewed column; rows preserved") {
    // x is log-uniform over [1, 1e6]: half the mass sits in the first
    // 0.1% of the LINEAR cell range, so linear scaling degenerates — the
    // dense files' z-values are ordered by y alone and a small-x box
    // cannot skip them. Quantile cells are equi-populated by
    // construction, so the same box spans a real fraction of cell space.
    val rnd = new scala.util.Random(17)
    val df = (1 to 40000).map { _ =>
      (math.exp(rnd.nextDouble() * math.log(1e6)).toLong, rnd.nextInt(1024).toLong)
    }.toDF("x", "y")
    val base = Files.createTempDirectory("layout-quantile").toString
    Layout.clusterWrite(df, Seq("x", "y"), 16, s"$base/lin", scaling = "linear")
    Layout.clusterWrite(df, Seq("x", "y"), 16, s"$base/qnt", scaling = "quantile")
    assert(spark.read.parquet(s"$base/qnt").collect().toSet == df.collect().toSet,
      "quantile clustering must preserve rows exactly")
    val box = Seq(("x", 1L, 8L)) // ~15% of rows, ~0.0008% of the linear range
    val lin = Layout.skippableFileFraction(spark, s"$base/lin", box)
    val qnt = Layout.skippableFileFraction(spark, s"$base/qnt", box)
    assert(qnt > lin + 0.15, s"quantile ($qnt) should out-skip linear ($lin) on skew")
    assert(qnt > 0.5, s"quantile skip fraction too weak: $qnt")
    intercept[IllegalArgumentException](Layout.cluster(df, Seq("x"), 4, scaling = "nope"))
  }

  test("clusterPartitions: per-leaf OPTIMIZE on a two-date table; partition prune + file skip compose") {
    val rnd = new scala.util.Random(29)
    val df = (1 to 20000).map { i =>
      (if (i % 2 == 0) "2024-01-01" else "2024-01-02",
        rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
    }.toDF("d", "x", "y")
    val dir = Files.createTempDirectory("layout-parts").resolve("t").toString
    df.write.partitionBy("d").parquet(dir)
    Layout.clusterPartitions(spark, dir, Seq("x", "y"),
      filesPerPartition = 4, indexCols = Seq("d"))
    // every leaf was rewritten to its target file count; rows exact
    // (d reads back as a DATE via partition-type inference - cast to compare)
    val back = spark.read.parquet(dir)
    assert(back.select($"d".cast("string"), $"x", $"y").collect().toSet == df.collect().toSet)
    assert(back.inputFiles.length == 8, s"expected 4 files x 2 dates, got ${back.inputFiles.length}")
    // envelope skipping inside partitions: a box on x keeps < 8 files
    val boxed = Layout.prunedRead(spark, dir, Seq(("x", 100L, 163L)))
    assert(boxed.inputFiles.length < 8, "no envelope skipping inside partitions")
    assert(boxed.filter($"x".between(100L, 163L)).collect().toSet ==
      back.filter($"x".between(100L, 163L)).collect().toSet)
    // composed: the indexed partition column prunes whole dates through
    // the same index, and the partition column SURVIVES the pruned read
    val oneDate = Layout.prunedRead(spark, dir,
      Seq(("d", "2024-01-01", "2024-01-01"), ("x", 100L, 163L)))
    assert(oneDate.inputFiles.forall(_.contains("d=2024-01-01")),
      "the indexed partition column did not prune the other date's files")
    assert(oneDate.filter($"d" === "2024-01-01" && $"x".between(100L, 163L)).count() ==
      back.filter($"d" === "2024-01-01" && $"x".between(100L, 163L)).count())
    // a caller filter on the partition column still partition-prunes the
    // kept-file relation the normal Catalyst way (basePath keeps d real)
    assert(boxed.filter($"d" === "2024-01-02").select($"d".cast("string")).distinct()
      .as[String].collect().toSeq == Seq("2024-01-02"))
  }

  test("clusterPartitions parallelism: concurrent leaf rewrites, identical outcome") {
    val rnd = new scala.util.Random(53)
    val df = (1 to 12000).map { i =>
      (s"p${i % 3}", rnd.nextInt(512).toLong, rnd.nextInt(512).toLong)
    }.toDF("p", "x", "y")
    val dir = Files.createTempDirectory("layout-par").resolve("t").toString
    df.write.partitionBy("p").parquet(dir)
    Layout.clusterPartitions(spark, dir, Seq("x", "y"),
      filesPerPartition = 4, indexCols = Seq("p"), parallelism = 4)
    val back = spark.read.parquet(dir)
    assert(back.select($"p".cast("string"), $"x", $"y").collect().toSet == df.collect().toSet)
    assert(back.inputFiles.length == 12, s"4 files x 3 leaves expected, got ${back.inputFiles.length}")
    val boxed = Layout.prunedRead(spark, dir, Seq(("x", 50L, 81L)))
    assert(boxed.inputFiles.length < 12)
    assert(boxed.filter($"x".between(50L, 81L)).count() ==
      df.filter($"x".between(50L, 81L)).count())
    intercept[IllegalArgumentException](
      Layout.clusterPartitions(spark, dir, Seq("x"), 4, parallelism = 0))
  }

  test("readHealed heals interrupted swaps: table dir, a partition leaf, and the index") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def mv(a: String, b: String): Unit =
      assert(fs.rename(new org.apache.hadoop.fs.Path(a), new org.apache.hadoop.fs.Path(b)))
    // flat table: crash between the two renames (live missing, backup complete)
    val rnd = new scala.util.Random(31)
    val df = (1 to 5000).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong)).toDF("x", "y")
    val flat = Files.createTempDirectory("layout-heal").resolve("t").toString
    Layout.clusterWrite(df, Seq("x", "y"), 4, flat)
    mv(flat, s"$flat.compact-backup")
    mv(Layout.envelopesPath(flat), s"${Layout.envelopesPath(flat)}.compact-backup")
    val healed = Layout.readHealed(spark, flat)
    assert(healed.collect().toSet == df.collect().toSet)
    assert(fs.exists(new org.apache.hadoop.fs.Path(Layout.envelopesPath(flat))),
      "the .envelopes index was not healed")
    // partitioned table: one LEAF's swap interrupted mid-flight
    val parts = Files.createTempDirectory("layout-heal-parts").resolve("t").toString
    val pdf = df.withColumn("d", when($"x" % 2 === 0, "a").otherwise("b"))
    pdf.write.partitionBy("d").parquet(parts)
    mv(s"$parts/d=a", s"$parts/d=a.compact-backup")
    // a stale tmp from a superseded attempt is dropped too
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$parts/d=b.compact-tmp"))
    val healedParts = Layout.readHealed(spark, parts)
    assert(healedParts.count() == 5000)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$parts/d=a.compact-backup")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$parts/d=b.compact-tmp")))
    // the pure-SQL face heals too: break the flat table again, read
    // through graft_read_healed
    graft.GraftTableFunctions.ensure(spark)
    mv(flat, s"$flat.compact-backup")
    val viaTf = spark.sql(s"SELECT * FROM graft_read_healed('$flat')")
    assert(viaTf.collect().toSet == df.collect().toSet)
  }

  test("box-predicate file skipping: z-order prunes on BOTH dims, lexicographic only on the leading one") {
    val n = 40000
    val rnd = new scala.util.Random(7)
    val df = (1 to n).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val base = Files.createTempDirectory("layout-spec").toString
    val files = 16
    // lexicographic: global sort by (x, y)
    df.repartitionByRange(files, $"x", $"y").sortWithinPartitions("x", "y")
      .write.parquet(s"$base/lex")
    Layout.clusterWrite(df, Seq("x", "y"), files, s"$base/zord")

    def frac(dir: String, c: String): Double =
      Layout.skippableFileFraction(spark, dir, Seq((c, 100L, 163L))) // ~1/16 of the domain
    // leading column: both layouts prune well
    assert(frac(s"$base/lex", "x") > 0.7, s"lex leading-dim pruning: ${frac(s"$base/lex", "x")}")
    assert(frac(s"$base/zord", "x") > 0.4, s"z leading-dim pruning: ${frac(s"$base/zord", "x")}")
    // trailing column: lexicographic cannot skip ANY file; z-order can
    assert(frac(s"$base/lex", "y") == 0.0)
    assert(frac(s"$base/zord", "y") > 0.4, s"z trailing-dim pruning: ${frac(s"$base/zord", "y")}")
    // and the rewrite is row-preserving on disk
    assert(spark.read.parquet(s"$base/zord").collect().toSet == df.collect().toSet)
  }

  test("tableStats: metadata-exact n_rows iff the index covers the listing; stale -> NULL") {
    val dir = Files.createTempDirectory("graft-tstats").resolve("t").toString
    (1L to 500L).map(x => (x, x % 3)).toDF("x", "g")
      .coalesce(2).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val r = Layout.tableStats(spark, dir).collect().head
    assert(r.getAs[String]("path") == dir)
    assert(r.getAs[Long]("n_files") == 2L)
    assert(r.getAs[Long]("size_bytes") > 0L)
    assert(r.getAs[Long]("n_rows") == 500L, "index covers listing -> exact count, no scan")
    assert(r.getAs[String]("indexed_columns") == "x")
    assert(r.isNullAt(r.fieldIndex("bloom_columns")), "no blooms yet")
    // a bloom-carrying index surfaces its columns in DESCRIBE DETAIL
    Layout.writeEnvelopes(spark, dir, Seq("x"), bloomCols = Seq("x"))
    assert(Layout.tableStats(spark, dir).collect().head
      .getAs[String]("bloom_columns") == "x")
    // an unindexed append makes n_rows honestly NULL (never a guess)
    (501L to 600L).map(x => (x, x % 3)).toDF("x", "g")
      .coalesce(1).write.mode("append").parquet(dir)
    val r2 = Layout.tableStats(spark, dir).collect().head
    assert(r2.getAs[Long]("n_files") == 3L)
    assert(r2.isNullAt(r2.fieldIndex("n_rows")), "stale index must yield NULL, not a wrong count")
    // the SQL surface agrees
    graft.GraftTableFunctions.ensure(spark)
    val viaSql = spark.sql(s"SELECT n_files, n_rows FROM graft_table_stats('$dir')").head()
    assert(viaSql.getLong(0) == 3L && viaSql.isNullAt(1))
  }

  test("compactPartitions: small files roll up, compact leaves untouched, index follows") {
    val dir = Files.createTempDirectory("graft-compact").resolve("t").toString
    val df = (1 to 4000).map(i => (i % 2, i.toLong, (i * 3).toLong)).toDF("g", "x", "v")
    // leaf g=0: 8 tiny files; leaf g=1: already one file
    df.filter($"g" === 0).repartition(8).write.parquet(s"$dir/g=0")
    df.filter($"g" === 1).coalesce(1).write.parquet(s"$dir/g=1")
    Layout.writeEnvelopes(spark, dir, Seq("x", "g"))
    val before = spark.read.parquet(dir).collect().toSet
    def leafFiles(leaf: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$leaf")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.getName -> s.getModificationTime).toSeq.sortBy(_._1)
    }
    val g1Before = leafFiles("g=1")
    // huge target => every leaf should be ONE file; only g=0 needs rewriting
    val n = Layout.compactPartitions(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1L, s"exactly the small-file leaf rewrites, got $n")
    assert(leafFiles("g=0").size == 1, "8 tiny files rolled into one")
    assert(leafFiles("g=1") == g1Before, "already-compact leaf untouched (no swap, no write)")
    assert(spark.read.parquet(dir).collect().toSet == before, "row-preserving")
    // the index was refreshed over the SAME columns it already covered
    // (derived from the index, not re-stated) — so the stats-only agg
    // rule's exact file-set gate passes over the compacted table
    assert(Layout.indexedColumns(spark, dir).toSet == Set("x", "g"))
    val idxFiles = spark.read.parquet(Layout.envelopesPath(dir))
      .select("file").distinct().collect().map(r => Layout.normPath(r.getString(0))).toSet
    assert(idxFiles == spark.read.parquet(dir).inputFiles.map(Layout.normPath).toSet)
    assert(Manifest.latestSeq(spark, dir).isDefined, "compaction committed a manifest")
    // steady state: a second run rewrites nothing and commits nothing
    val seq1 = Manifest.latestSeq(spark, dir).get
    assert(Layout.compactPartitions(spark, dir, targetFileBytes = 1L << 30) == 0L)
    assert(Manifest.latestSeq(spark, dir).contains(seq1), "no-op run must not churn the manifest")
  }
}
