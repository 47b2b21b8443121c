package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

/** The self-clustering table sink
  * ([[StreamingPipeline.selfClusteringSink]]): appends land in arrival
  * order, the periodic DirSwap rewrite restores the Z-order skipping
  * property over the WHOLE accumulated table, rows and the replay guard
  * survive the rewrite, and a replayed batch appends nothing. */
class StreamingLayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  test("appends accumulate, the periodic rewrite restores both-dimension skipping, rows exact") {
    val table = tmp("stream-layout") + "/t"
    val cp = tmp("stream-layout-cp")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val rnd = new scala.util.Random(5)
    val batches = (0 until 4).map(_ =>
      (1 to 4000).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)))
    val q = StreamingPipeline.selfClusteringSink(
      mem.toDF().toDF("x", "y"), Seq("x", "y"), table, cp,
      clusterEveryBatches = 4, targetFiles = 8)
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // batch 3 triggered the rewrite: 8 range files, both dims skippable
    assert(parquetFiles(table) == 8, s"expected the compacted layout, got ${parquetFiles(table)} files")
    val got = spark.read.parquet(table)
    assert(got.count() == 16000)
    assert(got.select($"x", $"y").as[(Long, Long)].collect().sorted.toSeq ==
      batches.flatten.sorted)
    assert(Layout.skippableFileFraction(spark, table, Seq(("x", 100L, 163L))) > 0.3)
    assert(Layout.skippableFileFraction(spark, table, Seq(("y", 100L, 163L))) > 0.3)
    // batch_id survives the rewrite (the replay guard's column)
    assert(spark.read.parquet(table).select("batch_id").distinct().count() == 4)
  }

  test("fresh appends are indexed incrementally: prunedRead skips between rewrites") {
    val table = tmp("stream-layout-incr") + "/t"
    // monotone x per batch (an event-time stream): batch b covers
    // [b*1000, b*1000+999] — a box over batch 0's range must skip the
    // files batches 1 and 2 appended, with NO rewrite ever having run
    (0 to 2).foreach { b =>
      val rows = (0 until 1000).map(i => ((b * 1000 + i).toLong, i.toLong)).toDF("x", "y")
      StreamingPipeline.processClusterBatch(rows, b.toLong, Seq("x", "y"), table,
        clusterEveryBatches = 100, targetFiles = 4)
    }
    val pruned = Layout.prunedRead(spark, table, Seq(("x", 0L, 999L)))
    assert(pruned.inputFiles.length < spark.read.parquet(table).inputFiles.length,
      "incremental envelopes did not enable any skipping")
    assert(pruned.filter($"x".between(0L, 999L)).count() == 1000L)
  }

  test("the envelope index's own file count stays bounded across many batches") {
    val table = tmp("stream-layout-idx") + "/t"
    // clusterEveryBatches larger than the run: the rewrite never fires,
    // so ONLY the index compaction can bound the one-file-per-batch
    // growth (the small-files problem the index would otherwise become)
    (0 until 40).foreach { b =>
      val rows = (0 until 50).map(i => ((b * 50 + i).toLong, i.toLong)).toDF("x", "y")
      StreamingPipeline.processClusterBatch(rows, b.toLong, Seq("x", "y"), table,
        clusterEveryBatches = 1000, targetFiles = 4)
    }
    val idxFiles = parquetFiles(Layout.envelopesPath(table))
    assert(idxFiles <= 17, s"envelope index grew to $idxFiles files - compaction not bounding it")
    // and the compacted index still skips correctly and exactly
    val pruned = Layout.prunedRead(spark, table, Seq(("x", 0L, 49L)))
    assert(pruned.inputFiles.length < spark.read.parquet(table).inputFiles.length)
    assert(pruned.filter($"x".between(0L, 49L)).count() == 50L)
    assert(spark.read.parquet(table).count() == 2000L)
  }

  test("the marker commit log self-compacts; watermarked ids still count as replayed") {
    val table = tmp("stream-layout-wm") + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    // 140 batches crosses the compaction cadence (64) twice
    (0 until 140).foreach { b =>
      val rows = Seq((b.toLong, b.toLong)).toDF("x", "y")
      StreamingPipeline.processClusterBatch(rows, b.toLong, Seq("x", "y"), table,
        clusterEveryBatches = 100000, targetFiles = 4)
    }
    val logFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$table.batches"))
      .map(_.getPath.getName)
    assert(logFiles.length <= 2 * 64 + 2,
      s"marker log grew to ${logFiles.length} files - compaction not bounding it")
    assert(logFiles.exists(_.startsWith("wm-")), "no watermark written")
    // an id whose marker was compacted away still probes as replayed
    StreamingPipeline.processClusterBatch(
      Seq((999L, 999L)).toDF("x", "y"), 3L, Seq("x", "y"), table,
      clusterEveryBatches = 100000, targetFiles = 4)
    val got = spark.read.parquet(table)
    assert(got.count() == 140L, "a watermark-covered replay appended rows")
    assert(got.filter($"x" === 999L).isEmpty)
  }

  test("the sink commits manifest snapshots: readers see whole batches only, rewrites retire") {
    val table = tmp("stream-layout-manifest") + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val b0 = (1 to 400).map(i => (i.toLong, (i % 11).toLong)).toDF("x", "y")
    StreamingPipeline.processClusterBatch(b0, 0L, Seq("x", "y"), table,
      clusterEveryBatches = 2, targetFiles = 4)
    assert(Layout.readSnapshot(spark, table).count() == 400L)
    // a torn batch-1 (crash after a partial rename, before its marker):
    // the plain listing sees it, the snapshot must not
    val src = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
      new org.apache.hadoop.fs.Path(table, "b1-0.parquet"), false,
      spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(table).count() > 400L)
    assert(Layout.readSnapshot(spark, table).count() == 400L,
      "snapshot leaked a torn half-committed batch")
    // batch 1 lands (redo clears the partial) and triggers the rewrite:
    // the latest snapshot serves the compacted set, and the PREVIOUS
    // snapshot (pre-rewrite generation) stays readable via .retired
    val preSeq = graft.sources.Manifest.latestSeq(spark, table).get
    val b1 = (1 to 100).map(i => ((1000 + i).toLong, (i % 11).toLong)).toDF("x", "y")
    StreamingPipeline.processClusterBatch(b1, 1L, Seq("x", "y"), table,
      clusterEveryBatches = 2, targetFiles = 4)
    assert(Layout.readSnapshot(spark, table).count() == 500L)
    assert(parquetFiles(table) == 4)
    val old = Layout.readSnapshot(spark, table, Some(preSeq))
    assert(old.count() == 400L, "the pre-rewrite snapshot must still resolve")
    assert(old.inputFiles.forall(_.contains(".retired")))
  }

  test("a crash mid-commit is healed: the redo removes exactly its own partial files") {
    val table = tmp("stream-layout-crash") + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val b0 = (1 to 500).map(i => (i.toLong, (i % 97).toLong)).toDF("x", "y")
    StreamingPipeline.processClusterBatch(b0, 0L, Seq("x", "y"), table,
      clusterEveryBatches = 100, targetFiles = 4)
    // simulate batch 1 crashing AFTER some files renamed into the table
    // but BEFORE its marker: a valid parquet file under batch 1's
    // deterministic name, with rows that must NOT survive the redo
    val src = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
      new org.apache.hadoop.fs.Path(table, "b1-0.parquet"), false,
      spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(table).count() > 500L) // the partial is visible pre-redo
    val b1 = (1 to 300).map(i => ((1000 + i).toLong, (i % 97).toLong)).toDF("x", "y")
    StreamingPipeline.processClusterBatch(b1, 1L, Seq("x", "y"), table,
      clusterEveryBatches = 100, targetFiles = 4)
    val got = spark.read.parquet(table)
    assert(got.count() == 800L, "the redo must replace the partial commit, not add to it")
    assert(got.groupBy("batch_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(0L -> 500L, 1L -> 300L))
  }

  test("an existing-but-empty table directory does not wedge the sink") {
    val table = tmp("stream-layout-empty") + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(table)) // crash before any file commit
    val rows = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    StreamingPipeline.processClusterBatch(rows, 0L, Seq("x", "y"), table,
      clusterEveryBatches = 100, targetFiles = 4)
    assert(spark.read.parquet(table).count() == 100L)
  }

  test("a replayed batch appends nothing, before and after a rewrite") {
    val table = tmp("stream-layout-replay") + "/t"
    val rows = (1 to 500).map(i => (i.toLong, (i * 31 % 97).toLong)).toDF("x", "y")
    StreamingPipeline.processClusterBatch(rows, 0L, Seq("x", "y"), table,
      clusterEveryBatches = 2, targetFiles = 4)
    StreamingPipeline.processClusterBatch(rows, 0L, Seq("x", "y"), table,
      clusterEveryBatches = 2, targetFiles = 4) // replay: no double rows
    assert(spark.read.parquet(table).count() == 500)
    StreamingPipeline.processClusterBatch(rows, 1L, Seq("x", "y"), table,
      clusterEveryBatches = 2, targetFiles = 4) // triggers the rewrite
    assert(parquetFiles(table) == 4)
    StreamingPipeline.processClusterBatch(rows, 1L, Seq("x", "y"), table,
      clusterEveryBatches = 2, targetFiles = 4) // replay AFTER compaction
    assert(spark.read.parquet(table).count() == 1000)
  }

  test("bloom columns a maintenance job added survive both sink paths (append + rewrite)") {
    val table = tmp("stream-layout-bloom") + "/t"
    def rows(b: Long) = spark.range(b * 100, b * 100 + 100)
      .select(col("id").as("x"), (col("id") * 3L).as("y"))
    StreamingPipeline.processClusterBatch(rows(0), 0L, Seq("x", "y"), table,
      clusterEveryBatches = 1000, targetFiles = 4)
    // a nightly maintenance job adds blooms on x
    Layout.writeEnvelopes(spark, table, Seq("x", "y"), bloomCols = Seq("x"))
    // APPEND path: the fresh batch's index rows must carry the bloom
    StreamingPipeline.processClusterBatch(rows(1), 1L, Seq("x", "y"), table,
      clusterEveryBatches = 1000, targetFiles = 4)
    val env1 = spark.read.parquet(Layout.envelopesPath(table))
    assert(env1.columns.contains("bloom_x"))
    assert(env1.filter(col("bloom_x").isNull).count() == 0L,
      "appended batch's index rows lost the bloom")
    // REWRITE path: the periodic full re-index keeps it too
    StreamingPipeline.processClusterBatch(rows(2), 2L, Seq("x", "y"), table,
      clusterEveryBatches = 1, targetFiles = 4) // forces the rewrite
    val env2 = spark.read.parquet(Layout.envelopesPath(table))
    assert(env2.columns.contains("bloom_x") &&
      env2.filter(col("bloom_x").isNull).count() == 0L,
      "the periodic rewrite dropped the bloom column")
  }
}
