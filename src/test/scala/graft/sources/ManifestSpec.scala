package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DirSwap

/** Manifest-committed snapshots: a reader racing a DirSwap rewrite (or
  * a streaming batch commit) resolves only old-complete or new-complete
  * file sets — never a half-swapped mix, never a torn batch — through
  * every intermediate swap state; retention keeps superseded snapshots
  * readable for `keep` cycles and vacuum reclaims them; partition
  * columns and pruning survive the snapshot read path. */
class ManifestSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  test("snapshot excludes unmanifested appends (torn-batch protection); a new commit includes them") {
    val dir = freshDir("manifest-basic")
    val df = (1 to 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("x", "y")
    df.write.parquet(dir)
    val s0 = Manifest.write(spark, dir)
    assert(Layout.readSnapshot(spark, dir).count() == 1000L)
    // an append the writer has not committed yet (a torn batch, a crashed
    // job's stray output): plain reads see it, the snapshot must not
    Seq((100000L, 0L)).toDF("x", "y").write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 1001L)
    assert(Layout.readSnapshot(spark, dir).count() == 1000L,
      "snapshot leaked an unmanifested file")
    val s1 = Manifest.write(spark, dir)
    assert(s1 == s0 + 1)
    assert(Layout.readSnapshot(spark, dir).count() == 1001L)
    // the pinned older snapshot still reads the older set
    assert(Layout.readSnapshot(spark, dir, Some(s0)).count() == 1000L)
  }

  test("a reader pinned mid-rewrite sees only the old or new complete set, never a mix") {
    val dir = freshDir("manifest-race")
    val df = (1 to 5000).map(i => (i.toLong, (i * 31 % 1024).toLong)).toDF("x", "y")
    df.repartition(4).write.parquet(dir)
    Manifest.write(spark, dir)
    val oldFiles = Layout.readSnapshot(spark, dir).inputFiles.toSet
    assert(oldFiles.size == 4)
    val rows = df.collect().toSet

    // walk a rewrite through every intermediate DirSwap state by hand,
    // reading the snapshot at each one — the exact cross-process race
    val live = new Path(dir)
    val tmp = new Path(dir + ".compact-tmp")
    val backup = new Path(dir + ".compact-backup")
    // state A: replacement staged, live intact
    Layout.cluster(spark.read.parquet(dir), Seq("x", "y"), 2)
      .write.parquet(tmp.toString)
    assert(Layout.readSnapshot(spark, dir).collect().toSet == rows)
    // state B: live moved aside - the window where a LISTING reader
    // finds no table at all; the snapshot resolves via the backup
    assert(fs.rename(live, backup))
    intercept[Exception](spark.read.parquet(dir).count()) // listing reader breaks...
    val inB = Layout.readSnapshot(spark, dir)
    assert(inB.collect().toSet == rows, "state B snapshot lost rows") // ...snapshot doesn't
    assert(inB.inputFiles.map(f => new Path(f).getName).toSet ==
      oldFiles.map(f => new Path(f).getName), "state B must serve the OLD complete set")
    // state C: replacement promoted, old generation not yet retired -
    // the manifest still pins the OLD set, resolved from the backup
    assert(fs.rename(tmp, live))
    val inC = Layout.readSnapshot(spark, dir)
    assert(inC.collect().toSet == rows)
    assert(inC.inputFiles.map(f => new Path(f).getName).toSet ==
      oldFiles.map(f => new Path(f).getName), "state C must still serve the OLD set")
    // writer completes: retirement + new manifest commit
    DirSwap.recover(spark, dir, Some(Manifest.retiredPath(dir)))
    assert(!fs.exists(backup))
    val s1 = Manifest.write(spark, dir)
    val now = Layout.readSnapshot(spark, dir)
    assert(now.collect().toSet == rows)
    assert(now.inputFiles.length == 2, "latest snapshot must serve the NEW set")
    // the superseded snapshot stays readable through .retired
    val old = Layout.readSnapshot(spark, dir, Some(s1 - 1))
    assert(old.collect().toSet == rows)
    assert(old.inputFiles.forall(_.contains(".retired")),
      "old snapshot must resolve from the retirement area")
  }

  test("clusterPartitions commits manifests, retires generations, vacuum bounds them; partition pruning works on snapshots") {
    val dir = freshDir("manifest-parts")
    val df = (1 to 8000).map { i =>
      (i % 3, i.toLong, (i * 17 % 1024).toLong)
    }.toDF("wk", "x", "y")
    df.write.partitionBy("wk").parquet(dir)
    Layout.clusterPartitions(spark, dir, Seq("x", "y"), filesPerPartition = 2)
    val s0 = Manifest.latestSeq(spark, dir).get
    val snap0 = Layout.readSnapshot(spark, dir)
    // partition COLUMN survives with correct values and type
    assert(snap0.schema("wk").dataType == org.apache.spark.sql.types.IntegerType)
    assert(snap0.groupBy("wk").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      df.groupBy("wk").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    // partition PRUNING: a wk filter must cut the snapshot's scanned files
    val prunedScan = snap0.filter($"wk" === 1)
    prunedScan.collect()
    val physical = prunedScan.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val read = physical.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }.sum
    assert(read < snap0.inputFiles.length,
      s"no partition pruning on the snapshot: read $read of ${snap0.inputFiles.length}")
    assert(prunedScan.count() == df.filter($"wk" === 1).count())
    // second OPTIMIZE: a new generation; the old snapshot stays readable
    Layout.clusterPartitions(spark, dir, Seq("x", "y"), filesPerPartition = 2)
    val s1 = Manifest.latestSeq(spark, dir).get
    assert(s1 == s0 + 1)
    val want = df.select($"x", $"y", $"wk").collect().toSet
    assert(Layout.readSnapshot(spark, dir).select($"x", $"y", $"wk").collect().toSet == want)
    val oldSnap = Layout.readSnapshot(spark, dir, Some(s0))
    assert(oldSnap.select($"x", $"y", $"wk").collect().toSet == want)
    assert(oldSnap.inputFiles.exists(_.contains(".retired")))
    // vacuum to 1: the old snapshot's retired files are reclaimed and
    // resolving it names the retention contract (not a bare missing-file)
    Manifest.vacuum(spark, dir, keep = 1)
    val gone = intercept[IllegalArgumentException] {
      Layout.readSnapshot(spark, dir, Some(s0)).collect()
    }
    assert(gone.getMessage.contains("not retained"), gone.getMessage)
    assert(Layout.readSnapshot(spark, dir).select($"x", $"y", $"wk")
      .collect().toSet == want)
  }

  test("readHealed on a manifested table completes retirement instead of deleting the backup") {
    val dir = freshDir("manifest-heal")
    val df = (1 to 2000).map(i => (i.toLong, (i % 13).toLong)).toDF("x", "y")
    df.repartition(2).write.parquet(dir)
    val s0 = Manifest.write(spark, dir)
    // crash after promote, before retirement: live = new copy, backup = old
    Layout.cluster(spark.read.parquet(dir), Seq("x", "y"), 1)
      .write.parquet(dir + ".compact-tmp")
    assert(fs.rename(new Path(dir), new Path(dir + ".compact-backup")))
    assert(fs.rename(new Path(dir + ".compact-tmp"), new Path(dir)))
    // the same-process heal path must RETIRE the old generation (a
    // delete would strand snapshot s0 half-gone)
    assert(Layout.readHealed(spark, dir).count() == 2000L)
    assert(!fs.exists(new Path(dir + ".compact-backup")))
    val healedOld = Layout.readSnapshot(spark, dir, Some(s0))
    assert(healedOld.collect().toSet == df.collect().toSet)
    assert(healedOld.inputFiles.forall(_.contains(".retired")))
  }

  test("spark.graft.manifest.keep tunes retention without any API change") {
    val dir = freshDir("manifest-keepconf")
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    df.write.parquet(dir)
    spark.conf.set(Manifest.KeepConf, "1")
    try {
      val s0 = Manifest.write(spark, dir)
      Seq((1000L, 0L)).toDF("x", "y").write.mode("append").parquet(dir)
      Manifest.write(spark, dir)
      // keep=1: the previous manifest itself was vacuumed away
      intercept[Exception](Layout.readSnapshot(spark, dir, Some(s0)).collect())
      assert(Layout.readSnapshot(spark, dir).count() == 101L)
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("readChanges serves exactly the files added between two commits; info records the envelope generation") {
    val dir = freshDir("manifest-cdc")
    val even = (1 to 1000).filter(_ % 2 == 0).map(i => (i.toLong, (i % 7).toLong)).toDF("x", "y")
    val odd  = (1 to 1000).filter(_ % 2 == 1).map(i => (i.toLong, (i % 7).toLong)).toDF("x", "y")
    even.write.parquet(dir)
    val s0 = Manifest.write(spark, dir)
    odd.write.mode("append").parquet(dir)
    val s1 = Manifest.write(spark, dir)
    // the delta is exactly the second commit's rows
    assert(Layout.readChanges(spark, dir, s0).collect().toSet == odd.collect().toSet)
    assert(Layout.readChanges(spark, dir, s0, Some(s1)).collect().toSet == odd.collect().toSet)
    // no change between a commit and itself: empty, schema intact
    val none = Layout.readChanges(spark, dir, s1)
    assert(none.count() == 0L && none.columns.toSeq == Seq("x", "y"))
    // a reversed range fails loudly
    intercept[IllegalArgumentException](Layout.readChanges(spark, dir, s1 + 5))
    // the SQL face
    graft.GraftTableFunctions.ensure(spark)
    assert(spark.sql(s"SELECT * FROM graft_read_changes('$dir', $s0)")
      .collect().toSet.size == 500)
    // v2 info: no index yet -> "-"; after writeEnvelopes + commit, the
    // envelope generation is recorded
    assert(Manifest.info(spark, dir, Some(s1)).envelopeSig == "-")
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val s2 = Manifest.write(spark, dir)
    assert(Manifest.info(spark, dir, Some(s2)).envelopeSig != "-")
    assert(Manifest.info(spark, dir).seq == s2)
  }

  test("a crashed manifest write (stray tmp) is invisible; many-leaf tables resolve in parallel") {
    val dir = freshDir("manifest-tmp")
    val df = (1 to 2400).map(i => (i % 12, i.toLong)).toDF("wk", "x")
    df.write.partitionBy("wk").parquet(dir) // 12 leaves: the parallel resolution path
    val s0 = Manifest.write(spark, dir)
    // a crash mid-write leaves a tmp file: readers and latestSeq ignore it
    val md = new Path(Manifest.manifestsPath(dir))
    val out = fs.create(new Path(md, ".tmp-m99"), true)
    out.write("garbage".getBytes("UTF-8")); out.close()
    assert(Manifest.latestSeq(spark, dir).contains(s0))
    val snap = Layout.readSnapshot(spark, dir)
    assert(snap.select($"x", $"wk").collect().toSet ==
      df.select($"x", $"wk").collect().toSet)
    // and the next commit proceeds normally
    assert(Manifest.write(spark, dir) == s0 + 1)
  }

  test("readSnapshot fails loudly on a non-manifest table; mutates nothing") {
    val dir = freshDir("manifest-none")
    Seq((1L, 2L)).toDF("x", "y").write.parquet(dir)
    val ex = intercept[IllegalArgumentException](Layout.readSnapshot(spark, dir))
    assert(ex.getMessage.contains("no committed manifest"))
  }

  test("optimistic commit: two writers racing one seq - exactly one wins, the loser names the winner") {
    val dir = freshDir("manifest-cas")
    (1L to 100L).toDF("x").write.parquet(dir)
    val s0 = Manifest.write(spark, dir)
    // deterministic interleaving: writer A claims s0+1 after writer B
    // computed the same target seq; B's commit must fail loudly
    assert(Manifest.writeSeq(spark, dir, s0 + 1) == s0 + 1)
    val winnerNonce = Manifest.info(spark, dir, Some(s0 + 1)).nonce
    val ex = intercept[java.util.ConcurrentModificationException] {
      Manifest.writeSeq(spark, dir, s0 + 1)
    }
    assert(ex.getMessage.contains(s"m${s0 + 1}") &&
      ex.getMessage.contains(winnerNonce), ex.getMessage)
    // the winner's manifest is intact and no stray tmp remains
    assert(Manifest.info(spark, dir, Some(s0 + 1)).nonce == winnerNonce)
    val md = new Path(Manifest.manifestsPath(dir))
    assert(!fs.listStatus(md).exists(_.getPath.getName.startsWith(".tmp-")))
    // the true concurrent race: both threads target the same seq at once
    val target = s0 + 2
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
        override def call(): Either[Throwable, Long] = {
          barrier.await()
          try Right(Manifest.writeSeq(spark, dir, target))
          catch { case t: Throwable => Left(t) }
        }
      })
    }.map(_.get())
    pool.shutdown()
    assert(results.count(_.isRight) == 1, s"exactly one winner: $results")
    assert(results.collect { case Left(t) => t }.forall(
      _.isInstanceOf[java.util.ConcurrentModificationException]))
    assert(Manifest.latestSeq(spark, dir).contains(target))
    Layout.readSnapshot(spark, dir).count() // the winning commit serves
  }

  test("v3 manifests are gzip-compressed with a nonce; v2 plain-text manifests keep parsing") {
    val dir = freshDir("manifest-v3")
    (1L to 50L).toDF("x").write.parquet(dir)
    val s0 = Manifest.write(spark, dir)
    val info = Manifest.info(spark, dir, Some(s0))
    assert(info.nonce != "-", "v3 commits carry a writer nonce")
    val p = new Path(Manifest.manifestsPath(dir), f"m$s0%020d")
    val in = fs.open(p)
    val magic = try { val b = new Array[Byte](2); in.readFully(b); b } finally in.close()
    assert((magic(0) & 0xff) == 0x1f && (magic(1) & 0xff) == 0x8b, "body is gzip")
    // a hand-written v2 plain-text manifest still parses (legacy tables)
    val v2 = new Path(Manifest.manifestsPath(dir), f"m${s0 + 1}%020d")
    val out = fs.create(v2, true)
    out.write((Seq("graft-manifest-v2", info.dataSchema.json, info.partSchema.json,
      "-") ++ info.files).mkString("\n").getBytes("UTF-8"))
    out.close()
    val legacy = Manifest.info(spark, dir, Some(s0 + 1))
    assert(legacy.files == info.files && legacy.nonce == "-")
    assert(Layout.readSnapshot(spark, dir, Some(s0 + 1)).count() == 50L)
  }

  test("time-based retention: an old-by-count but young-by-clock manifest survives vacuum") {
    val dir = freshDir("manifest-retain")
    (1L to 10L).toDF("x").write.parquet(dir)
    spark.conf.set(Manifest.RetainMsConf, (24L * 3600 * 1000).toString)
    try {
      val s0 = Manifest.write(spark, dir, keep = 1)
      (11L to 20L).toDF("x").write.mode("append").parquet(dir)
      val s1 = Manifest.write(spark, dir, keep = 1)
      // keep=1 alone would have dropped s0; the time floor saves it
      assert(Manifest.info(spark, dir, Some(s0)).files.nonEmpty)
      assert(Layout.readSnapshot(spark, dir, Some(s0)).count() == 10L)
      spark.conf.set(Manifest.RetainMsConf, "0")
      Manifest.vacuum(spark, dir, keep = 1)
      intercept[Exception](Manifest.info(spark, dir, Some(s0)))
      assert(Layout.readSnapshot(spark, dir, Some(s1)).count() == 20L)
    } finally spark.conf.unset(Manifest.RetainMsConf)
  }

  test("retired data files follow the retention horizon; past it, time travel fails loudly") {
    val dir = freshDir("manifest-retired-retain")
    (1L to 100L).toDF("x").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    spark.conf.set(Manifest.RetainMsConf, (24L * 3600 * 1000).toString)
    spark.conf.set(Manifest.KeepConf, "1")
    try {
      val s0 = Manifest.write(spark, dir)
      // the mutation RETIRES the original file; keep=1 alone would drop
      // m<s0> and with it the whole retired generation — the time floor
      // keeps both, so time travel to the pre-mutation snapshot works
      Layout.deleteWhere(spark, dir, Seq(("x", 1L, 10L)))
      def retiredFiles(): Seq[Path] = {
        val rd = new Path(Manifest.retiredPath(dir))
        if (!fs.exists(rd)) Nil
        else {
          def walk(p: Path): Seq[Path] = fs.listStatus(p).toSeq.flatMap { s =>
            if (s.isDirectory) walk(s.getPath) else Seq(s.getPath)
          }
          walk(rd)
        }
      }
      assert(retiredFiles().nonEmpty, "the mutation retired the original file")
      assert(Layout.readSnapshot(spark, dir, Some(s0)).count() == 100L,
        "within the horizon the old snapshot reads through .retired")
      // past the horizon: the manifest AND its retired generation go,
      // and time travel fails naming the contract, not with a bare
      // file-not-found from a missing commit file
      spark.conf.set(Manifest.RetainMsConf, "0")
      Manifest.vacuum(spark, dir)
      assert(retiredFiles().isEmpty, "retired generation vacuumed with its manifest")
      val ex = intercept[IllegalArgumentException](
        Layout.readSnapshot(spark, dir, Some(s0)).count())
      assert(ex.getMessage.contains("not retained") &&
        ex.getMessage.contains("retention"), ex.getMessage)
      assert(Layout.readSnapshot(spark, dir).count() == 90L, "the live snapshot is exact")
    } finally { spark.conf.unset(Manifest.RetainMsConf); spark.conf.unset(Manifest.KeepConf) }
  }

  test("row-level CDC: a delete's delta is exactly the deleted rows; a pure rewrite cancels to zero") {
    val dir = freshDir("manifest-cdf")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 299L).map(x => (x, x % 7)).toDF("x", "y")
        .repartition(3).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("x"))
      val s0 = Manifest.write(spark, dir)
      Layout.deleteWhere(spark, dir, Seq(("x", 100L, 149L)))
      val s1 = Manifest.latestSeq(spark, dir).get
      val cdc = Layout.readChangeRows(spark, dir, s0, Some(s1))
      val del = cdc.filter($"_change_type" === "delete").select("x")
        .as[Long].collect().sorted.toSeq
      assert(del == (100L to 149L), "delta = exactly the box contents")
      assert(cdc.filter($"_change_type" === "insert").count() == 0L,
        "a delete inserts nothing")
      // a pure layout rewrite (every file replaced, rows identical)
      // cancels to zero CDC rows — the file-level delta re-delivers all
      Layout.clusterPartitions(spark, dir, Seq("x"), filesPerPartition = 2)
      val s2 = Manifest.latestSeq(spark, dir).get
      assert(Layout.readChanges(spark, dir, s1, Some(s2)).count() > 0,
        "file-level CDC re-delivers the rewrite")
      assert(Layout.readChangeRows(spark, dir, s1, Some(s2)).count() == 0L,
        "row-level CDC cancels a pure rewrite")
      // an UPSERT's delta: the upsert recorded its key as `cdcPairKey`,
      // so each replaced key's delete+insert arrives PAIRED as
      // update_preimage/update_postimage (the Delta CDF convention);
      // fresh keys stay plain `insert` — even though the rewrite
      // re-wrote whole files around them
      val ups = ((200L to 204L) ++ (900L to 901L)).map(x => (x, -1L)).toDF("x", "y")
      Layout.upsert(spark, dir, ups, "x")
      val s3 = Manifest.latestSeq(spark, dir).get
      val cdc2 = Layout.readChangeRows(spark, dir, s2, Some(s3))
        .select($"_change_type", $"x", $"y").as[(String, Long, Long)].collect()
      val pre = cdc2.filter(_._1 == "update_preimage").map(r => (r._2, r._3)).sorted.toSeq
      val post = cdc2.filter(_._1 == "update_postimage").map(r => (r._2, r._3)).sorted.toSeq
      val ins = cdc2.filter(_._1 == "insert").map(r => (r._2, r._3)).sorted.toSeq
      assert(pre == (200L to 204L).map(x => (x, x % 7)),
        s"upsert delta preimages = exactly the replaced rows: $pre")
      assert(post == (200L to 204L).map(x => (x, -1L)),
        s"upsert delta postimages = the replacements: $post")
      assert(ins == (900L to 901L).map(x => (x, -1L)),
        s"fresh keys stay plain inserts: $ins")
      assert(cdc2.count(_._1 == "delete") == 0, "every delete paired")
      // the caller can also force pairing off / onto explicit columns
      val unpaired = Layout.readChangeRows(spark, dir, s2, Some(s3), pairOn = Seq("x", "y"))
        .select($"_change_type").as[String].collect()
      assert(unpaired.count(_ == "update_preimage") == 0,
        "pairing on (x,y) matches nothing - values differ, all plain labels")
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("addColumns: metadata-only widening — null-filled reads, widened appends, mutations, zero-row CDC") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
    val dir = freshDir("manifest-widen")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 99L).map(x => (x, x % 7)).toDF("x", "y")
        .coalesce(1).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("x"))
      val s0 = Manifest.write(spark, dir)
      val filesBefore = Layout.readSnapshot(spark, dir).inputFiles.toSet
      val s1 = Layout.addColumns(spark, dir, Seq(StructField("z", DoubleType)))
      assert(s1 == s0 + 1)
      // metadata-only: the SAME files, served with z null-filled
      val snap = Layout.readSnapshot(spark, dir)
      assert(snap.inputFiles.toSet == filesBefore, "no file may be touched")
      assert(snap.columns.toSeq == Seq("x", "y", "z"))
      assert(snap.filter($"z".isNotNull).count() == 0L)
      // CDC across the pure widening commit cancels to zero rows
      assert(Layout.readChangeRows(spark, dir, s0, Some(s1)).count() == 0L,
        "a metadata commit changes no rows")
      // append now requires (and serves) the widened shape
      Layout.append(spark, dir,
        (100L to 109L).map(x => (x, x % 7, x * 1.5)).toDF("x", "y", "z"))
      val all = Layout.readSnapshot(spark, dir)
      assert(all.count() == 110L)
      assert(all.filter($"z".isNotNull).count() == 10L)
      // a mutation over the MIXED-generation table: classification through
      // the index, rewrite materializes z (null) into the replaced file
      val stats = Layout.deleteWhere(spark, dir, Seq(("x", 10L, 19L)))
      assert(stats.rewrittenFiles == 1L, s"$stats")
      val after = Layout.readSnapshot(spark, dir)
      assert(after.count() == 100L && after.columns.contains("z"))
      // a BARE commit (footer inference) must not narrow the schema back
      Seq((500L, 0L)).toDF("x", "y").write.mode("append").parquet(dir)
      Manifest.write(spark, dir)
      assert(Layout.readSnapshot(spark, dir).columns.toSeq == Seq("x", "y", "z"),
        "footer inference narrowed a widened schema")
      // the envelope-indexed box over the widened table still serves
      // (prune rule path) and aggregates stay exact
      graft.plans.EnvelopePruneRule.ensure(spark)
      assert(spark.read.parquet(dir).filter($"x".between(20L, 29L)).count() == 10L)
      // guardrails: collisions (case-insensitive) and non-nullable adds
      val exDup = intercept[IllegalArgumentException](
        Layout.addColumns(spark, dir, Seq(StructField("X", LongType))))
      assert(exDup.getMessage.contains("already exists"))
      val exNn = intercept[IllegalArgumentException](
        Layout.addColumns(spark, dir, Seq(StructField("w", LongType, nullable = false))))
      assert(exNn.getMessage.contains("nullable"))
      // a REMOVED/re-typed column still fails row-CDC loudly (only
      // additive widening diffs)
      val exCdc = intercept[IllegalArgumentException](
        Layout.readChangeRows(spark, freshNarrowedCopy(dir), 0L))
      assert(exCdc.getMessage.contains("additive"))
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  /** A two-commit table whose SECOND commit re-types a column — the
    * non-additive CDC rejection fixture. */
  private def freshNarrowedCopy(ignored: String): String = {
    val d = freshDir("manifest-retype")
    Seq((1L, 1L)).toDF("x", "y").write.parquet(d)
    Manifest.write(spark, d)
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    Manifest.write(spark, d, schemas = Some((
      StructType(Seq(StructField("x", org.apache.spark.sql.types.LongType),
        StructField("y", StringType))), new StructType())))
    d
  }
}
