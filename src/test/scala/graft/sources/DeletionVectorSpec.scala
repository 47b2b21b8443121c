package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read DELETION VECTORS: a small delete records row positions
  * in a manifest-referenced sidecar instead of rewriting candidate
  * files. Pins: zero rewrites with byte-identical candidates, exact
  * snapshot/time-travel reads, position union across repeated DV
  * deletes, materialization by reify / any copy-mode mutation /
  * compaction, row-level CDC exactness across DV commits, sidecar
  * vacuum, and the SQL `spark.graft.delete.mode=dv` surface. */
class DeletionVectorSpec extends AnyFunSuite {

  // the SQL-surface case needs MutationSqlRule, and extensions are fixed
  // at session construction — a session an earlier suite built without
  // them would silently serve DELETE FROM with Spark's stock error.
  // Force a FRESH session (the MutationSqlSpec pattern; suites in the
  // forked test JVM run sequentially, so clearing races nothing).
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def leafFiles(dir: String): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
  }

  private def dvSidecars(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(Manifest.dvsPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  test("dv delete: zero rewrites, candidates byte-identical, snapshot exact, time travel intact") {
    val dir = freshDir("graft-dv")
    // A [0,99] partially hit, B [200,299] disjoint (untouched),
    // C [400,449] entirely inside a second box later (drop-whole)
    (0L to 99L).map(x => (x, x * 10L)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x * 10L)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val before = leafFiles(dir)

    val stats = Layout.deleteWhere(spark, dir, Seq(("x", 10L, 19L)), mode = "dv")
    assert(stats == Layout.MutationStats(droppedFiles = 0, rewrittenFiles = 0,
      untouchedFiles = 1, dvFiles = 1), s"merge-on-read classification: $stats")
    // NO data file moved or rewrote — byte-identical listing
    assert(leafFiles(dir) == before, "dv delete must not touch data files")
    // the snapshot read filters the positions out
    val snap = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
    assert(snap == ((0L to 9L) ++ (20L to 99L) ++ (200L to 299L)).toSet,
      "exactly the box deleted under the snapshot read")
    // PLAIN reads still see the raw rows — the documented plain-read caveat
    assert(spark.read.parquet(dir).count() == 200L)
    // time travel to the pre-delete commit still serves every row
    val seqNow = Manifest.latestSeq(spark, dir).get
    assert(Layout.readSnapshot(spark, dir, Some(seqNow - 1)).count() == 200L)
    // tableStats surfaces the pending positions
    val ts = Layout.tableStats(spark, dir).select("dv_files", "dv_rows").head()
    assert(ts.getLong(0) == 1L && ts.getLong(1) == 10L, ts.toString)

    // a SECOND dv delete unions positions (and re-running is idempotent)
    val s2 = Layout.deleteWhere(spark, dir, Seq(("x", 15L, 24L)), mode = "dv")
    assert(s2.rewrittenFiles == 0L && s2.dvFiles == 1L, s"$s2")
    val snap2 = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
    assert(snap2 == ((0L to 9L) ++ (25L to 99L) ++ (200L to 299L)).toSet)
    val s3 = Layout.deleteWhere(spark, dir, Seq(("x", 15L, 24L)), mode = "dv")
    assert(Layout.readSnapshot(spark, dir).count() == snap2.size.toLong,
      s"re-running the same dv delete is idempotent: $s3")

    // drop-whole still works in dv mode: a box covering ALL of file B
    val s4 = Layout.deleteWhere(spark, dir, Seq(("x", 200L, 299L)), mode = "dv")
    assert(s4.droppedFiles == 1L && s4.rewrittenFiles == 0L, s"$s4")
    assert(Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet ==
      ((0L to 9L) ++ (25L to 99L)).toSet)
  }

  test("reify materializes: only DV'd files rewrite, DV clears, rows preserved, plain read agrees") {
    val dir = freshDir("graft-dv-reify")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Layout.deleteWhere(spark, dir, Seq(("x", 0L, 4L)), mode = "dv")
    val before = leafFiles(dir)
    val expect = ((5L to 99L) ++ (200L to 299L)).toSet

    val stats = Layout.reifyDeletes(spark, dir)
    assert(stats.rewrittenFiles == 1L && stats.untouchedFiles == 1L, s"$stats")
    assert(Manifest.info(spark, dir).dv.isEmpty, "reify must clear the DV reference")
    assert(Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet == expect)
    // after reify the PLAIN read agrees too (deletes are physical now)
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().map(_._1).toSet == expect)
    // the untouched file really was untouched
    val after = leafFiles(dir)
    assert(before.count { case (n, m) => after.get(n).contains(m) } == 1)
    // reify again: clean no-op
    val s2 = Layout.reifyDeletes(spark, dir)
    assert(s2.rewrittenFiles == 0L, s"$s2")
  }

  test("any copy-mode mutation on a DV'd file materializes its deletes; other entries carry") {
    val dir = freshDir("graft-dv-carry")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // DV positions in BOTH files
    Layout.deleteWhere(spark, dir, Seq(("k", 0L, 1L)), mode = "dv")
    Layout.deleteWhere(spark, dir, Seq(("k", 200L, 201L)), mode = "dv")
    assert(Layout.readSnapshot(spark, dir).count() == 196L)
    // an upsert touching only the first file: its deletes MATERIALIZE in
    // the rewrite (no resurrection!), the second file's entries carry
    val stats = Layout.upsert(spark, dir, Seq((50L, -1L)).toDF("k", "v"), "k")
    assert(stats.rewrittenFiles == 1L && stats.untouchedFiles == 1L, s"$stats")
    val got = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().toMap
    assert(!got.contains(0L) && !got.contains(1L), "materialized deletes stay deleted")
    assert(!got.contains(200L) && !got.contains(201L), "carried DV still filters")
    assert(got(50L) == -1L && got.size == 196)
    val dv = Manifest.info(spark, dir).dv
    assert(dv.nonEmpty, "second file's entries must survive as a filtered sidecar")
    val entries = spark.read.parquet(Manifest.dvsPath(dir) + "/" + dv.get)
      .select("file").as[String].collect()
    assert(entries.length == 1, entries.toSeq.toString)
  }

  test("compaction auto-reifies: no resurrected rows, DV cleared") {
    val dir = freshDir("graft-dv-compact")
    (0 to 999).map(i => (i % 4, i.toLong, i.toLong)).toDF("p", "x", "v")
      .repartition(6).write.partitionBy("p").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Layout.deleteWhere(spark, dir, Seq(("x", 0L, 99L)), mode = "dv")
    assert(Layout.readSnapshot(spark, dir).count() == 900L)
    Layout.compactPartitions(spark, dir, targetFileBytes = 1L << 30)
    assert(Manifest.info(spark, dir).dv.isEmpty, "compaction must clear the DV")
    assert(Layout.readSnapshot(spark, dir).count() == 900L, "no resurrection")
    assert(spark.read.parquet(dir).count() == 900L)
  }

  test("row-level CDC is exact across DV commits; reify is CDC-invisible") {
    val dir = freshDir("graft-dv-cdc")
    // three commits span the range — keep them all resolvable
    spark.conf.set(Manifest.KeepConf, "5")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Manifest.write(spark, dir)
    val seq0 = Manifest.latestSeq(spark, dir).get
    Layout.deleteWhere(spark, dir, Seq(("x", 10L, 14L)), mode = "dv")
    val seq1 = Manifest.latestSeq(spark, dir).get
    // the DV commit's row delta is EXACTLY the deleted rows, as deletes
    val d1 = Layout.readChangeRows(spark, dir, seq0, Some(seq1))
      .select("_change_type", "x").as[(String, Long)].collect().toSet
    assert(d1 == (10L to 14L).map(("delete", _)).toSet, d1.toString)
    // reify: a pure-maintenance rewrite — the (seq1, seq2] delta cancels
    Layout.reifyDeletes(spark, dir)
    val seq2 = Manifest.latestSeq(spark, dir).get
    assert(Layout.readChangeRows(spark, dir, seq1, Some(seq2)).count() == 0L,
      "materialization must be CDC-invisible")
    // and the spanning range still reports exactly the deletes once
    val d2 = Layout.readChangeRows(spark, dir, seq0, Some(seq2))
      .select("_change_type", "x").as[(String, Long)].collect().toSet
    assert(d2 == (10L to 14L).map(("delete", _)).toSet, d2.toString)
    // file-level CDC of the DV commit delivers the file's LIVE rows only
    val f1 = Layout.readChanges(spark, dir, seq0, Some(seq1))
    assert(f1.count() == 0L, "a dv-only commit adds no files")
    spark.conf.unset(Manifest.KeepConf)
  }

  test("vacuum reclaims sidecars no kept manifest names") {
    val dir = freshDir("graft-dv-vacuum")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Layout.deleteWhere(spark, dir, Seq(("x", 0L, 0L)), mode = "dv")
    val first = dvSidecars(dir)
    assert(first.size == 1)
    // two more commits (keep=2 default) push the first sidecar's
    // generation out of retention; its sidecar must be reclaimed
    Layout.deleteWhere(spark, dir, Seq(("x", 1L, 1L)), mode = "dv")
    Layout.deleteWhere(spark, dir, Seq(("x", 2L, 2L)), mode = "dv")
    val now = dvSidecars(dir)
    assert(!now.contains(first.head), s"vacuum must reclaim ${first.head}: $now")
    assert(Layout.readSnapshot(spark, dir).count() == 97L)
  }

  test("SQL surface: SET spark.graft.delete.mode=dv routes DELETE FROM to merge-on-read") {
    val dir = freshDir("graft-dv-sql")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val before = leafFiles(dir)
    spark.conf.set(graft.plans.MutationSqlRule.DeleteModeConf, "dv")
    try {
      val row = spark.sql(s"DELETE FROM parquet.`$dir` WHERE x BETWEEN 10 AND 19").head()
      assert(row.getLong(1) == 0L && row.getLong(3) == 1L,
        s"rewritten=0, dv_files=1 expected: $row")
      assert(leafFiles(dir) == before, "no data file touched")
      assert(Layout.readSnapshot(spark, dir).count() == 190L)
    } finally spark.conf.unset(graft.plans.MutationSqlRule.DeleteModeConf)
  }

  test("dv delete on a hive-partitioned table keys positions by leaf-relative path") {
    val dir = freshDir("graft-dv-part")
    (0 to 999).map(i => (i % 3, i.toLong, i.toLong)).toDF("p", "x", "v")
      .write.partitionBy("p").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val stats = Layout.deleteWhere(spark, dir, Seq(("x", 0L, 9L)), mode = "dv")
    assert(stats.rewrittenFiles == 0L && stats.dvFiles >= 1L, s"$stats")
    val snap = Layout.readSnapshot(spark, dir)
    assert(snap.count() == 990L)
    assert(snap.filter($"x" < 10L).count() == 0L)
    // partition values survive the DV filter
    assert(snap.filter($"p" === 1).count() ===
      (0 to 999).count(i => i % 3 == 1 && i >= 10).toLong)
  }

  test("dv upsert: matched positions marked, replacements appended, zero candidate rewrites") {
    val dir = freshDir("graft-dv-ups")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    val before = leafFiles(dir)
    val updates = ((50L to 59L) ++ (1000L to 1004L)).map(k => (k, -k)).toDF("k", "v")
    val stats = Layout.upsert(spark, dir, updates, "k", mode = "dv")
    assert(stats.rewrittenFiles == 0L && stats.dvFiles == 1L &&
      stats.untouchedFiles == 1L, s"merge-on-read upsert: $stats")
    // ORIGINAL candidate files byte-identical; replacements are NEW files
    val after = leafFiles(dir)
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      "no pre-existing file touched")
    assert(after.size > before.size, "replacements appended as new files")
    val got = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().toMap
    assert(got.size == 205)
    assert((50L to 59L).forall(k => got(k) == -k), "matched keys replaced")
    assert((1000L to 1004L).forall(k => got(k) == -k), "new keys inserted")
    assert((0L to 49L).forall(k => got(k) == k * 10L) &&
      (200L to 299L).forall(k => got(k) == k * 10L), "everything else intact")
    // a SECOND dv upsert on the same keys replaces again (positions
    // union; the first round's appended rows live in new files, which
    // now classify as candidates and get their own positions)
    val s2 = Layout.upsert(spark, dir,
      Seq((55L, 555L)).toDF("k", "v"), "k", mode = "dv")
    assert(s2.rewrittenFiles == 0L, s"$s2")
    val got2 = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().toMap
    assert(got2(55L) == 555L && got2.size == 205)
    // reify materializes the whole history; plain read then agrees
    Layout.reifyDeletes(spark, dir)
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().toMap == got2)
  }

  test("dv updateWhere: positions marked, updated versions appended, no-op boxes commit nothing") {
    val dir = freshDir("graft-dv-updw")
    (0L to 99L).map(x => (x, x * 10L)).toDF("a", "b").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x * 10L)).toDF("a", "b").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("a"))
    // first delete some rows via DV, then a dv-update over a box that
    // OVERLAPS them: the already-deleted rows must NOT resurrect as
    // updated copies (the appended-updates read is DV-filtered)
    Layout.deleteWhere(spark, dir, Seq(("a", 10L, 12L)), mode = "dv")
    val before = leafFiles(dir)
    val stats = Layout.updateWhere(spark, dir, Seq(("a", 10L, 19L)),
      Seq("b" -> (col("b") + 1L)), mode = "dv")
    assert(stats.rewrittenFiles == 0L && stats.dvFiles == 1L, s"$stats")
    assert(before.forall { case (n, m) => leafFiles(dir).get(n).contains(m) },
      "no pre-existing file touched")
    val got = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().toMap
    assert(got.size == 197, s"3 deleted, none resurrected: ${got.size}")
    assert((13L to 19L).forall(a => got(a) == a * 10L + 1L), "box rows updated")
    assert(!got.contains(10L) && !got.contains(11L) && !got.contains(12L))
    assert(got(9L) == 90L && got(200L) == 2000L, "outside the box untouched")
    // SQL surface + store-assignment types
    spark.conf.set(graft.plans.MutationSqlRule.UpdateModeConf, "dv")
    try {
      val row = spark.sql(
        s"UPDATE parquet.`$dir` SET b = b * 2 WHERE a BETWEEN 200 AND 204").head()
      assert(row.getLong(1) == 0L && row.getLong(3) == 1L, s"$row")
    } finally spark.conf.unset(graft.plans.MutationSqlRule.UpdateModeConf)
    val got2 = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().toMap
    assert((200L to 204L).forall(a => got2(a) == a * 20L))
    assert(spark.read.parquet(dir).schema("b").dataType ==
      org.apache.spark.sql.types.LongType)
    // a box provably missing every file is a clean no-op (no commit)
    val seqBefore = Manifest.latestSeq(spark, dir)
    val s3 = Layout.updateWhere(spark, dir, Seq(("a", 5000L, 6000L)),
      Seq("b" -> lit(0L)), mode = "dv")
    assert(s3.rewrittenFiles == 0L && s3.dvFiles == 0L, s"$s3")
    assert(Manifest.latestSeq(spark, dir) == seqBefore, "no-op must not commit")
  }

  test("dv GENERAL merge: full arm matrix marks positions, appends images, rewrites nothing") {
    import Layout.{MatchedDelete, MatchedUpdateSet}
    def build(prefix: String): String = {
      val dir = freshDir(prefix)
      (0L to 99L).map(k => (k, k * 10L, "old")).toDF("k", "v", "tag")
        .coalesce(1).write.mode("append").parquet(dir)
      (200L to 299L).map(k => (k, k * 10L, "old")).toDF("k", "v", "tag")
        .coalesce(1).write.mode("append").parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("k"))
      dir
    }
    val source = ((10L to 19L) ++ (500L to 504L)).map(k => (k, -k, "new")).toDF("k", "v", "tag")
    def runMerge(dir: String, mode: String) = Layout.merge(spark, dir, source, Seq("k"),
      matched = Seq(
        MatchedDelete(Some(col("v") === lit(100L))),            // k=10 deletes
        MatchedUpdateSet(Seq("v" -> col("_src_v"), "tag" -> lit("upd")),
          Some(col("k") >= lit(15L)))),                          // k in [15,19] updates
      insertUnmatched = true,
      insertCond = Some(col("k") >= lit(502L)),                  // 502-504 insert
      notMatchedBySource = Seq(
        MatchedDelete(Some(col("k") === lit(250L)))),            // one by-source delete
      mode = mode)
    // copy mode is the oracle for dv mode — identical results
    val cDir = build("graft-dv-gm-copy"); runMerge(cDir, "copy")
    val dDir = build("graft-dv-gm-dv")
    val before = leafFiles(dDir)
    val stats = runMerge(dDir, "dv")
    assert(stats.rewrittenFiles == 0L && stats.droppedFiles == 0L &&
      stats.dvFiles >= 1L, s"merge-on-read general merge: $stats")
    assert(before.forall { case (n, m) => leafFiles(dDir).get(n).contains(m) },
      "no pre-existing file touched")
    val want = Layout.readSnapshot(spark, cDir)
      .as[(Long, Long, String)].collect().toSet
    val got = Layout.readSnapshot(spark, dDir)
      .as[(Long, Long, String)].collect().toSet
    assert(got == want, s"dv and copy agree:\n extra=${got -- want}\n missing=${want -- got}")
    // spot semantics: 10 deleted, 11-14 match no arm (kept), 15-19
    // updated, 250 by-source-deleted, 502-504 inserted, 500-501 filtered
    val byK = got.map(r => r._1 -> r).toMap
    assert(!byK.contains(10L) && !byK.contains(250L))
    assert(byK(11L) == ((11L, 110L, "old")))
    assert(byK(15L) == ((15L, -15L, "upd")))
    assert(byK(502L) == ((502L, -502L, "new")) && !byK.contains(500L))
    // CDC across the dv merge delivers paired update images + deletes
    val seq1 = Manifest.latestSeq(spark, dDir).get
    val d = Layout.readChangeRows(spark, dDir, seq1 - 1, Some(seq1))
      .select("_change_type", "k").as[(String, Long)].collect()
    val byType = d.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byType("update_preimage") == (15L to 19L) &&
      byType("update_postimage") == (15L to 19L), s"paired update images: $byType")
    assert(byType("delete").sorted == Seq(10L, 250L), s"deletes: $byType")
    assert(byType("insert") == (502L to 504L), s"inserts: $byType")
    // reify converges; plain read agrees with the snapshot
    Layout.reifyDeletes(spark, dDir)
    assert(spark.read.parquet(dDir).as[(Long, Long, String)].collect().toSet == want)
    // SQL surface: the general-merge command honors the mode conf
    val sDir = build("graft-dv-gm-sql")
    val beforeS = leafFiles(sDir)
    source.createOrReplaceTempView("dv_gm_src")
    spark.conf.set(graft.plans.MutationSqlRule.MergeModeConf, "dv")
    try {
      val row = spark.sql(
        s"""MERGE INTO parquet.`$sDir` AS t USING dv_gm_src AS s ON t.k = s.k
           |WHEN MATCHED AND t.v = 100 THEN DELETE
           |WHEN MATCHED AND t.k >= 15 THEN UPDATE SET v = s.v, tag = 'upd'
           |WHEN NOT MATCHED AND s.k >= 502 THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE AND t.k = 250 THEN DELETE""".stripMargin).head()
      assert(row.getLong(1) == 0L && row.getLong(3) >= 1L,
        s"rewritten=0, dv positions recorded: $row")
    } finally spark.conf.unset(graft.plans.MutationSqlRule.MergeModeConf)
    assert(beforeS.forall { case (n, m) => leafFiles(sDir).get(n).contains(m) },
      "SQL dv merge touched no pre-existing file")
    assert(Layout.readSnapshot(spark, sDir)
      .as[(Long, Long, String)].collect().toSet == want, "SQL dv merge agrees")
  }

  test("CDC across a dv upsert pairs update images via the recorded key") {
    val dir = freshDir("graft-dv-ups-cdc")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    Manifest.write(spark, dir)
    val seq0 = Manifest.latestSeq(spark, dir).get
    Layout.upsert(spark, dir,
      (10L to 14L).map(k => (k, -k)).toDF("k", "v"), "k", mode = "dv")
    val seq1 = Manifest.latestSeq(spark, dir).get
    val d = Layout.readChangeRows(spark, dir, seq0, Some(seq1))
      .select("_change_type", "k", "v").as[(String, Long, Long)].collect().toSet
    val expect = (10L to 14L).flatMap(k =>
      Seq(("update_preimage", k, k), ("update_postimage", k, -k))).toSet
    assert(d == expect, s"paired update images through the DV commit: $d")
  }

  test("per-file materialize threshold: heavily-deleted files rewrite, light ones stay DV'd") {
    val dir = freshDir("graft-dv-thresh")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    spark.conf.set(Layout.DvMaterializeThresholdConf, "0.3")
    try {
      // 40% of file A deleted > 30% threshold: A materializes in the
      // same verb call (its sidecar entries clear); B never probed
      val s1 = Layout.deleteWhere(spark, dir, Seq(("x", 0L, 39L)), mode = "dv")
      assert(s1.rewrittenFiles == 1L && s1.dvFiles == 1L, s"$s1")
      assert(Manifest.info(spark, dir).dv.isEmpty,
        "the only DV'd file materialized - sidecar cleared")
      assert(Layout.readSnapshot(spark, dir).count() == 160L)
      assert(spark.read.parquet(dir).count() == 160L,
        "materialized file is physically compact")
      // 10% of file B < threshold: stays merge-on-read, zero rewrites
      val s2 = Layout.deleteWhere(spark, dir, Seq(("x", 200L, 209L)), mode = "dv")
      assert(s2.rewrittenFiles == 0L && s2.dvFiles == 1L, s"$s2")
      assert(Manifest.info(spark, dir).dv.nonEmpty, "light delete stays DV'd")
      assert(Layout.readSnapshot(spark, dir).count() == 150L)
    } finally spark.conf.unset(Layout.DvMaterializeThresholdConf)
  }

  test("the pending-positions cap declines bulk merge-on-read mutations loudly") {
    val dir = freshDir("graft-dv-cap")
    (0L to 999L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    spark.conf.set(Layout.DvMaxPositionsConf, "100")
    try {
      // 500 positions > cap 100: the bulk delete must decline naming the
      // remedy, leaving the table untouched and uncommitted
      val ex = intercept[IllegalArgumentException] {
        Layout.deleteWhere(spark, dir, Seq(("x", 0L, 499L)), mode = "dv")
      }
      assert(ex.getMessage.contains("mode=copy") &&
        ex.getMessage.contains(Layout.DvMaxPositionsConf), ex.getMessage)
      // bootstrap commit aside, no mutation landed
      assert(Layout.readSnapshot(spark, dir).count() == 1000L)
      assert(dvSidecars(dir).isEmpty, "no orphan sidecar")
      // under the cap the same verb goes through, and the cap counts the
      // TOTAL including carried positions
      val s = Layout.deleteWhere(spark, dir, Seq(("x", 0L, 49L)), mode = "dv")
      assert(s.dvFiles == 1L, s"$s")
      val ex2 = intercept[IllegalArgumentException] {
        Layout.deleteWhere(spark, dir, Seq(("x", 50L, 120L)), mode = "dv")
      }
      assert(ex2.getMessage.contains("121 pending"), ex2.getMessage)
      assert(Layout.readSnapshot(spark, dir).count() == 950L, "first delete intact")
    } finally spark.conf.unset(Layout.DvMaxPositionsConf)
  }

  test("the DV read plan is ONE codegen'd filter over the scan - no join, no shuffle") {
    val dir = freshDir("graft-dv-plan")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Layout.deleteWhere(spark, dir, Seq(("x", 0L, 4L)), mode = "dv")
    val snap = Layout.readSnapshot(spark, dir)
    val plan = snap.queryExecution.executedPlan.toString
    // the probe is a broadcast-map binary search inside a plain Filter:
    // 8 bytes/position read-side (not exploded path-string rows), and
    // the data side never joins or shuffles at all
    assert(plan.contains("graft_dv_deleted"),
      s"DV filter must plan as the codegen'd probe expression:\n$plan")
    assert(!plan.contains("Join"), s"DV probe must not plan a join:\n$plan")
    assert(!plan.contains("Exchange"), s"DV probe must not shuffle:\n$plan")
    // codegen'd operators print with the `*(n)` stage prefix — the
    // probe filter must carry it (a CodegenFallback would print bare)
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dv_deleted") && l.trim.matches("""^[+:|\-\s]*\*\(\d+\) Filter.*""")),
      s"DV probe must stay inside whole-stage codegen:\n$plan")
    assert(snap.as[(Long, Long)].collect().map(_._1).sorted.toSeq == (5L to 99L),
      "probe filters exactly the recorded positions")
  }

  test("the DV read SPLITS on the sidecar's file set: clean files never pay the probe") {
    val dir = freshDir("graft-dv-split")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    (400L to 499L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    // positions land in ONE file; the other two files stay clean (the
    // adaptive gate defaults to 32 clean files — force the split here)
    spark.conf.set(Layout.DvSplitMinCleanFilesConf, "1")
    Layout.deleteWhere(spark, dir, Seq(("x", 10L, 19L)), mode = "dv")
    val snap = Layout.readSnapshot(spark, dir)
    val plan = snap.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), s"split plan expected:\n$plan")
    // exactly ONE probe filter (the DV'd side); the clean side carries
    // neither the probe nor the metadata materialization
    assert(plan.sliding("graft_dv_deleted".length).count(_ == "graft_dv_deleted") == 2,
      s"one Filter spelling the probe once in condition + once in scan bookkeeping:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"split adds no shuffle and no join:\n$plan")
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2, s"two disjoint scans (clean + probed), got $scans:\n$plan")
    assert(snap.as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      ((0L to 9L) ++ (20L to 99L) ++ (200L to 299L) ++ (400L to 499L)),
      "split serves exactly the live rows")
    // a box query over the split still prunes and answers exactly
    assert(snap.filter($"x".between(0L, 25L)).count() == 16L)
    // below the gate the read keeps the single probe-everywhere scan
    spark.conf.unset(Layout.DvSplitMinCleanFilesConf)
    val gated = Layout.readSnapshot(spark, dir)
    val gatedPlan = gated.queryExecution.executedPlan.toString
    assert(!gatedPlan.contains("Union"),
      s"2 clean files < the 32-file gate: one scan expected:\n$gatedPlan")
    assert(gated.count() == 290L, "gated plan serves the same rows")
  }

  test("stats-only aggregates never answer from the index through a pending DV") {
    val dir = freshDir("graft-dv-aggguard")
    (0L to 99L).map(x => (x, x)).toDF("x", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x", "v"))
    Layout.deleteWhere(spark, dir, Seq(("x", 0L, 9L)), mode = "dv")
    // the envelope index still describes all 100 physical rows; the
    // probe filter references _metadata, which no envelope covers, so
    // EnvelopeAggRule must decline and the aggregate must count LIVE rows
    val r = Layout.readSnapshot(spark, dir)
      .agg(count(lit(1)).as("n"), sum($"v").as("s")).head()
    assert(r.getLong(0) == 90L, s"count must see live rows only, got ${r.getLong(0)}")
    assert(r.getLong(1) == (10L to 99L).sum, s"sum must see live rows only")
  }

  test("no index: dv delete scans everything once but still rewrites nothing") {
    val dir = freshDir("graft-dv-noidx")
    (0L to 99L).toDF("x").coalesce(2).write.parquet(dir)
    val before = leafFiles(dir)
    val stats = Layout.deleteWhere(spark, dir, Seq(("x", 10L, 19L)), mode = "dv")
    assert(stats.rewrittenFiles == 0L, s"$stats")
    assert(leafFiles(dir) == before)
    assert(Layout.readSnapshot(spark, dir).as[Long].collect().sorted.toSeq ==
      ((0L to 9L) ++ (20L to 99L)))
  }
}
