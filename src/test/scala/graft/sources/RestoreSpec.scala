package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout.restore — rollback to a retained snapshot: the target
  * generation physically moves back in (retired files return, later
  * files retire), schemas and the DV reference re-commit, the envelope
  * index rebuilds, and history stays append-only (a restore is itself
  * undoable within retention). */
class RestoreSpec extends AnyFunSuite {

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

  test("restore undoes a delete; the restore is itself undoable; mutations keep working") {
    val dir = freshDir("graft-restore")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
      (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("k"))
      Manifest.write(spark, dir)
      val seq0 = Manifest.latestSeq(spark, dir).get
      Layout.deleteWhere(spark, dir, Seq(("k", 0L, 49L)))
      val seqDel = Manifest.latestSeq(spark, dir).get
      assert(Layout.readSnapshot(spark, dir).count() == 150L)

      // RESTORE to the pre-delete generation: rows are back, and the
      // plain listing read agrees (files physically moved back)
      val seqRestored = Layout.restore(spark, dir, seq0)
      assert(seqRestored == seqDel + 1, "history is append-only")
      assert(Layout.readSnapshot(spark, dir).count() == 200L, "delete undone")
      assert(spark.read.parquet(dir).count() == 200L, "live listing restored")
      // the rebuilt index still classifies exactly: a fresh mutation
      // passes the stray guard and stabs at file grain
      val s = Layout.deleteWhere(spark, dir, Seq(("k", 200L, 299L)))
      assert(s.droppedFiles == 1L && s.untouchedFiles >= 1L, s"$s")
      assert(Layout.readSnapshot(spark, dir).count() == 100L)

      // restore FORWARD to the first-delete generation (undo the undo
      // path): the table is the post-delete state again
      Layout.restore(spark, dir, seqDel)
      assert(Layout.readSnapshot(spark, dir).as[(Long, Long)].collect()
        .map(_._1).toSet == ((50L to 99L) ++ (200L to 299L)).toSet)

      // restoring to the CURRENT seq is a no-op (no commit churn)
      val now = Manifest.latestSeq(spark, dir).get
      assert(Layout.restore(spark, dir, now) == now)
      assert(Manifest.latestSeq(spark, dir).contains(now))
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("restore across a widening commit narrows the schema back; across a DV commit restores the vector") {
    val dir = freshDir("graft-restore-schema")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("k"))
      Manifest.write(spark, dir)
      val seq0 = Manifest.latestSeq(spark, dir).get
      // widen + append rows carrying the new column
      Layout.addColumns(spark, dir, Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType)))
      Layout.append(spark, dir,
        Seq((1000L, 1L, 7L)).toDF("k", "v", "w"))
      assert(Layout.readSnapshot(spark, dir).columns.toSeq == Seq("k", "v", "w"))
      // rollback: schema narrows, the appended file is gone
      Layout.restore(spark, dir, seq0)
      val snap = Layout.readSnapshot(spark, dir)
      assert(snap.columns.toSeq == Seq("k", "v"), "schema restored")
      assert(snap.count() == 100L)

      // DV round trip: a dv delete, a reify, then restore to the DV
      // generation — the vector reference must come back with it
      Layout.deleteWhere(spark, dir, Seq(("k", 0L, 4L)), mode = "dv")
      val seqDv = Manifest.latestSeq(spark, dir).get
      assert(Manifest.info(spark, dir).dv.nonEmpty)
      Layout.reifyDeletes(spark, dir)
      assert(Manifest.info(spark, dir).dv.isEmpty)
      Layout.restore(spark, dir, seqDv)
      assert(Manifest.info(spark, dir).dv.nonEmpty, "DV reference restored")
      assert(Layout.readSnapshot(spark, dir).count() == 95L, "vector filters again")
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("restore past the retention horizon fails with the retention contract; SQL surface works") {
    val dir = freshDir("graft-restore-sql")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    Manifest.write(spark, dir) // seq 0, default keep = 2
    val seq0 = Manifest.latestSeq(spark, dir).get
    Layout.deleteWhere(spark, dir, Seq(("k", 0L, 9L)))
    Layout.deleteWhere(spark, dir, Seq(("k", 10L, 19L)))
    Layout.deleteWhere(spark, dir, Seq(("k", 20L, 29L))) // seq0 vacuumed by now
    val ex = intercept[IllegalArgumentException](Layout.restore(spark, dir, seq0))
    assert(ex.getMessage.contains("not retained"), ex.getMessage)
    // SQL: roll back one committed step through the table function
    graft.GraftTableFunctions.ensure(spark)
    val prev = Manifest.latestSeq(spark, dir).get - 1
    spark.sql(s"SELECT * FROM graft_restore('$dir', $prev)").collect()
    assert(Layout.readSnapshot(spark, dir).as[(Long, Long)].collect()
      .map(_._1).toSet == (20L to 99L).toSet, "one delete undone via SQL")
  }

  test("a crash mid-restore heals: the intent marker completes the interrupted pass") {
    val dir = freshDir("graft-restore-crash")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
      (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("k"))
      Manifest.write(spark, dir)
      val seq0 = Manifest.latestSeq(spark, dir).get
      Layout.deleteWhere(spark, dir, Seq(("k", 0L, 49L)))
      assert(Layout.readSnapshot(spark, dir).count() == 150L)

      // manufacture the half-restored state a crash between the marker
      // and the commit leaves: intent staged, ONE target file already
      // moved back from retired to live
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val intent = new org.apache.hadoop.fs.Path(
        Manifest.manifestsPath(dir), "restore-intent")
      val out = fs.create(intent, true)
      out.write(seq0.toString.getBytes("UTF-8")); out.close()
      val target = Manifest.info(spark, dir, Some(seq0))
      val curSet = Manifest.info(spark, dir).files.toSet
      val toMove = target.files.filterNot(curSet).head
      val retired = new org.apache.hadoop.fs.Path(
        Manifest.retiredPath(dir) + "/" + toMove)
      val live = new org.apache.hadoop.fs.Path(
        fs.makeQualified(new org.apache.hadoop.fs.Path(dir)) + "/" + toMove)
      assert(fs.rename(retired, live), "test setup: simulate the half-move")

      // the moved-back file is a stray against the latest manifest — a
      // mutation verb still refuses (writer-exclusive contract intact)
      val exStray = intercept[IllegalArgumentException] {
        Layout.deleteWhere(spark, dir, Seq(("k", 60L, 69L)))
      }
      assert(exStray.getMessage.contains("not in the committed snapshot"))

      // restore HEALS: it completes the recorded pass (to seq0), then
      // serves the requested restore — here the same target, so the
      // heal's commit is the answer and the marker is gone
      val healed = Layout.restore(spark, dir, seq0)
      assert(!fs.exists(intent), "intent cleared after the healing commit")
      assert(Manifest.latestSeq(spark, dir).contains(healed))
      assert(Layout.readSnapshot(spark, dir).count() == 200L, "restore completed exactly")
      assert(spark.read.parquet(dir).count() == 200L, "no duplicate generations live")

      // and a crash AFTER the commit but BEFORE the marker delete: the
      // heal recognizes the already-restored state and only cleans up
      val out2 = fs.create(intent, true)
      out2.write(healed.toString.getBytes("UTF-8")); out2.close()
      val before = Manifest.latestSeq(spark, dir).get
      Layout.deleteWhere(spark, dir, Seq(("k", 0L, 4L))) // next verb unaffected…
      assert(fs.exists(intent), "marker still staged")
      val again = Layout.restore(spark, dir, before)
      assert(!fs.exists(intent), "post-commit crash heals to a marker cleanup")
      assert(Layout.readSnapshot(spark, dir).count() == 200L)
      assert(again == Manifest.latestSeq(spark, dir).get)
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("history lists exactly the retained, restorable generations") {
    val dir = freshDir("graft-history")
    spark.conf.set(Manifest.KeepConf, "3")
    try {
      (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("k"))
      Manifest.write(spark, dir)
      Layout.deleteWhere(spark, dir, Seq(("k", 0L, 9L)), mode = "dv")
      Layout.deleteWhere(spark, dir, Seq(("k", 10L, 19L)))
      graft.GraftTableFunctions.ensure(spark)
      val h = spark.sql(s"SELECT seq, n_files, dv, cdc_pair_key FROM graft_history('$dir')")
        .collect()
      assert(h.length == 3, s"keep=3 retains three generations: ${h.length}")
      assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L), "newest first")
      // the DV generation carries its sidecar name; the copy delete
      // cleared it (the touched file materialized the only entries)
      val bySeq = h.map(r => r.getLong(0) -> r).toMap
      assert(bySeq(2L).isNullAt(2),
        "the copy delete rewrote the only DV'd file - no pending DV after")
      assert(!bySeq(1L).isNullAt(2), "the DV generation names its sidecar")
      // every listed seq is readable and restorable
      h.map(_.getLong(0)).foreach { s =>
        assert(Layout.readSnapshot(spark, dir, Some(s)).count() > 0)
      }
      Layout.restore(spark, dir, 0L)
      assert(Layout.readSnapshot(spark, dir).count() == 100L)
    } finally spark.conf.unset(Manifest.KeepConf)
  }
}
