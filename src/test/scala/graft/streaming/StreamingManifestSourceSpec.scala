package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DirSwap
import graft.sources.{Layout, Manifest}

/** The `graft-manifest` streaming source: offsets are manifest seqs,
  * micro-batches are committed file-set deltas — torn batches are
  * invisible, restarts are exactly-once from the checkpointed seq, and
  * maintenance rewrites either re-deliver (file-level CDC, documented)
  * or fail loudly under `onRewrite=fail`. */
class StreamingManifestSourceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def tail(dir: String, cp: String, got: ConcurrentLinkedQueue[(Long, Long)],
                   options: Map[String, String] = Map.empty) = {
    val reader = spark.readStream.format("graft-manifest").option("path", dir)
    options.foreach { case (k, v) => reader.option(k, v) }
    reader.load().writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select($"x", $"y").collect().foreach(r => got.add((r.getLong(0), r.getLong(1))))
        ()
      }.start()
  }

  test("earliest: full snapshot first, then committed deltas only; restart is exactly-once") {
    val dir = tmp("manifest-src") + "/t"
    val cp = tmp("manifest-src-cp")
    // the documented deployment rule for tailed tables: retention must
    // cover the consumer's lag INCLUDING the restart replay of its last
    // batch (the engine re-resolves that batch's start offset)
    spark.conf.set(Manifest.KeepConf, "10")
    try {
    val b0 = (1 to 300).map(i => (i.toLong, (i % 7).toLong))
    val b1 = (1001 to 1100).map(i => (i.toLong, (i % 7).toLong))
    b0.toDF("x", "y").write.parquet(dir)
    Manifest.write(spark, dir)
    val got = new ConcurrentLinkedQueue[(Long, Long)]()
    val q = tail(dir, cp, got, Map("startingSeq" -> "earliest"))
    try {
      q.processAllAvailable()
      assert(got.size == 300, s"first batch must be the full snapshot, got ${got.size}")
      // an UNCOMMITTED append is invisible to the tail
      b1.toDF("x", "y").write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(got.size == 300, "a torn (unmanifested) append leaked into the stream")
      // committing it delivers exactly the delta
      Manifest.write(spark, dir)
      q.processAllAvailable()
      assert(got.size == 400)
      assert(got.toArray(Array.empty[(Long, Long)]).toSet == (b0 ++ b1).toSet)
    } finally q.stop()
    // restart from the checkpoint: only the NEXT delta flows, no replay
    val b2 = (2001 to 2050).map(i => (i.toLong, (i % 7).toLong))
    b2.toDF("x", "y").write.mode("append").parquet(dir)
    Manifest.write(spark, dir)
    val q2 = tail(dir, cp, got, Map("startingSeq" -> "earliest"))
    try {
      q2.processAllAvailable()
      assert(got.size == 450, s"restart must deliver only the new delta, got ${got.size}")
      assert(got.toArray(Array.empty[(Long, Long)]).toSet == (b0 ++ b1 ++ b2).toSet)
    } finally q2.stop()
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("latest: nothing until the next commit; onRewrite=fail stops on a maintenance rewrite") {
    val dir = tmp("manifest-src-latest") + "/t"
    val cp = tmp("manifest-src-latest-cp")
    (1 to 200).map(i => (i.toLong, (i % 5).toLong)).toDF("x", "y")
      .repartition(2).write.parquet(dir)
    Manifest.write(spark, dir)
    val got = new ConcurrentLinkedQueue[(Long, Long)]()
    val q = tail(dir, cp, got, Map("startingSeq" -> "latest", "onRewrite" -> "fail"))
    try {
      q.processAllAvailable()
      assert(got.isEmpty, "startingSeq=latest must not deliver pre-existing data")
      val delta = (501 to 520).map(i => (i.toLong, (i % 5).toLong))
      delta.toDF("x", "y").write.mode("append").parquet(dir)
      Manifest.write(spark, dir)
      q.processAllAvailable()
      assert(got.toArray(Array.empty[(Long, Long)]).toSet == delta.toSet)
      // a maintenance rewrite removes files between commits: fail mode
      // must stop the query loudly instead of re-delivering the table
      DirSwap.swapRewrite(spark, dir, Some(Manifest.retiredPath(dir)))(
        Layout.cluster(_, Seq("x", "y"), 1))(
        (d, out) => d.write.mode("overwrite").parquet(out))
      Manifest.write(spark, dir)
      val ex = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
      assert(messages(ex).contains("maintenance rewrite"),
        s"expected the onRewrite=fail message, got: ${messages(ex).take(300)}")
    } finally q.stop()
  }

  test("a deleteWhere commit under a live tail: fail stops loudly, redeliver ships replacements") {
    val dir = tmp("manifest-src-del") + "/t"
    import scala.jdk.CollectionConverters._
    // three single-file chunks with known x-ranges
    (1L to 100L).map(x => (x, x % 5)).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    (101L to 200L).map(x => (x, x % 5)).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    (201L to 300L).map(x => (x, x % 5)).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Manifest.write(spark, dir)
    // fail mode: a DELETE removes files between commits -> loud stop
    val got = new ConcurrentLinkedQueue[(Long, Long)]()
    val q = tail(dir, tmp("manifest-src-del-cp1"), got,
      Map("startingSeq" -> "earliest", "onRewrite" -> "fail"))
    try {
      q.processAllAvailable()
      assert(got.size == 300)
      Layout.deleteWhere(spark, dir, Seq(("x", 1L, 100L))) // drops chunk 1 whole
      val ex = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
      assert(messages(ex).contains("maintenance rewrite"),
        s"a delete commit must trip onRewrite=fail: ${messages(ex).take(300)}")
    } finally q.stop()
    // redeliver mode (default): a fresh tail sees the next delete's
    // REPLACEMENT file — the kept rows of the rewritten chunk, never the
    // deleted ones (the documented file-level-CDC trade)
    val got2 = new ConcurrentLinkedQueue[(Long, Long)]()
    val q2 = tail(dir, tmp("manifest-src-del-cp2"), got2,
      Map("startingSeq" -> "latest"))
    try {
      q2.processAllAvailable()
      assert(got2.isEmpty)
      Layout.deleteWhere(spark, dir, Seq(("x", 101L, 150L))) // rewrites chunk 2
      q2.processAllAvailable()
      val xs = got2.asScala.map(_._1).toSet
      assert(xs == (151L to 200L).toSet,
        s"the delta must be exactly the rewritten chunk's kept rows: $xs")
    } finally q2.stop()
  }

  test("the ecosystem loop: a selfClusteringSink table tailed downstream, commit-aligned") {
    val table = tmp("manifest-src-loop") + "/t"
    val cp = tmp("manifest-src-loop-cp")
    // writer: three sink batches (no rewrite: clusterEveryBatches high)
    val got = new ConcurrentLinkedQueue[(Long, Long)]()
    StreamingPipeline.processClusterBatch(
      (1 to 100).map(i => (i.toLong, i.toLong)).toDF("x", "y"), 0L,
      Seq("x", "y"), table, clusterEveryBatches = 1000, targetFiles = 4)
    val q = tail(table, cp, got, Map("startingSeq" -> "earliest"))
    try {
      q.processAllAvailable()
      assert(got.size == 100)
      StreamingPipeline.processClusterBatch(
        (201 to 260).map(i => (i.toLong, i.toLong)).toDF("x", "y"), 1L,
        Seq("x", "y"), table, clusterEveryBatches = 1000, targetFiles = 4)
      q.processAllAvailable()
      assert(got.size == 160, "the downstream tail must see exactly the committed sink batches")
      // replayed upstream batch -> no new manifest rows -> nothing downstream
      StreamingPipeline.processClusterBatch(
        (201 to 260).map(i => (i.toLong, i.toLong)).toDF("x", "y"), 1L,
        Seq("x", "y"), table, clusterEveryBatches = 1000, targetFiles = 4)
      q.processAllAvailable()
      assert(got.size == 160, "an upstream replay leaked duplicate rows downstream")
    } finally q.stop()
  }

  test("cdc=rows: a delete streams exactly the deleted rows; a maintenance rewrite streams ZERO rows") {
    import scala.jdk.CollectionConverters._
    val dir = tmp("manifest-src-rows") + "/t"
    val cp = tmp("manifest-src-rows-cp")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 299L).map(x => (x, x % 7)).toDF("x", "y")
        .repartition(3).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("x"))
      Manifest.write(spark, dir)
      val got = new ConcurrentLinkedQueue[(Long, String)]()
      val q = spark.readStream.format("graft-manifest")
        .option("path", dir).option("startingSeq", "earliest").option("cdc", "rows")
        .load().writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select($"x", $"_change_type").collect()
            .foreach(r => got.add((r.getLong(0), r.getString(1))))
          ()
        }.start()
      try {
        q.processAllAvailable()
        assert(got.size == 300 && got.asScala.forall(_._2 == "insert"),
          s"earliest first batch = full snapshot as inserts, got ${got.size}")
        got.clear()
        // a delete commit: the stream delivers EXACTLY the deleted rows
        Layout.deleteWhere(spark, dir, Seq(("x", 100L, 149L)))
        q.processAllAvailable()
        val dels = got.asScala.toSeq
        assert(dels.forall(_._2 == "delete") &&
          dels.map(_._1).sorted == (100L to 149L),
          s"delta must be the deleted rows: ${dels.take(5)}... (${dels.size})")
        got.clear()
        // a pure clustering rewrite: file-level CDC would re-deliver the
        // whole table; row-level CDC cancels to nothing
        Layout.clusterPartitions(spark, dir, Seq("x"), filesPerPartition = 2)
        q.processAllAvailable()
        assert(got.isEmpty, s"a maintenance rewrite must stream zero rows, got ${got.size}")
      } finally q.stop()
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("schema drift: a widened commit fails loudly under onSchemaDrift=fail, keeps running under warn") {
    val dir = tmp("manifest-src-drift") + "/t"
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (1 to 50).map(i => (i.toLong, (i % 7).toLong)).toDF("x", "y").write.parquet(dir)
      Manifest.write(spark, dir)

      def run(mode: String, cp: String, got: ConcurrentLinkedQueue[(Long, Long)]) =
        tail(dir, cp, got, Map("startingSeq" -> "earliest", "onSchemaDrift" -> mode))

      // fail mode: stream pinned to (x, y); a commit that adds z stops it
      val gotF = new ConcurrentLinkedQueue[(Long, Long)]()
      val qf = run("fail", tmp("drift-cp-f"), gotF)
      try {
        qf.processAllAvailable()
        assert(gotF.size == 50)
        val widened = (51 to 60).map(i => (i.toLong, (i % 7).toLong, i.toString))
          .toDF("x", "y", "z")
        widened.write.mode("append").parquet(dir)
        // commit the WIDENED schema explicitly (plain footer inference
        // may sample an old file; a real widening writer knows its schema)
        Manifest.write(spark, dir, schemas = Some((widened.schema,
          new org.apache.spark.sql.types.StructType())))
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          qf.processAllAvailable()
        }
        val msg = ex.getCause match { case null => ex.getMessage; case c => c.getMessage }
        assert(msg.contains("z") && msg.contains("pinned"), msg)
      } finally qf.stop()

      // warn mode (default): same drift keeps flowing, z dropped
      val gotW = new ConcurrentLinkedQueue[(Long, Long)]()
      val qw = run("warn", tmp("drift-cp-w"), gotW)
      try {
        qw.processAllAvailable()
        assert(gotW.size == 60, s"warn mode must keep serving, got ${gotW.size}")
      } finally qw.stop()
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("deletion-vector commits stream: cdc=rows ships the marked rows; snapshot batches materialize") {
    import scala.jdk.CollectionConverters._
    val dir = tmp("manifest-src-dv") + "/t"
    val cp = tmp("manifest-src-dv-cp")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 199L).map(x => (x, x % 5)).toDF("x", "y")
        .repartition(2).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("x"))
      Manifest.write(spark, dir)
      // a DV delete BEFORE the stream starts: the earliest snapshot
      // batch reads through the DV probe filter (a plain
      // single-relation plan since round 18) and must serve live rows
      Layout.deleteWhere(spark, dir, Seq(("x", 0L, 9L)), mode = "dv")
      val got = new ConcurrentLinkedQueue[(Long, String)]()
      val q = spark.readStream.format("graft-manifest")
        .option("path", dir).option("startingSeq", "earliest").option("cdc", "rows")
        .load().writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select($"x", $"_change_type").collect()
            .foreach(r => got.add((r.getLong(0), r.getString(1))))
          ()
        }.start()
      try {
        q.processAllAvailable()
        val first = got.asScala.toSeq
        assert(first.size == 190 && first.forall(_._2 == "insert"),
          s"the earliest full-snapshot batch is the LATEST snapshot, DV-FILTERED " +
            s"(190 live rows as inserts), got ${first.size}")
        got.clear()
        // a LIVE dv delete: the stream delivers exactly the marked rows
        Layout.deleteWhere(spark, dir, Seq(("x", 50L, 59L)), mode = "dv")
        q.processAllAvailable()
        val dels = got.asScala.toSeq
        assert(dels.forall(_._2 == "delete") &&
          dels.map(_._1).sorted == (50L to 59L), s"${dels.take(5)}... (${dels.size})")
        got.clear()
        // reify under the live tail: CDC-invisible
        Layout.reifyDeletes(spark, dir)
        q.processAllAvailable()
        assert(got.isEmpty, s"materialization must stream zero rows, got ${got.size}")
      } finally q.stop()
      // FILE-mode earliest over a DV'd table: the snapshot batch's plan
      // carries the DV probe filter — a single relation that streams
      // directly — and must serve the live rows
      Layout.deleteWhere(spark, dir, Seq(("x", 100L, 104L)), mode = "dv")
      val cp2 = tmp("manifest-src-dv-cp2")
      val n = new java.util.concurrent.atomic.AtomicLong(0L)
      val q2 = spark.readStream.format("graft-manifest")
        .option("path", dir).option("startingSeq", "earliest")
        .load().writeStream
        .option("checkpointLocation", cp2)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          n.addAndGet(batch.count()); ()
        }.start()
      try {
        q2.processAllAvailable()
        assert(n.get == 175L, s"file-mode snapshot batch = DV-filtered live rows: ${n.get}")
      } finally q2.stop()
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("cdc=rows streams a keyed upsert as paired update images") {
    val dir = tmp("manifest-src-rows-images") + "/t"
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 49L).map(x => (x, x % 7)).toDF("x", "y").coalesce(1).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("x"))
      Manifest.write(spark, dir)
      val got = new ConcurrentLinkedQueue[(Long, Long, String)]()
      val q = spark.readStream.format("graft-manifest")
        .option("path", dir).option("startingSeq", "earliest")
        .option("cdc", "rows")
        .load().writeStream
        .option("checkpointLocation", tmp("rows-images-cp"))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select($"x", $"y", $"_change_type").collect()
            .foreach(r => got.add((r.getLong(0), r.getLong(1), r.getString(2))))
          ()
        }.start()
      try {
        q.processAllAvailable()
        assert(got.size == 50, s"snapshot batch: ${got.size}")
        got.clear()
        // a keyed upsert commits ONE seq recording its pairing key —
        // the stream's next batch delivers the replaced row as PAIRED
        // images plus the fresh key as a plain insert
        Layout.upsert(spark, dir, Seq((7L, -1L), (900L, -2L)).toDF("x", "y"), "x")
        q.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val rows = got.asScala.toSeq.sorted
        assert(rows == Seq((7L, 0L, "update_preimage"), (7L, -1L, "update_postimage"),
          (900L, -2L, "insert")).sorted, s"got $rows")
      } finally q.stop()
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("cdc=rows across an addColumns widening: warn keeps streaming pinned columns, fail stops") {
    import scala.jdk.CollectionConverters._
    val dir = tmp("manifest-src-rows-drift") + "/t"
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 49L).map(x => (x, x % 7)).toDF("x", "y").coalesce(1).write.parquet(dir)
      Manifest.write(spark, dir)
      def run(mode: String, cp: String, got: ConcurrentLinkedQueue[(Long, String)]) =
        spark.readStream.format("graft-manifest")
          .option("path", dir).option("startingSeq", "earliest")
          .option("cdc", "rows").option("onSchemaDrift", mode)
          .load().writeStream
          .option("checkpointLocation", cp)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.select($"x", $"_change_type").collect()
              .foreach(r => got.add((r.getLong(0), r.getString(1))))
            ()
          }.start()
      // both streams pin (x, y) BEFORE the widening commit
      val gotW = new ConcurrentLinkedQueue[(Long, String)]()
      val gotF = new ConcurrentLinkedQueue[(Long, String)]()
      val qw = run("warn", tmp("rows-drift-cp-w"), gotW)
      val qf = run("fail", tmp("rows-drift-cp-f"), gotF)
      try {
        qw.processAllAvailable(); qf.processAllAvailable()
        assert(gotW.size == 50 && gotF.size == 50)
        gotW.clear(); gotF.clear()
        // a batch range SPANNING the widening commit: addColumns (pure
        // metadata) + a widened append in one range — warn mode must
        // deliver the appended rows with the pinned columns, not
        // hard-fail inside the row diff (the round-15 advice case)
        graft.sources.Layout.addColumns(spark, dir, Seq(
          org.apache.spark.sql.types.StructField("z",
            org.apache.spark.sql.types.DoubleType)))
        graft.sources.Layout.append(spark, dir,
          (50L to 59L).map(x => (x, x % 7, x * 2.0)).toDF("x", "y", "z"))
        qw.processAllAvailable()
        val rows = gotW.asScala.toSeq
        assert(rows.map(_._1).sorted == (50L to 59L) && rows.forall(_._2 == "insert"),
          s"warn mode must deliver the widened append's rows: $rows")
        // fail mode: the same widened commit stops its stream with the
        // documented drift message
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          qf.processAllAvailable()
        }
        val msg = ex.getCause match { case null => ex.getMessage; case c => c.getMessage }
        assert(msg.contains("z") && msg.contains("pinned"), msg)
      } finally { qw.stop(); qf.stop() }
    } finally spark.conf.unset(Manifest.KeepConf)
  }

  test("the source takes a registered NAME; a DV commit mid-stream streams its deleted rows") {
    import scala.jdk.CollectionConverters._
    val dir = tmp("manifest-src-name") + "/t"
    val cp = tmp("manifest-src-name-cp")
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (1 to 300).map(i => (i.toLong, (i % 7).toLong)).toDF("x", "y")
        .coalesce(1).write.parquet(dir)
      Manifest.write(spark, dir)
      graft.GraftCatalog.register(spark, "stream_name_t", dir)
      val got = new ConcurrentLinkedQueue[(Long, String)]()
      // the NAME, not the path — resolved at stream construction and
      // fixed for the run; cdc=rows so the mid-stream DV commit delivers
      // exactly its deleted rows
      val q = spark.readStream.format("graft-manifest")
        .option("path", "stream_name_t")
        .option("startingSeq", "earliest").option("cdc", "rows")
        .load().writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select($"x", $"_change_type").collect()
            .foreach(r => got.add((r.getLong(0), r.getString(1))))
          ()
        }.start()
      try {
        q.processAllAvailable()
        assert(got.size == 300 && got.asScala.forall(_._2 == "insert"),
          s"first batch = full snapshot as inserts, got ${got.size}")
        got.clear()
        // merge-on-read delete mid-stream: no file is rewritten, yet the
        // stream must deliver exactly the 50 deleted rows as 'delete'
        val s = Layout.deleteWhere(spark, dir, Seq(("x", 1L, 50L)), mode = "dv")
        assert(s.dvFiles == 1L && s.rewrittenFiles == 0L, s"$s")
        q.processAllAvailable()
        val rows = got.asScala.toSeq
        assert(rows.size == 50 && rows.forall(_._2 == "delete") &&
          rows.map(_._1).sorted == (1L to 50L), s"got $rows")
      } finally q.stop()
      // an unregistered bare name fails loudly, naming the surfaces
      val ex = intercept[Exception] {
        spark.readStream.format("graft-manifest")
          .option("path", "never_registered_name").load()
      }
      assert(ex.getMessage.contains("neither a path nor a registered"),
        ex.getMessage)
    } finally {
      spark.conf.unset(Manifest.KeepConf)
      graft.GraftCatalog.unregister(spark, "stream_name_t")
    }
  }
}
