package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftCatalog
import graft.sources.{Layout, Manifest}

/** [[GraftCatalog]] + [[GraftCatalogRule]]: session-scoped named tables
  * over manifest snapshots — `spark.table`, SQL reads, DML, and the
  * path-taking TVFs all speak the name; a name never serves a stale
  * plan; real catalog objects (temp views) win over registrations. */
class CatalogSpec extends AnyFunSuite {

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

  test("a registered name reads the LATEST snapshot, fresh per query") {
    val dir = freshDir("graft-cat-read")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    GraftCatalog.register(spark, "cat_events", dir)
    assert(Manifest.latestSeq(spark, dir).nonEmpty, "register bootstraps the manifest")
    assert(spark.table("cat_events").count() == 100L)
    assert(spark.sql("SELECT count(*) AS n FROM cat_events").head().getLong(0) == 100L)
    // a mutation commits; the NAME serves the new snapshot on the next
    // query — no stale-plan caching
    Layout.deleteWhere(spark, dir, Seq(("k", 0L, 9L)))
    assert(spark.table("cat_events").count() == 90L, "name re-resolves per query")
    // qualified column references through the alias work
    assert(spark.sql(
      "SELECT max(cat_events.k) AS m FROM cat_events").head().getLong(0) == 99L)
  }

  test("DML through a name lowers onto the verbs - including over a DV-carrying table") {
    val dir = freshDir("graft-cat-dml")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    GraftCatalog.register(spark, "cat_dml", dir)
    // DELETE through the name — file-grain stats row proves the verb ran
    val row = spark.sql("DELETE FROM cat_dml WHERE k BETWEEN 0 AND 9").head()
    assert(row.getLong(1) == 1L && row.getLong(2) == 1L,
      s"one file rewritten, one untouched: $row")
    assert(spark.table("cat_dml").count() == 190L)
    // put a DV on the table: the name now resolves through the probe
    // filter, and DML must still see through it to the dir
    Layout.deleteWhere(spark, dir, Seq(("k", 10L, 14L)), mode = "dv")
    assert(Manifest.info(spark, dir).dv.nonEmpty)
    assert(spark.table("cat_dml").count() == 185L, "name read applies the DV")
    Seq((20L, -20L), (1000L, -1L)).toDF("k", "v").createOrReplaceTempView("cat_dml_src")
    val m = spark.sql(
      """MERGE INTO cat_dml AS t USING cat_dml_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(m.getLong(1) >= 1L, s"merge through the name over a DV table: $m")
    val got = spark.table("cat_dml").as[(Long, Long)].collect().toMap
    assert(got(20L) == -20L && got(1000L) == -1L && !got.contains(10L))
    // UPDATE through the name too
    spark.sql("UPDATE cat_dml SET v = v + 1 WHERE k BETWEEN 30 AND 31").collect()
    val got2 = spark.table("cat_dml").as[(Long, Long)].collect().toMap
    assert(got2(30L) == 31L && got2(31L) == 32L)
  }

  test("INSERT INTO a named table appends through the manifest; plain paths keep stock behavior") {
    val dir = freshDir("graft-cat-ins")
    (0L to 49L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    GraftCatalog.register(spark, "cat_ins", dir)
    val seq0 = Manifest.latestSeq(spark, dir).get
    // positional INSERT lowers onto Layout.append: manifest commits,
    // snapshot sees the rows, the index stays fresh
    val r = spark.sql("INSERT INTO cat_ins VALUES (100, -1), (101, -2)").head()
    assert(r.getLong(0) == seq0 + 1, s"append committed a manifest: $r")
    assert(spark.table("cat_ins").count() == 52L)
    // the appended rows are in the COMMITTED snapshot: the next mutation
    // passes the stray guard and classifies over them
    val s = Layout.deleteWhere(spark, dir, Seq(("k", 100L, 101L)))
    assert(s.rewrittenFiles + s.droppedFiles >= 1L, s"$s")
    assert(spark.table("cat_ins").count() == 50L)
    // INSERT OVERWRITE and column lists decline loudly
    val ex = intercept[Exception](
      spark.sql("INSERT OVERWRITE cat_ins VALUES (1, 1)"))
    assert(ex.getMessage.contains("INSERT OVERWRITE"), ex.getMessage)
    val ex2 = intercept[Exception](
      spark.sql("INSERT INTO cat_ins (k) VALUES (7)"))
    assert(ex2.getMessage.contains("column list"), ex2.getMessage)
    // a PLAIN path-based parquet INSERT is untouched: Spark's own
    // behavior (its stock error here) — the lowering is gated on the
    // ManifestFileIndex read shape, never widened to arbitrary paths
    val plain = freshDir("graft-cat-plain")
    (0L to 9L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(plain)
    val ex3 = intercept[Exception](
      spark.sql(s"INSERT INTO parquet.`$plain` VALUES (100, -1)"))
    assert(!ex3.getMessage.contains("graft INSERT"),
      s"plain paths must keep Spark's stock handling: ${ex3.getMessage}")
    assert(spark.read.parquet(plain).count() == 10L, "no stray write happened")
  }

  test("temp views win over registrations; unregister unbinds; TVFs take names") {
    val dir = freshDir("graft-cat-tvf")
    (0L to 49L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    GraftCatalog.register(spark, "cat_tvf", dir)
    // a temp view with the same name shadows the registration
    Seq((1L, 1L)).toDF("k", "v").createOrReplaceTempView("cat_tvf")
    assert(spark.table("cat_tvf").count() == 1L, "temp view wins")
    spark.catalog.dropTempView("cat_tvf")
    assert(spark.table("cat_tvf").count() == 50L, "registration serves again")
    // path-taking TVFs accept the name
    graft.GraftTableFunctions.ensure(spark)
    val st = spark.sql("SELECT n_files FROM graft_table_stats('cat_tvf')").head()
    assert(st.getLong(0) == 1L, s"$st")
    assert(spark.sql("SELECT seq FROM graft_history('cat_tvf')").count() >= 1L)
    val c = spark.sql(s"SELECT * FROM graft_compact('cat_tvf', ${1L << 30})").head()
    assert(c.getLong(0) <= 1L) // single file: nothing (or one leaf) to roll up
    // SET-based registration works too (pure SQL, no Scala call)
    val dir2 = freshDir("graft-cat-sql")
    (0L to 9L).toDF("x").write.parquet(dir2)
    Manifest.write(spark, dir2)
    spark.sql(s"SET ${GraftCatalog.Prefix}cat_sql=$dir2")
    assert(spark.sql("SELECT count(*) AS n FROM cat_sql").head().getLong(0) == 10L)
    // unregister unbinds: the name falls through to Spark's own error
    GraftCatalog.unregister(spark, "cat_tvf")
    val ex = intercept[Exception](spark.table("cat_tvf").collect())
    assert(ex.getMessage.contains("cat_tvf"), ex.getMessage)
  }

  private def withRegistry[T](body: String => T): T = {
    val reg = Files.createTempDirectory("graft-cat-reg").resolve("registry").toString
    spark.conf.set(GraftCatalog.RegistryConf, reg)
    try body(reg)
    finally spark.conf.unset(GraftCatalog.RegistryConf)
  }

  test("SQL DDL: CREATE/DROP TABLE USING graft; a FRESH session resolves via the registry") {
    withRegistry { reg =>
      val dir = freshDir("graft-cat-ddl")
      (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
      spark.sql(s"CREATE TABLE cat_ddl USING graft LOCATION '$dir'")
      assert(spark.table("cat_ddl").count() == 100L)
      assert(spark.sql("SELECT count(*) AS n FROM graft.cat_ddl").head().getLong(0) == 100L,
        "the graft.-qualified form reads too")
      // duplicate CREATE errors; IF NOT EXISTS is a no-op
      val dup = intercept[Exception](
        spark.sql(s"CREATE TABLE cat_ddl USING graft LOCATION '$dir'"))
      assert(dup.getMessage.contains("already registered"), dup.getMessage)
      spark.sql(s"CREATE TABLE IF NOT EXISTS cat_ddl USING graft LOCATION '$dir'")
      // a column list declines loudly (schema is the manifest's)
      val cols = intercept[Exception](
        spark.sql(s"CREATE TABLE cat_ddl_c (k BIGINT) USING graft LOCATION '$dir'"))
      assert(cols.getMessage.contains("column list"), cols.getMessage)
      // a FRESH session configured with the same registry resolves the
      // name registered by THIS one — the persistence story
      val s2 = spark.newSession()
      s2.conf.set(GraftCatalog.RegistryConf, reg)
      assert(s2.table("cat_ddl").count() == 100L, "fresh session resolves via registry")
      assert(s2.sql("SELECT count(*) AS n FROM cat_ddl").head().getLong(0) == 100L)
      // INSERT through the DDL-created name applies ANSI store-assignment
      // casts: integer literals land in the BIGINT columns as longs
      spark.sql("INSERT INTO cat_ddl VALUES (1000, 1)")
      assert(spark.table("cat_ddl").count() == 101L)
      assert(spark.table("cat_ddl").schema.fields.forall(
        _.dataType == org.apache.spark.sql.types.LongType))
      assert(spark.table("cat_ddl").where($"k" === 1000L).head().getLong(1) == 1L)
      // a cast ANSI store assignment forbids declines loudly
      val bad = intercept[Exception](
        spark.sql("INSERT INTO cat_ddl VALUES (named_struct('a', 1), 2)"))
      assert(bad.getMessage.contains("store assignment") ||
        bad.getMessage.contains("cannot be cast"), bad.getMessage)
      // PURGE declines loudly (external semantics: data never deleted)
      val purge = intercept[Exception](spark.sql("DROP TABLE cat_ddl PURGE"))
      assert(purge.getMessage.contains("PURGE"), purge.getMessage)
      // DROP unregisters everywhere (registry included), data untouched
      spark.sql("DROP TABLE cat_ddl")
      assert(GraftCatalog.dirOf(spark, "cat_ddl").isEmpty)
      val s3 = spark.newSession()
      s3.conf.set(GraftCatalog.RegistryConf, reg)
      val gone = intercept[Exception](s3.table("cat_ddl").collect())
      assert(gone.getMessage.contains("cat_ddl"), gone.getMessage)
      assert(spark.read.parquet(dir).count() == 101L, "DROP never deletes data")
      // DROP of something never registered keeps Spark's stock error
      val stock = intercept[Exception](spark.sql("DROP TABLE cat_never_was"))
      assert(stock.getMessage.contains("cat_never_was"), stock.getMessage)
      spark.sql("DROP TABLE IF EXISTS cat_never_was") // stock no-op path intact
    }
  }

  test("SQL DDL: CTAS writes, commits the first manifest, registers; occupied LOCATION declines") {
    withRegistry { _ =>
      val dir = freshDir("graft-cat-ctas")
      spark.sql(s"CREATE TABLE cat_ctas USING graft LOCATION '$dir' " +
        "AS SELECT id AS k, id * 2 AS v FROM range(50)")
      assert(spark.table("cat_ctas").count() == 50L)
      assert(Manifest.latestSeq(spark, dir).nonEmpty, "CTAS commits the first manifest")
      // the snapshot is mutation-ready right away
      spark.sql("DELETE FROM cat_ctas WHERE k BETWEEN 0 AND 9").collect()
      assert(spark.table("cat_ctas").count() == 40L)
      // a second CTAS into the SAME occupied location declines loudly
      val occ = intercept[Exception](
        spark.sql(s"CREATE TABLE cat_ctas2 USING graft LOCATION '$dir' " +
          "AS SELECT 1 AS one"))
      assert(occ.getMessage.contains("already"), occ.getMessage)
      spark.sql("DROP TABLE cat_ctas")
    }
  }

  test("time travel over names: VERSION AS OF, TIMESTAMP AS OF, the asOf reader option, retention errors") {
    val dir = freshDir("graft-cat-tt")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    GraftCatalog.register(spark, "cat_tt", dir)
    val seq0 = Manifest.latestSeq(spark, dir).get
    spark.sql("INSERT INTO cat_tt SELECT k + 1000, v FROM cat_tt").collect()
    assert(spark.table("cat_tt").count() == 200L)
    // VERSION AS OF the first commit sees 100 rows
    assert(spark.sql(s"SELECT count(*) AS n FROM cat_tt VERSION AS OF $seq0")
      .head().getLong(0) == 100L)
    // the reader-option spelling
    assert(spark.read.option("asOf", seq0).table("cat_tt").count() == 100L)
    // TIMESTAMP AS OF now = the latest snapshot
    assert(spark.sql(
      "SELECT count(*) AS n FROM cat_tt TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) == 200L)
    // a timestamp before every retained commit fails naming the knobs
    val early = intercept[Exception](spark.sql(
      "SELECT * FROM cat_tt TIMESTAMP AS OF '1999-01-01'").collect())
    assert(early.getMessage.contains("earliest retained commit"), early.getMessage)
    // a VACUUMED seq fails naming the retained range and both knobs
    spark.conf.set("spark.graft.manifest.keep", "2")
    try {
      spark.sql("INSERT INTO cat_tt VALUES (5000, 5000)").collect()
      spark.sql("INSERT INTO cat_tt VALUES (5001, 5001)").collect()
      val vac = intercept[Exception](spark.sql(
        s"SELECT * FROM cat_tt VERSION AS OF $seq0").collect())
      assert(vac.getMessage.contains("not retained") &&
        vac.getMessage.contains("spark.graft.manifest"), vac.getMessage)
    } finally spark.conf.unset("spark.graft.manifest.keep")
    // garbage version strings fail with the graft-aware message
    val nan = intercept[Exception](spark.sql(
      "SELECT * FROM cat_tt VERSION AS OF 'abc'").collect())
    assert(nan.getMessage.contains("manifest seq"), nan.getMessage)
  }

  test("readStream.table(name) routes to the graft-manifest source, not a batch snapshot") {
    import java.util.concurrent.ConcurrentLinkedQueue
    import scala.jdk.CollectionConverters._
    val dir = freshDir("graft-cat-stream")
    val cp = Files.createTempDirectory("graft-cat-stream-cp").toString
    spark.conf.set(Manifest.KeepConf, "10")
    try {
      (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
      Manifest.write(spark, dir)
      GraftCatalog.register(spark, "cat_stream", dir)
      val got = new ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.table("cat_stream").writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select($"k").collect().foreach(r => got.add(r.getLong(0)))
          ()
        }.start()
      try {
        q.processAllAvailable()
        assert(got.size == 100, s"earliest = the full snapshot as batch 0: ${got.size}")
        // a committed append flows as the next batch (it IS a stream)
        Layout.append(spark, dir, Seq((1000L, 1L)).toDF("k", "v"))
        q.processAllAvailable()
        assert(got.asScala.toSeq.sorted.lastOption.contains(1000L) &&
          got.size == 101, s"delta after commit: ${got.size}")
      } finally q.stop()
    } finally {
      spark.conf.unset(Manifest.KeepConf)
      GraftCatalog.unregister(spark, "cat_stream")
    }
  }

  test("ALTER TABLE ADD COLUMNS widens through the metadata commit; other ALTER verbs decline graft-aware") {
    val dir = freshDir("graft-cat-alter")
    (0L to 9L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Manifest.write(spark, dir)
    GraftCatalog.register(spark, "cat_alter", dir)
    try {
      spark.sql("ALTER TABLE cat_alter ADD COLUMNS (score DOUBLE, tag STRING)").collect()
      val t = spark.table("cat_alter")
      assert(t.columns.toSeq == Seq("k", "v", "score", "tag"))
      assert(t.filter($"score".isNull && $"tag".isNull).count() == 10L,
        "old files null-fill metadata-committed columns")
      // the widened shape is live for DML immediately
      spark.sql("UPDATE cat_alter SET score = CAST(k AS DOUBLE) WHERE k BETWEEN 0 AND 2")
      assert(spark.table("cat_alter").filter($"score".isNotNull).count() == 3L)
      // unsupported ADD COLUMNS shapes decline loudly at parse time
      for (bad <- Seq(
        "ALTER TABLE cat_alter ADD COLUMNS (nn BIGINT NOT NULL)",
        "ALTER TABLE cat_alter ADD COLUMNS (d BIGINT DEFAULT 7)",
        "ALTER TABLE cat_alter ADD COLUMNS (p BIGINT FIRST)",
        "ALTER TABLE cat_alter ADD COLUMNS (c BIGINT COMMENT 'x')")) {
        val e = intercept[UnsupportedOperationException](spark.sql(bad))
        assert(e.getMessage.contains("not supported"), s"$bad -> ${e.getMessage}")
      }
      // every other ALTER verb: a graft-aware decline, not TABLE_NOT_FOUND
      for (bad <- Seq(
        "ALTER TABLE cat_alter DROP COLUMN v",
        "ALTER TABLE cat_alter RENAME COLUMN v TO w",
        "ALTER TABLE cat_alter SET TBLPROPERTIES ('a'='b')")) {
        val e = intercept[UnsupportedOperationException](spark.sql(bad))
        assert(e.getMessage.contains("only ADD COLUMNS"), s"$bad -> ${e.getMessage}")
      }
      // an UNREGISTERED name keeps Spark's stock resolution error
      val stock = intercept[Exception](
        spark.sql("ALTER TABLE cat_alter_nope ADD COLUMNS (x BIGINT)"))
      assert(!stock.isInstanceOf[UnsupportedOperationException])
    } finally GraftCatalog.unregister(spark, "cat_alter")
  }

  test("graft_tables lists registrations with their latest seq") {
    graft.GraftTableFunctions.ensure(spark)
    val a = freshDir("graft-cat-lsa")
    val b = freshDir("graft-cat-lsb")
    (0L to 4L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(a)
    (0L to 4L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(b)
    Manifest.write(spark, a)
    Manifest.write(spark, b)
    Layout.append(spark, b, Seq((9L, 9L)).toDF("k", "v"))
    GraftCatalog.register(spark, "cat_ls_a", a)
    GraftCatalog.register(spark, "cat_ls_b", b)
    try {
      val got = spark.sql(
        """SELECT name, latest_seq FROM graft_tables()
          |WHERE name LIKE 'cat_ls_%' ORDER BY name""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("cat_ls_a", Manifest.latestSeq(spark, a).get),
        ("cat_ls_b", Manifest.latestSeq(spark, b).get)))
      assert(Manifest.latestSeq(spark, b).get == Manifest.latestSeq(spark, a).get + 1,
        "b carries the extra append commit")
    } finally {
      GraftCatalog.unregister(spark, "cat_ls_a")
      GraftCatalog.unregister(spark, "cat_ls_b")
    }
  }
}
