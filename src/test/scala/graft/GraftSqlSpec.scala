package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, HeavyHitters, IntervalJoin}

/** The GraftSql view verbs: each must resolve its inputs through the
  * catalog, produce the SAME rows as the underlying operator, and leave
  * the result queryable under the output view name. (End-to-end oracle
  * coverage lives in q122-q124; this pins the verb mechanics on small
  * hand data, including the verbs' derived-width defaults.) */
class GraftSqlSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    df.collect().toSet[org.apache.spark.sql.Row].map(_.toSeq.map(String.valueOf))

  test("asofJoin verb == AsOfJoin.backward, output view registered") {
    Seq(("a", 10L, "l1"), ("a", 20L, "l2"), ("b", 9L, "l3"))
      .toDF("k", "lts", "lid").createOrReplaceTempView("gsql_l")
    Seq(("a", 9L, "r1"), ("a", 15L, "r2"), ("b", 30L, "r3"))
      .toDF("k", "rts", "rid").createOrReplaceTempView("gsql_r")
    val out = GraftSql.asofJoin(spark, "gsql_asof", "gsql_l", "gsql_r",
      Seq("k"), "lts", "rts")
    val want = AsOfJoin.backward(
      spark.table("gsql_l"), spark.table("gsql_r"), Seq("k"), "lts", "rts")
    assert(rows(out) == rows(want))
    assert(rows(spark.sql("SELECT * FROM gsql_asof")) == rows(want))
    intercept[IllegalArgumentException] {
      GraftSql.asofJoin(spark, "x", "gsql_l", "gsql_r", Seq("k"), "lts", "rts",
        direction = "sideways")
    }
    // the chunked route returns identical rows (the hot-key path)
    val chunked = GraftSql.asofJoin(spark, "gsql_asof_c", "gsql_l", "gsql_r",
      Seq("k"), "lts", "rts", chunkWidth = Some(8L))
    assert(rows(chunked) == rows(want))
    val fwd = GraftSql.asofJoin(spark, "gsql_asof_f", "gsql_l", "gsql_r",
      Seq("k"), "lts", "rts", direction = "forward", chunkWidth = Some(8L))
    val fwdWant = AsOfJoin.forward(
      spark.table("gsql_l"), spark.table("gsql_r"), Seq("k"), "lts", "rts")
    assert(rows(fwd) == rows(fwdWant))
  }

  test("pointInInterval verb derives its width and matches the operator at a pinned width") {
    Seq(("a", 1L, 5L), ("a", 12L, 100L), ("b", 0L, 3L))
      .toDF("k", "s", "e").createOrReplaceTempView("gsql_iv")
    Seq(("a", 2L, "p1"), ("a", 50L, "p2"), ("a", 200L, "p3"), ("b", 7L, "p4"))
      .toDF("k", "ts", "pid").createOrReplaceTempView("gsql_pt")
    val out = GraftSql.pointInInterval(spark, "gsql_pi", "gsql_pt", "gsql_iv",
      Seq("k"), "ts", "s", "e")
    val want = IntervalJoin.pointInInterval(
      spark.table("gsql_pt"), spark.table("gsql_iv"), Seq("k"), "ts", "s", "e",
      bucketWidth = 7L) // any width - results are width-invariant
    assert(rows(out) == rows(want))
    // left-outer via pointId keeps the uncovered points
    val left = GraftSql.pointInInterval(spark, "gsql_pil", "gsql_pt", "gsql_iv",
      Seq("k"), "ts", "s", "e", pointId = Some("pid"))
    assert(left.count() == 4L)
    assert(left.filter(col("s").isNull).select("pid").as[String].collect().toSet ==
      Set("p3", "p4")) // 200 outside every "a" interval; 7 outside b's [0,3]
  }

  test("overlapJoin verb == IntervalJoin.overlap with the union-derived width") {
    Seq(("a", 1L, "x1", 0L, 10L), ("a", 2L, "x2", 8L, 20L), ("a", 3L, "x3", 30L, 40L))
      .toDF("k", "aid", "atag", "as", "ae").createOrReplaceTempView("gsql_ol")
    Seq(("a", 9L, "y1", 5L, 9L), ("a", 8L, "y2", 35L, 50L))
      .toDF("k", "bid", "btag", "bs", "be").createOrReplaceTempView("gsql_or")
    val out = GraftSql.overlapJoin(spark, "gsql_ov", "gsql_ol", "gsql_or",
      Seq("k"), "as", "ae", "bs", "be")
    val want = IntervalJoin.overlap(
      spark.table("gsql_ol"), spark.table("gsql_or"),
      Seq("k"), "as", "ae", "bs", "be", bucketWidth = 4L)
    assert(rows(out) == rows(want))
    assert(out.select("aid", "bid").as[(Long, Long)].collect().toSet ==
      Set((1L, 9L), (2L, 9L), (3L, 8L)))
  }

  test("heavyHitters verb routes global and grouped forms") {
    (Seq.fill(40)("hot") ++ (1 to 20).map(i => s"c$i"))
      .toDF("item").createOrReplaceTempView("gsql_items")
    val g = GraftSql.heavyHitters(spark, "gsql_hh", "gsql_items", "item",
      phiPpm = 200000L, k = 63)
    val want = HeavyHitters.exact(spark.table("gsql_items"), col("item"), 200000L, 63)
    assert(rows(g) == rows(want))
    assert(g.select("item").as[String].collect().toSeq == Seq("hot"))

    Seq(("s1", "a"), ("s1", "a"), ("s1", "b"), ("s2", "z"), ("s2", "z"), ("s2", "z"))
      .toDF("src", "item").createOrReplaceTempView("gsql_gitems")
    val grouped = GraftSql.heavyHitters(spark, "gsql_ghh", "gsql_gitems", "item",
      phiPpm = 500000L, k = 63, groupCols = Seq("src"))
    assert(grouped.select("src", "item").as[(String, String)].collect().toSet ==
      Set(("s1", "a"), ("s2", "z")))
  }

  // ------------------------------------------------- table functions (SQL)

  test("graft_asof_join table function: pure SQL reaches the operator plan") {
    GraftTableFunctions.ensure(spark)
    Seq(("a", 10L, "l1"), ("a", 20L, "l2"), ("b", 9L, "l3"))
      .toDF("k", "lts", "lid").createOrReplaceTempView("gtf_l")
    Seq(("a", 9L, "r1"), ("a", 15L, "r2"), ("b", 30L, "r3"))
      .toDF("k", "rts", "rid").createOrReplaceTempView("gtf_r")
    val want = AsOfJoin.backward(
      spark.table("gtf_l"), spark.table("gtf_r"), Seq("k"), "lts", "rts")
    val viaSql = spark.sql(
      "SELECT * FROM graft_asof_join('gtf_l', 'gtf_r', 'k', 'lts', 'rts')")
    assert(rows(viaSql) == rows(want))
    // optional args: forward + strict + left outer
    val fwdLeft = spark.sql("SELECT * FROM graft_asof_join('gtf_l', 'gtf_r', 'k', " +
      "'lts', 'rts', 'forward', true, -1, 'left')")
    val fwdWant = AsOfJoin.forward(
      spark.table("gtf_l"), spark.table("gtf_r"), Seq("k"), "lts", "rts",
      strict = true, joinType = "left")
    assert(rows(fwdLeft) == rows(fwdWant))
    // and the output composes with further SQL
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_asof_join('gtf_l', 'gtf_r', 'k', 'lts', 'rts')")
      .as[Long].head() == want.count())
    // tiebreak_csv (11th arg): equal-ts right rows resolved greatest-first
    Seq(("a", 9L, "r1"), ("a", 9L, "r9"), ("a", 9L, "r5"))
      .toDF("k", "rts", "rid").createOrReplaceTempView("gtf_r_ties")
    val tied = spark.sql("SELECT * FROM graft_asof_join('gtf_l', 'gtf_r_ties', 'k', " +
      "'lts', 'rts', 'backward', false, -1, 'inner', -1, 'rid')")
    val tiedWant = AsOfJoin.backward(
      spark.table("gtf_l"), spark.table("gtf_r_ties"), Seq("k"), "lts", "rts",
      tiebreak = Seq("rid"))
    assert(rows(tied) == rows(tiedWant))
    assert(tied.select($"rid").distinct().as[String].collect().toSeq == Seq("r9"))
  }

  test("graft_point_in_interval / graft_overlap_join table functions") {
    GraftTableFunctions.ensure(spark)
    Seq(("a", 1L, 5L), ("a", 12L, 100L), ("b", 0L, 3L))
      .toDF("k", "s", "e").createOrReplaceTempView("gtf_iv")
    Seq(("a", 2L, "p1"), ("a", 50L, "p2"), ("a", 200L, "p3"), ("b", 7L, "p4"))
      .toDF("k", "ts", "pid").createOrReplaceTempView("gtf_pt")
    val inner = spark.sql(
      "SELECT * FROM graft_point_in_interval('gtf_pt', 'gtf_iv', 'k', 'ts', 's', 'e')")
    val want = IntervalJoin.pointInInterval(
      spark.table("gtf_pt"), spark.table("gtf_iv"), Seq("k"), "ts", "s", "e", 40L)
    assert(rows(inner) == rows(want))
    // non-empty point_id routes to the LEFT-OUTER operator
    val left = spark.sql("SELECT * FROM graft_point_in_interval(" +
      "'gtf_pt', 'gtf_iv', 'k', 'ts', 's', 'e', 'pid')")
    assert(left.count() == 4L)
    assert(left.filter(col("s").isNull).select("pid").as[String].collect().toSet ==
      Set("p3", "p4"))

    Seq(("a", 1L, "x1", 0L, 10L), ("a", 2L, "x2", 8L, 20L), ("a", 3L, "x3", 30L, 40L))
      .toDF("k", "aid", "atag", "as", "ae").createOrReplaceTempView("gtf_ol")
    Seq(("a", 9L, "y1", 5L, 9L), ("a", 8L, "y2", 35L, 50L))
      .toDF("k", "bid", "btag", "bs", "be").createOrReplaceTempView("gtf_or")
    val ov = spark.sql("SELECT aid, bid FROM graft_overlap_join(" +
      "'gtf_ol', 'gtf_or', 'k', 'as', 'ae', 'bs', 'be')")
    assert(ov.as[(Long, Long)].collect().toSet == Set((1L, 9L), (2L, 9L), (3L, 8L)))
  }

  test("graft_heavy_hitters table function routes global and grouped forms") {
    GraftTableFunctions.ensure(spark)
    (Seq.fill(40)("hot") ++ (1 to 20).map(i => s"c$i"))
      .toDF("item").createOrReplaceTempView("gtf_items")
    val g = spark.sql(
      "SELECT item FROM graft_heavy_hitters('gtf_items', 'item', 200000, 63)")
    assert(g.as[String].collect().toSeq == Seq("hot"))
    Seq(("s1", "a"), ("s1", "a"), ("s1", "b"), ("s2", "z"), ("s2", "z"), ("s2", "z"))
      .toDF("src", "item").createOrReplaceTempView("gtf_gitems")
    val grouped = spark.sql("SELECT src, item FROM graft_heavy_hitters(" +
      "'gtf_gitems', 'item', 500000, 63, 'src')")
    assert(grouped.as[(String, String)].collect().toSet ==
      Set(("s1", "a"), ("s2", "z")))
  }

  test("graft_connected_components: verb and table function, both algorithms") {
    GraftTableFunctions.ensure(spark)
    // two components: {1,2,3} (chain) and {7,9}
    Seq((2L, 1L), (2L, 3L), (9L, 7L))
      .toDF("d1", "d2").createOrReplaceTempView("gtf_pairs")
    val want = Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    val viaTf = spark.sql(
      "SELECT id, comp FROM graft_connected_components('gtf_pairs', 'd1', 'd2')")
    assert(viaTf.as[(Long, Long)].collect().toSet == want)
    val viaTfStars = spark.sql(
      "SELECT id, comp FROM graft_connected_components('gtf_pairs', 'd1', 'd2', 'stars')")
    assert(viaTfStars.as[(Long, Long)].collect().toSet == want)
    // the view verb registers the output for further SQL
    GraftSql.connectedComponents(spark, "gtf_cc_out", "gtf_pairs", "d1", "d2")
    assert(spark.sql("SELECT count(*) AS n FROM gtf_cc_out WHERE id = comp")
      .as[Long].head() == 2L) // one root per component
    intercept[IllegalArgumentException] {
      GraftSql.connectedComponents(spark, "gtf_cc_bad", "gtf_pairs", "d1", "d2",
        algorithm = "quantum")
    }
  }

  test("interval-preserved outer reaches the verb and the table function") {
    GraftTableFunctions.ensure(spark)
    Seq(("a", 10L, "p1")).toDF("k", "ts", "pid").createOrReplaceTempView("gtf_ivp_pts")
    Seq(("a", 5L, 15L, "i1"), ("a", 90L, 99L, "i2"), ("b", 0L, 50L, "i3"))
      .toDF("k", "s", "e", "iid").createOrReplaceTempView("gtf_ivp_ivs")
    val want = Set(("i1", Some("p1")), ("i2", None), ("i3", None))
    GraftSql.pointInInterval(spark, "gtf_ivp_out", "gtf_ivp_pts", "gtf_ivp_ivs",
      Seq("k"), "ts", "s", "e", intervalId = Some("iid"))
    assert(spark.sql("SELECT iid, pid FROM gtf_ivp_out")
      .as[(String, Option[String])].collect().toSet == want)
    val viaTf = spark.sql(
      """SELECT iid, pid FROM graft_point_in_interval(
        |  'gtf_ivp_pts', 'gtf_ivp_ivs', 'k', 'ts', 's', 'e', '', 7, 'iid')""".stripMargin)
    assert(viaTf.as[(String, Option[String])].collect().toSet == want)
    // both ids set is a loud contract error
    intercept[IllegalArgumentException] {
      GraftSql.pointInInterval(spark, "gtf_ivp_bad", "gtf_ivp_pts", "gtf_ivp_ivs",
        Seq("k"), "ts", "s", "e", pointId = Some("pid"), intervalId = Some("iid"))
    }
  }

  test("graft_sessionize: rollup and assign modes match the operator") {
    import graft.operators.Sessionize
    GraftTableFunctions.ensure(spark)
    // u1: 3 events, 10-gap break between ts 30 and 100 -> sessions {10,20,30} and {100}
    val df = Seq(("u1", 10L, 1L), ("u1", 20L, 2L), ("u1", 30L, 3L), ("u1", 100L, 4L),
        ("u2", 5L, 5L)).toDF("uid", "t", "eid")
    df.createOrReplaceTempView("gtf_sess_in")
    val roll = spark.sql(
      """SELECT uid, session_id, n_events, session_start, session_end
        |FROM graft_sessionize('gtf_sess_in', 'uid', 't', 10, 'eid', 2)""".stripMargin)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(roll == Set(("u1", 1L, 3L, 10L, 30L))) // singletons dropped by min_events=2
    val assignViaOp = Sessionize.assign(df, Seq("uid"), Seq("t", "eid"),
      prev => $"t" - prev("t") > 10L)
      .select($"uid", $"eid", $"session_id").collect().toSet
    val assignViaTf = spark.sql(
      """SELECT uid, eid, session_id
        |FROM graft_sessionize('gtf_sess_in', 'uid', 't', 10, 'eid', 1, 'assign')""".stripMargin)
      .collect().toSet
    assert(assignViaTf == assignViaOp)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_sessionize('gtf_sess_in', 'uid', 't', 10, 'eid', 1, 'nope')")
        .collect()
    }
  }

  test("ensure() binds builders to the registering session, not SparkSession.active") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftshim.GraftSqlShim
    // views exist ONLY in `spark`; `other` is a sibling session with its
    // own temp-view catalog. A builder bound to `spark` must resolve them
    // even while `other` is the active session (the multi-session-JVM
    // hazard: analysis triggered outside the owning session's withActive).
    Seq(("a", 10L, "l1"), ("a", 20L, "l2")).toDF("k", "lts", "lid")
      .createOrReplaceTempView("gtf_bind_l")
    Seq(("a", 9L, "r1"), ("a", 15L, "r2")).toDF("k", "rts", "rid")
      .createOrReplaceTempView("gtf_bind_r")
    val builder = GraftTableFunctions.descriptionsFor(() => spark)
      .find(_._1.funcName == "graft_asof_join").get._3
    val other = spark.newSession()
    SparkSession.setActiveSession(other)
    try {
      val plan = builder(Seq("gtf_bind_l", "gtf_bind_r", "k", "lts", "rts")
        .map(Literal(_)))
      val out = GraftSqlShim.ofRows(spark, plan)
      assert(out.count() == 2L)
    } finally SparkSession.setActiveSession(spark)
  }

  test("table functions reject non-literal and malformed arguments loudly") {
    GraftTableFunctions.ensure(spark)
    Seq(("a", 1L)).toDF("k", "ts").createOrReplaceTempView("gtf_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof_join('gtf_bad', 'gtf_bad', 'k')").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("graft_asof_join"))
  }

  test("maintenance verbs in SQL: compact, cluster, vacuum, add_columns, reify_deletes") {
    GraftTableFunctions.ensure(spark)
    import graft.sources.{Layout, Manifest}
    val dir = java.nio.file.Files.createTempDirectory("gtf-maint").resolve("t").toString
    (0L to 999L).map(x => (x, x % 7)).toDF("x", "g")
      .repartition(8).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    // compact: 8 small files roll up; stats row reports the rewrite
    val c = spark.sql(s"SELECT * FROM graft_compact('$dir', ${1L << 30})").head()
    assert(c.getLong(0) == 1L, s"one leaf rewritten: $c")
    assert(spark.read.parquet(dir).count() == 1000L)
    // cluster: Z-order OPTIMIZE through SQL, manifest seq returned
    val cl = spark.sql(s"SELECT * FROM graft_cluster('$dir', 'x,g', 2)").head()
    assert(cl.getLong(0) >= 0L)
    assert(Layout.readSnapshot(spark, dir).count() == 1000L, "layout-only")
    // add_columns: metadata-commit widening through SQL
    spark.sql(s"SELECT * FROM graft_add_columns('$dir', 'score DOUBLE')").collect()
    val snap = Layout.readSnapshot(spark, dir)
    assert(snap.columns.contains("score") &&
      snap.filter(snap("score").isNotNull).count() == 0L)
    // reify_deletes: materialize a dv delete through SQL
    Layout.deleteWhere(spark, dir, Seq(("x", 0L, 9L)), mode = "dv")
    val r = spark.sql(s"SELECT * FROM graft_reify_deletes('$dir')").head()
    assert(r.getLong(1) >= 1L, s"rewritten >= 1: $r")
    assert(Manifest.info(spark, dir).dv.isEmpty)
    assert(spark.read.parquet(dir).count() == 990L)
    // vacuum: retention through SQL; superseded generations reclaimed
    val v = spark.sql(s"SELECT * FROM graft_vacuum('$dir', 1)").head()
    assert(v.getLong(0) == Manifest.latestSeq(spark, dir).get)
  }

  test("EXPLAIN on a maintenance verb performs NO side effect (execution-time commands)") {
    GraftTableFunctions.ensure(spark)
    import graft.sources.{Layout, Manifest}
    val dir = java.nio.file.Files.createTempDirectory("gtf-explain").resolve("t").toString
    (0L to 99L).map(x => (x, x)).toDF("x", "v").repartition(4).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Manifest.write(spark, dir)
    val seq0 = Manifest.latestSeq(spark, dir).get
    // EXPLAIN analyzes (and plans) the statement — the verb must not run
    val explained = spark.sql(
      s"EXPLAIN SELECT * FROM graft_compact('$dir', ${1L << 30})").head().getString(0)
    assert(explained.contains("GraftMaintenanceCommand(graft_compact)"), explained)
    assert(Manifest.latestSeq(spark, dir).contains(seq0), "EXPLAIN committed nothing")
    assert(spark.read.parquet(dir).inputFiles.length == 4, "EXPLAIN moved nothing")
    // the same statement EXECUTED performs the verb
    val c = spark.sql(s"SELECT * FROM graft_compact('$dir', ${1L << 30})").head()
    assert(c.getLong(0) == 1L, s"one leaf rewritten: $c")
    assert(Manifest.latestSeq(spark, dir).get > seq0, "execution committed")
  }
}
