package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

/** The stats-only aggregate rule: `count`/`min`/`max` over an
  * `.envelopes`-indexed table must optimize to a plan whose ONLY scans
  * are of the index (metadata scale), with results identical to the data
  * scan; every gate (staleness, coverage, unsupported aggregates,
  * non-constant grouping, a Filter below) must decline to the untouched
  * plan; and replayed index appends (duplicate rows per file) must never
  * double-count. */
class EnvelopeAggSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ADVERSARIAL order: the prune rule first (a shared session may have
    // registered it earlier). It then wraps Filter(scan) in its
    // SkippingFileIndex before the agg rule runs — the agg rule must see
    // through the rule-planted (semantics-preserving) wrap and still
    // answer filtered aggregates from the index.
    EnvelopePruneRule.ensure(s)
    EnvelopeAggRule.ensure(s)
    s
  }
  import spark.implicits._

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set(EnvelopeAggRule.ConfKey, on.toString)
    try body
    finally spark.conf.unset(EnvelopeAggRule.ConfKey)
  }

  /** Root dirs of every file-source scan in the optimized plan. */
  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation =>
        r.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.map(_.toString)
    }.flatten

  private def firesIndexOnly(df: DataFrame): Boolean = {
    val roots = scanRoots(df)
    roots.nonEmpty && roots.forall(_.endsWith(".envelopes"))
  }

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def sameRows(mk: () => DataFrame): Unit = {
    val on  = withRule(true)(mk().collect().toSeq)
    val off = withRule(false)(mk().collect().toSeq)
    assert(on.toSet == off.toSet && on.size == off.size,
      s"stats-only rewrite changed RESULTS: on=$on off=$off")
  }

  test("global count/min/max/count(c) answer from the index alone, exactly") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 20000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    val dir = freshDir("env-agg")
    Layout.clusterWrite(df, Seq("x", "y"), 8, dir)
    def q() = spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"x").as("mx"),
        count($"x").as("nx"), min($"y").as("mny"))
    withRule(true) {
      assert(firesIndexOnly(q()), s"expected an index-only plan:\n${q().queryExecution.optimizedPlan}")
    }
    sameRows(() => q())
    val row = withRule(true)(q().collect().head)
    assert(row.getLong(0) == 20000L && row.getLong(3) == 20000L)
  }

  test("null counts are honoured: count(c) with nulls present stays exact") {
    val df = (1 to 5000).map(i => (i.toLong, if (i % 7 == 0) null else s"v$i"))
      .toDF("id", "v")
    val dir = freshDir("env-agg-null")
    df.repartition(4).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("id", "v"))
    def q() = spark.read.parquet(dir)
      .agg(count($"v").as("nv"), count(lit(1)).as("n"), min($"v").as("mnv"), max($"id").as("mx"))
    withRule(true)(assert(firesIndexOnly(q())))
    sameRows(() => q())
    assert(withRule(true)(q().collect().head.getLong(0)) == 5000L - 5000L / 7)
  }

  test("groupBy a per-file-constant (partition) column answers from the index") {
    val df = (1 to 9000).map(i => (i % 3, i.toLong)).toDF("g", "x")
    val dir = freshDir("env-agg-grp")
    df.write.partitionBy("g").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("g", "x"))
    def q() = spark.read.parquet(dir).groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"x").as("mx"))
    withRule(true) {
      assert(firesIndexOnly(q()), s"expected an index-only plan:\n${q().queryExecution.optimizedPlan}")
    }
    sameRows(() => q())
    assert(withRule(true)(q().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap) ==
      Map(0 -> 3000L, 1 -> 3000L, 2 -> 3000L))
  }

  test("groupBy a NON-constant column declines (data scanned), results exact") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 8000).map(_ => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
      .toDF("g", "x")
    val dir = freshDir("env-agg-nonconst")
    df.repartition(4).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("g", "x"))
    def q() = spark.read.parquet(dir).groupBy($"g").agg(count(lit(1)).as("n"))
    withRule(true)(assert(!firesIndexOnly(q()), "non-constant grouping must not rewrite"))
    sameRows(() => q())
  }

  test("a stale index declines: rows appended after the refresh are counted") {
    val dir = freshDir("env-agg-stale")
    (1 to 1000).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      .coalesce(2).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    (1001 to 1500).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    def q() = spark.read.parquet(dir).agg(count(lit(1)).as("n"), max($"x").as("mx"))
    withRule(true) {
      assert(!firesIndexOnly(q()), "stale index must decline")
      val row = q().collect().head
      assert(row.getLong(0) == 1500L && row.getLong(1) == 1500L)
    }
  }

  test("replayed index appends (duplicate rows per file) never double-count") {
    val dir = freshDir("env-agg-dup")
    (1 to 2000).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      .coalesce(2).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val files = spark.read.parquet(dir).inputFiles.toSeq
    Layout.appendEnvelopes(spark, dir, files, Seq("x")) // simulated replay
    def q() = spark.read.parquet(dir).agg(count(lit(1)).as("n"), min($"x").as("mn"))
    withRule(true) {
      assert(firesIndexOnly(q()), "duplicated-but-complete index should still fire")
      val row = q().collect().head
      assert(row.getLong(0) == 2000L, s"double-counted: ${row.getLong(0)}")
      assert(row.getLong(1) == 1L)
    }
  }

  test("unsupported shapes decline: float avg, distinct, uncovered column, Filter below, conf off") {
    val dir = freshDir("env-agg-decline")
    (1 to 3000).map(i => (i.toLong, i.toDouble, i.toLong)).toDF("x", "d", "y")
      .coalesce(2).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x", "d")) // y NOT covered
    withRule(true) {
      // float/double avg declines (order-dependent rounding has no exact
      // reconstruction from partials); integral avg fires — next test
      assert(!firesIndexOnly(spark.read.parquet(dir).agg(avg($"d").as("a"))))
      assert(!firesIndexOnly(spark.read.parquet(dir).agg(countDistinct($"x").as("d2"))))
      assert(!firesIndexOnly(spark.read.parquet(dir).agg(min($"y").as("m"))))
      assert(!firesIndexOnly(
        spark.read.parquet(dir).filter($"x" > 10L).agg(count(lit(1)).as("n"))))
      // supported shape sanity check against the same table
      assert(firesIndexOnly(spark.read.parquet(dir).agg(min($"x").as("m"))))
    }
    withRule(false) {
      assert(!firesIndexOnly(spark.read.parquet(dir).agg(min($"x").as("m"))))
    }
  }

  test("integral avg fires (sum/count from the index), bit-equal; huge mass declines") {
    val dir = freshDir("env-agg-avg")
    // mixed nulls: avg must divide by the NON-NULL count only
    (1 to 3000).map(i => (i.toLong, if (i % 3 == 0) None else Some(i.toLong)))
      .toDF("x", "v").coalesce(3).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x", "v"))
    def q() = spark.read.parquet(dir).agg(avg($"v").as("a"), avg($"x").as("ax"))
    withRule(true) {
      assert(firesIndexOnly(q()), s"integral avg should fire:\n${q().queryExecution.optimizedPlan}")
    }
    val on = withRule(true)(q().head())
    val off = withRule(false)(q().head())
    assert(on.getDouble(0) == off.getDouble(0) && on.getDouble(1) == off.getDouble(1),
      s"avg rewrite not bit-equal: $on vs $off")
    // mass past 2^52 declines: values near Long.MaxValue make any
    // double accumulation order-dependent — the probe must refuse
    val big = freshDir("env-agg-avg-big")
    Seq(Long.MaxValue - 3, Long.MaxValue - 2, 5L, 7L).toDF("v")
      .coalesce(2).write.parquet(big)
    Layout.writeEnvelopes(spark, big, Seq("v"))
    withRule(true) {
      assert(!firesIndexOnly(spark.read.parquet(big).agg(avg($"v").as("a"))),
        "huge-mass avg must decline")
      // min/max still fire on the same table
      assert(firesIndexOnly(spark.read.parquet(big).agg(max($"v").as("m"))))
    }
  }

  test("grouping by an UNINDEXED hive-partition column synthesizes its stats from the path") {
    val dir = freshDir("env-agg-part")
    (1 to 3000).map(i => (i % 4, i.toLong)).toDF("p", "x")
      .write.partitionBy("p").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x")) // p NOT indexed
    def q() = spark.read.parquet(dir).groupBy($"p")
      .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"x").as("mx"),
        avg($"x").as("ax")) // grouped avg rides the same rewrite
    withRule(true) {
      assert(firesIndexOnly(q()),
        s"partition-grouped agg should fire without p in the index:\n${q().queryExecution.optimizedPlan}")
    }
    sameRows(() => q())
    // a WHERE on the unindexed partition column is metadata-only too
    def f() = spark.read.parquet(dir).filter($"p" >= 2)
      .agg(count(lit(1)).as("n"), max($"x").as("mx"))
    withRule(true)(assert(firesIndexOnly(f())))
    sameRows(() => f())
    // and min/max/count OF the partition column itself
    def m() = spark.read.parquet(dir)
      .agg(min($"p").as("mn"), max($"p").as("mx"), count($"p").as("n"))
    withRule(true)(assert(firesIndexOnly(m())))
    sameRows(() => m())
  }

  test("WHERE on per-file-constant columns answers from the index, incl. null files") {
    val dir = freshDir("env-agg-filter")
    for (g <- 0 to 2)
      (1 to 1000).map(i => (g.toLong, (g * 1000 + i).toLong)).toDF("g", "x")
        .coalesce(2).write.mode("append").parquet(dir)
    // an all-null-g chunk: the conjunct evaluates NULL for these files —
    // excluded under filter semantics, exactly like the data scan
    (1 to 500).map(i => (Option.empty[Long], (9000 + i).toLong)).toDF("g", "x")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("g", "x"))
    def eq1() = spark.read.parquet(dir).filter($"g" === 1L)
      .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"x").as("mx"))
    def ge1() = spark.read.parquet(dir).filter($"g" >= 1L).groupBy($"g")
      .agg(count(lit(1)).as("n"), max($"x").as("mx"))
    def isNull() = spark.read.parquet(dir).filter($"g".isNull)
      .agg(count(lit(1)).as("n"), min($"x").as("mn"))
    withRule(true) {
      assert(firesIndexOnly(eq1()), s"filtered agg should be index-only:\n${eq1().queryExecution.optimizedPlan}")
      assert(firesIndexOnly(ge1()))
      assert(firesIndexOnly(isNull()))
      val r = eq1().collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1000L, 1001L, 2000L)))
      assert(isNull().collect().head.getLong(0) == 500L)
    }
    sameRows(() => eq1()); sameRows(() => ge1()); sameRows(() => isNull())
    // a conjunct on a NON-constant column declines — and stays exact
    def onX() = spark.read.parquet(dir).filter($"x" > 1500L).agg(count(lit(1)).as("n"))
    withRule(true)(assert(!firesIndexOnly(onX()), "non-constant filter column must decline"))
    sameRows(() => onX())
  }

  test("WHERE on the hive-partition column of a partitioned table is metadata-only") {
    val df = (1 to 9000).map(i => (i % 3, i.toLong)).toDF("g", "x")
    val dir = freshDir("env-agg-part-filter")
    df.write.partitionBy("g").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("g", "x"))
    def q() = spark.read.parquet(dir).filter($"g" === 1)
      .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"x").as("mx"))
    withRule(true) {
      assert(firesIndexOnly(q()), s"partition-filtered agg should be index-only:\n${q().queryExecution.optimizedPlan}")
      assert(q().collect().head.getLong(0) == 3000L)
    }
    sameRows(() => q())
  }

  test("sum over integral columns answers from the index, exact incl. nulls and groups") {
    val df = (1 to 6000).map(i =>
      (i % 3, i.toLong, if (i % 5 == 0) None else Some(i * 7L))).toDF("g", "x", "v")
    val dir = freshDir("env-agg-sum")
    df.write.partitionBy("g").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("g", "x", "v"))
    def global() = spark.read.parquet(dir)
      .agg(sum($"x").as("sx"), sum($"v").as("sv"), count(lit(1)).as("n"))
    def grouped() = spark.read.parquet(dir).groupBy($"g")
      .agg(sum($"x").as("sx"), min($"v").as("mnv"))
    withRule(true) {
      assert(firesIndexOnly(global()), s"sum should be index-only:\n${global().queryExecution.optimizedPlan}")
      assert(firesIndexOnly(grouped()))
      val r = global().collect().head
      assert(r.getLong(0) == (1 to 6000).map(_.toLong).sum)
      assert(r.getLong(1) == (1 to 6000).filter(_ % 5 != 0).map(_ * 7L).sum)
    }
    sameRows(() => global()); sameRows(() => grouped())
    // double sums are never stored (order-dependent): decline, stay exact
    val dbl = (1 to 100).map(i => (i.toLong, i * 0.5)).toDF("x", "d")
    val dir2 = freshDir("env-agg-sum-dbl")
    dbl.coalesce(2).write.parquet(dir2)
    Layout.writeEnvelopes(spark, dir2, Seq("x", "d"))
    withRule(true) {
      assert(!firesIndexOnly(spark.read.parquet(dir2).agg(sum($"d").as("sd"))))
      assert(firesIndexOnly(spark.read.parquet(dir2).agg(sum($"x").as("sx"))))
    }
  }

  test("composes with manifest snapshots: agg over readSnapshot answers from the index") {
    val df = (1 to 6000).map(i => (i % 3, i.toLong)).toDF("g", "x")
    val dir = freshDir("env-agg-snap")
    df.write.partitionBy("g").parquet(dir)
    // the maintenance run writes BOTH the envelope index and the manifest,
    // so the snapshot's pinned file set equals the indexed set exactly
    Layout.clusterPartitions(spark, dir, Seq("x"), filesPerPartition = 2,
      indexCols = Seq("g"))
    def q() = Layout.readSnapshot(spark, dir).groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"x").as("mx"), sum($"x").as("sx"))
    withRule(true) {
      val roots = scanRoots(q())
      assert(roots.nonEmpty && roots.forall(_.endsWith(".envelopes")),
        s"snapshot agg should be index-only:\n${q().queryExecution.optimizedPlan}")
      assert(q().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
        Map(0 -> 2000L, 1 -> 2000L, 2 -> 2000L))
    }
    sameRows(() => q())
  }

  test("per-file sum overflow: index build survives (try_sum), sum declines, min/max fire") {
    val dir = freshDir("env-agg-ovf")
    // 100 values near Long.Max/50: the file's true sum is ~2x Long.Max —
    // a plain ANSI sum at build time would fail the whole index write
    (1 to 100).map(i => (Long.MaxValue / 50 + i, i.toLong)).toDF("big", "x")
      .coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("big", "x")) // must not throw
    withRule(true) {
      assert(!firesIndexOnly(spark.read.parquet(dir).agg(sum($"big").as("sb"))),
        "overflowed per-file sum must decline")
      assert(firesIndexOnly(spark.read.parquet(dir)
        .agg(min($"big").as("mn"), max($"big").as("mx"), count(lit(1)).as("n"))),
        "min/max/count must still answer from the same index")
      assert(firesIndexOnly(spark.read.parquet(dir).agg(sum($"x").as("sx"))),
        "the small column's sum is unaffected")
    }
  }

  test("a mixed-generation index (appended rows missing a stat) declines, never undercounts") {
    val dir = freshDir("env-agg-mixedgen")
    (1 to 1000).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      .coalesce(2).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x", "y"))
    val oldFiles = spark.read.parquet(dir).inputFiles.toSet
    (1001 to 1500).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    val appended = spark.read.parquet(dir).inputFiles.filterNot(oldFiles).toSeq
    // index the appended file with FEWER columns — its index row reads
    // back with NULL x-stats (parquet schema-union semantics)
    Layout.appendEnvelopes(spark, dir, appended, Seq("y"))
    def qx() = spark.read.parquet(dir).agg(count($"x").as("nx"), sum($"x").as("sx"))
    def qy() = spark.read.parquet(dir).agg(count($"y").as("ny"), sum($"y").as("sy"))
    withRule(true) {
      // x stats are NULL on the appended row → must DECLINE (else the
      // 500 appended rows would vanish from count/sum)
      assert(!firesIndexOnly(qx()), "mixed-generation x-stats must decline")
      val r = qx().collect().head
      assert(r.getLong(0) == 1500L && r.getLong(1) == (1 to 1500).map(_.toLong).sum)
      // y stats are complete across both generations → still fires, exact
      assert(firesIndexOnly(qy()), s"complete y-stats should fire:\n${qy().queryExecution.optimizedPlan}")
      val ry = qy().collect().head
      assert(ry.getLong(0) == 1500L && ry.getLong(1) == (1 to 1500).map(_.toLong).sum)
    }
  }

  test("select-then-aggregate (a Project between) still fires, incl. renamed columns") {
    val dir = freshDir("env-agg-proj")
    (1 to 4000).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      .coalesce(2).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    def q() = spark.read.parquet(dir).select($"x".as("renamed"))
      .agg(min($"renamed").as("mn"), count(lit(1)).as("n"))
    withRule(true)(assert(firesIndexOnly(q())))
    sameRows(() => q())
  }

  /** A 4-file indexed table with a LIVE deletion vector: the last file
    * holds the global max of x, and the DV marks exactly its top 100
    * rows deleted — so any index-answered min/max would be WRONG, while
    * count(*) is exactly Σ rows − pending positions. */
  private def dvTable(): String = {
    val dir = freshDir("env-agg-dv")
    Seq(0L to 999L, 1000L to 1999L, 2000L to 2999L, 3000L to 3999L).foreach { r =>
      r.map(x => (x, x % 97)).toDF("x", "y")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    Layout.writeEnvelopes(spark, dir, Seq("x", "y"))
    val s = Layout.deleteWhere(spark, dir, Seq(("x", 3900L, 3999L)), mode = "dv")
    assert(s.dvFiles == 1L && s.rewrittenFiles == 0L,
      s"fixture expected one DV'd file and no rewrites, got $s")
    dir
  }

  test("dv table: count(*) answers from the index (single-scan probe shape)") {
    val dir = dvTable()
    def q() = Layout.readSnapshot(spark, dir).agg(count(lit(1)).as("n"))
    withRule(true) {
      assert(firesIndexOnly(q()),
        s"expected an index-only DV count plan:\n${q().queryExecution.optimizedPlan}")
      assert(q().collect().head.getLong(0) == 3900L)
    }
    sameRows(() => q())
  }

  test("dv table: count(*) answers from the index (split union shape)") {
    val dir = dvTable()
    spark.conf.set(Layout.DvSplitMinCleanFilesConf, "1")
    try {
      def q() = Layout.readSnapshot(spark, dir).agg(count(lit(1)).as("n"))
      withRule(true) {
        // pin the fixture really produced the split: two data scans off
        val shape = withRule(false)(
          q().queryExecution.optimizedPlan.collect { case r: LogicalRelation => r })
        assert(shape.size == 2, s"expected the split Union read, got:\n$shape")
        assert(firesIndexOnly(q()),
          s"expected an index-only DV-split count plan:\n${q().queryExecution.optimizedPlan}")
        assert(q().collect().head.getLong(0) == 3900L)
      }
      sameRows(() => q())
    } finally spark.conf.unset(Layout.DvSplitMinCleanFilesConf)
  }

  test("dv table: an OVERLAPPING union (snapshot ∪ plain read) declines — branches must partition") {
    // both branches carry the FULL file set, so their union equals the
    // index's and the sidecar subsets it — only the disjointness gate
    // tells this (true count 2·rows − pending) from the applyDv split
    // (rows − pending); a rewrite here would halve the answer
    val dir = dvTable()
    withRule(true) {
      def q() = Layout.readSnapshot(spark, dir)
        .unionByName(spark.read.parquet(dir))
        .agg(count(lit(1)).as("n"))
      assert(!firesIndexOnly(q()),
        s"overlapping union must NOT be index-answered:\n${q().queryExecution.optimizedPlan}")
      assert(q().collect().head.getLong(0) == 3900L + 4000L)
      sameRows(() => q())
    }
  }

  test("dv table: min/max/count(c)/sum decline — a deleted extremum is never index-answered") {
    val dir = dvTable()
    withRule(true) {
      def mx() = Layout.readSnapshot(spark, dir).agg(max($"x").as("mx"))
      assert(!firesIndexOnly(mx()), "max over a DV table must NOT answer from the index")
      // the index says 3999; the true visible max is 3899 — the decline
      // is what keeps the answer right
      assert(mx().collect().head.getLong(0) == 3899L)
      def others() = Layout.readSnapshot(spark, dir)
        .agg(min($"x").as("mn"), count($"x").as("nx"), sum($"y").as("sy"))
      assert(!firesIndexOnly(others()))
      // count(*) ALONGSIDE a non-count aggregate must also decline as a
      // whole (the outputs rewrite together or not at all)
      def mixed() = Layout.readSnapshot(spark, dir)
        .agg(count(lit(1)).as("n"), max($"x").as("mx"))
      assert(!firesIndexOnly(mixed()))
      val m = mixed().collect().head
      assert(m.getLong(0) == 3900L && m.getLong(1) == 3899L)
    }
  }
}
