package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The naive point-in-interval optimizer rewrite: an inner equi-join with
  * two range conjuncts must optimize to the bucketized IntervalJoin plan
  * (cell explode + equi-join on (key, cell)) when the rule is on, with
  * identical results — including strict bounds, null timestamps, and
  * inverted intervals — and must not fire on non-matching shapes. */
class IntervalRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    IntervalRewriteRule.ensure(s)
    s
  }
  import spark.implicits._

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set(IntervalRewriteRule.ConfKey, on.toString)
    try body
    finally spark.conf.unset(IntervalRewriteRule.ConfKey)
  }

  private def exploded(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case g: Generate => g }.nonEmpty

  private def collectSorted(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))

  /** Points with some null timestamps; intervals with some inverted
    * spans — the naive join drops both, and the rewrite must too. */
  private def fixture(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    val points = (1 to 400).map { i =>
      ("k" + rnd.nextInt(5),
        if (rnd.nextDouble() < 0.05) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextInt(1000).toLong),
        s"p$i")
    }
    val intervals = (1 to 120).map { i =>
      val s = rnd.nextInt(1000).toLong
      val e = if (rnd.nextDouble() < 0.1) s - 5 else s + rnd.nextInt(80)
      ("k" + rnd.nextInt(5), s, e, s"iv$i")
    }
    (points.toDF("k", "ts", "pid"), intervals.toDF("ik", "s", "e", "iid"))
  }

  private def assertRewrites(mk: () => DataFrame): Seq[Seq[String]] = {
    val (offRows, offExpl) = withRule(on = false) { val df = mk(); (collectSorted(df), exploded(df)) }
    val (onRows, onExpl)   = withRule(on = true)  { val df = mk(); (collectSorted(df), exploded(df)) }
    assert(!offExpl, "naive plan should have no explode with the rule off")
    assert(onExpl, "rewrite should bucketize (cell explode) with the rule on")
    assert(onRows == offRows, "rewritten results diverged from the naive plan")
    onRows
  }

  private def assertKeepsPlan(mk: () => DataFrame, clue: String): Unit =
    withRule(on = true)(assert(!exploded(mk()), clue))

  test("inner equi-join + inclusive range rewrites to the bucketized plan, results identical") {
    val (points, intervals) = fixture(1)
    val rows = assertRewrites(() =>
      points.join(intervals, col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e")))
    assert(rows.nonEmpty)
  }

  test("strict bounds are re-imposed exactly") {
    val (points, intervals) = fixture(2)
    assertRewrites(() =>
      points.join(intervals, col("k") === col("ik") && col("s") < col("ts") && col("ts") < col("e")))
    // mixed strictness, flipped orientations
    assertRewrites(() =>
      points.join(intervals, col("ik") === col("k") && col("ts") >= col("s") && col("e") > col("ts")))
  }

  test("negative shapes keep the naive plan") {
    val (points, intervals) = fixture(3)
    assertKeepsPlan(() =>
      points.join(intervals, col("k") === col("ik") && col("s") <= col("ts")),
      "fired with only one bound")
    assertKeepsPlan(() =>
      points.join(intervals,
        col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "left"),
      "fired on an outer join")
    assertKeepsPlan(() =>
      points.join(intervals, col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("s")),
      "fired with both bounds on one interval column")
  }

  test("overlap pattern rewrites to the canonical-cell plan, inverted intervals included") {
    val rnd = new Random(5)
    val a = (1 to 150).map { i =>
      val s = rnd.nextInt(1000).toLong
      val e = if (rnd.nextDouble() < 0.08) s - 10 else s + rnd.nextInt(60)
      ("k" + rnd.nextInt(4), s, e, s"a$i")
    }.toDF("k", "as", "ae", "aid")
    val b = (1 to 150).map { i =>
      val s = rnd.nextInt(1000).toLong
      val e = if (rnd.nextDouble() < 0.08) s - 10 else s + rnd.nextInt(60)
      ("k" + rnd.nextInt(4), s, e, s"b$i")
    }.toDF("bk", "bs", "be", "bid")
    val rows = assertRewrites(() =>
      a.join(b, col("k") === col("bk") && col("as") <= col("be") && col("bs") <= col("ae")))
    assert(rows.nonEmpty)
    // strict / flipped-orientation variant
    assertRewrites(() =>
      a.join(b, col("k") === col("bk") && col("as") < col("be") && col("ae") >= col("bs")))
  }

  test("overlap negative: a third cross-side inequality (self-join anti-reflexive) keeps the naive plan") {
    val (points, _) = fixture(6)
    val a = points.toDF("k", "ts", "pid")
    val l = a.select(col("k"), col("ts").as("as"), (col("ts") + 30L).as("ae"), col("pid").as("aid"))
    val r = a.select(col("k").as("bk"), col("ts").as("bs"), (col("ts") + 30L).as("be"), col("pid").as("bid"))
    assertKeepsPlan(() =>
      l.join(r, col("k") === col("bk") && col("as") <= col("be") && col("bs") <= col("ae") &&
        col("aid") < col("bid")),
      "fired despite a third cross-side inequality")
  }

  test("residual predicates ride along as exact post-filters") {
    val (points, intervals) = fixture(7)
    // point shape + a non-bound-shaped cross-side conjunct
    assertRewrites(() =>
      points.join(intervals,
        col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e") &&
          col("ts") % 2L === col("s") % 2L))
    // overlap shape + an arithmetic residual
    val rnd = new Random(8)
    val a = (1 to 120).map { i =>
      val s = rnd.nextInt(800).toLong; ("k" + rnd.nextInt(4), s, s + rnd.nextInt(50), s"a$i")
    }.toDF("k", "as", "ae", "aid")
    val b = (1 to 120).map { i =>
      val s = rnd.nextInt(800).toLong; ("k" + rnd.nextInt(4), s, s + rnd.nextInt(50), s"b$i")
    }.toDF("bk", "bs", "be", "bid")
    assertRewrites(() =>
      a.join(b, col("k") === col("bk") && col("as") <= col("be") && col("bs") <= col("ae") &&
        col("as") + col("bs") < 900L))
  }

  test("randomized conjunct forms: every firing rewrite matches the naive plan") {
    val rnd = new Random(4040)
    for (round <- 1 to 14) {
      val (points0, intervals) = fixture(200 + round)
      val strictLo = rnd.nextBoolean(); val strictHi = rnd.nextBoolean()
      val flipKey  = rnd.nextBoolean(); val flipLo   = rnd.nextBoolean()
      val flipHi   = rnd.nextBoolean(); val residual = rnd.nextBoolean()
      // outer needs the provable-unique point side; flipSides spells it
      // as intervals RIGHT JOIN points (the mirror the matcher accepts)
      val outer = rnd.nextBoolean(); val flipSides = rnd.nextBoolean()
      val points = if (outer) uniquePoints(points0) else points0
      def mk(): DataFrame = {
        val key = if (flipKey) col("ik") === col("k") else col("k") === col("ik")
        val lo = (strictLo, flipLo) match {
          case (false, false) => col("s") <= col("ts")
          case (false, true)  => col("ts") >= col("s")
          case (true, false)  => col("s") < col("ts")
          case (true, true)   => col("ts") > col("s")
        }
        val hi = (strictHi, flipHi) match {
          case (false, false) => col("ts") <= col("e")
          case (false, true)  => col("e") >= col("ts")
          case (true, false)  => col("ts") < col("e")
          case (true, true)   => col("e") > col("ts")
        }
        val conds = List(key, lo, hi) ++
          (if (residual) List(col("ts") % 3L =!= col("s") % 3L) else Nil)
        val cond = new Random(round).shuffle(conds).reduce(_ && _)
        if (outer && flipSides) intervals.join(points, cond, "right")
        else if (outer) points.join(intervals, cond, "left")
        else if (flipSides) intervals.join(points, cond)
        else points.join(intervals, cond)
      }
      val off = withRule(on = false)(collectSorted(mk()))
      val (on, onExpl) = withRule(on = true)((collectSorted(mk()), exploded(mk())))
      assert(onExpl, s"round $round (sLo=$strictLo sHi=$strictHi res=$residual outer=$outer): no rewrite")
      assert(on == off, s"round $round (sLo=$strictLo sHi=$strictHi res=$residual outer=$outer): diverged")
    }
  }

  // ------------------------------------------------------------ left outer

  /** Points deduplicated to one row per pid through a single-grouping
    * Aggregate — the structural uniqueness the outer rewrite requires. */
  private def uniquePoints(points: org.apache.spark.sql.DataFrame) =
    points.filter(col("pid").isNotNull)
      .groupBy(col("pid"))
      .agg(max(col("k")).as("k"), max(col("ts")).as("ts"))

  test("LEFT OUTER with an aggregate-unique point id rewrites; unmatched rows and null keys preserved") {
    val (points0, intervals) = fixture(11)
    val points = uniquePoints(points0)
    def mk() = points.join(intervals,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "left")
    val rows = assertRewrites(mk)
    // unmatched points survive with the INTERVAL KEY null too
    val iidIdx = mk().columns.indexOf("iid")
    val ikIdx  = mk().columns.indexOf("ik")
    assert(rows.exists(r => r(iidIdx) == "null" && r(ikIdx) == "null"),
      "no unmatched null-extended row survived")
    assert(!rows.exists(r => r(iidIdx) == "null" && r(ikIdx) != "null"),
      "unmatched row leaked a non-null interval key")
  }

  test("RIGHT OUTER with the points preserved on the right also rewrites") {
    val (points0, intervals) = fixture(12)
    val points = uniquePoints(points0)
    assertRewrites(() => intervals.join(points,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "right"))
  }

  test("LEFT OUTER strict bounds and residuals rewrite via innerFilter (join-condition semantics)") {
    val (points0, intervals) = fixture(13)
    val points = uniquePoints(points0)
    // strict bound: matched-but-not-strictly candidates null-extend
    // (applied inside, before the anti-join) — parity proves it
    val strictRows = assertRewrites(() => points.join(intervals,
      col("k") === col("ik") && col("s") < col("ts") && col("ts") <= col("e"), "left"))
    assert(strictRows.nonEmpty)
    // residual conjunct: points whose every candidate fails it null-extend
    def mkRes() = points.join(intervals,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e") &&
        col("ts") % 2L === col("s") % 2L, "left")
    val resRows = assertRewrites(mkRes)
    val iidIdx = mkRes().columns.indexOf("iid")
    assert(resRows.exists(r => r(iidIdx) == "null"),
      "expected at least one residual-failed point to null-extend")
    // both at once, mixed orientations
    assertRewrites(() => points.join(intervals,
      col("ik") === col("k") && col("ts") > col("s") && col("e") >= col("ts") &&
        col("ts") % 3L =!= col("s") % 3L, "left"))
  }

  test("LEFT OUTER with a NULL grouping id that matches: no spurious null-extended duplicate") {
    // an Aggregate's single grouping attribute is unique but NULLABLE —
    // its one NULL group is a legitimate point id. The operator's anti
    // join must treat it null-safely, or the matched NULL-id row ALSO
    // re-emits null-extended and the rewrite gains a row the naive LEFT
    // join does not have.
    val points = Seq((Some("p1"), "a", 10L), (None: Option[String], "a", 12L),
        (None: Option[String], "a", 11L), (Some("p2"), "a", 900L))
      .toDF("pid", "k", "ts")
      .groupBy(col("pid")).agg(max(col("k")).as("k"), max(col("ts")).as("ts"))
    val intervals = Seq(("a", 5L, 15L, "i1")).toDF("ik", "s", "e", "iid")
    val rows = assertRewrites(() => points.join(intervals,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "left"))
    // exactly 3 grouped points: p1 matched, NULL matched (ts=12), p2 unmatched
    assert(rows.size == 3, s"expected 3 rows, got:\n${rows.map(_.mkString(",")).mkString("\n")}")
  }

  test("outer negatives: no provable unique id on the preserved side keeps the naive plan") {
    val (points0, intervals) = fixture(13)
    val points = uniquePoints(points0)
    // raw points (no Aggregate) — uniqueness not provable
    assertKeepsPlan(() => points0.join(intervals,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "left"),
      "fired on an outer join without a provable unique point id")
    // interval-preserved outer with RAW intervals — no provable interval id
    assertKeepsPlan(() => intervals.join(points,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "left"),
      "fired on an interval-preserved outer join without a provable unique interval id")
  }

  // ----------------------------------------------- interval-preserved outer

  /** Intervals deduplicated to one row per iid through a single-grouping
    * Aggregate — the structural uniqueness the interval-preserved outer
    * rewrite requires. */
  private def uniqueIntervals(intervals: org.apache.spark.sql.DataFrame) =
    intervals.groupBy(col("iid"))
      .agg(max(col("ik")).as("ik"), max(col("s")).as("s"), max(col("e")).as("e"))

  test("interval-preserved LEFT OUTER rewrites to pointInIntervalRight; uncovered intervals null-extend") {
    val (points, intervals0) = fixture(21)
    val intervals = uniqueIntervals(intervals0)
    def mk() = intervals.join(points,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "left")
    val rows = assertRewrites(mk)
    // uncovered intervals survive with the POINT KEY null too
    val pidIdx = mk().columns.indexOf("pid")
    val kIdx   = mk().columns.indexOf("k")
    assert(rows.exists(r => r(pidIdx) == "null" && r(kIdx) == "null"),
      "no uncovered null-extended interval row survived")
    assert(!rows.exists(r => r(pidIdx) == "null" && r(kIdx) != "null"),
      "an uncovered interval leaked a non-null point key")
    // the RIGHT mirror (points on the left, intervals preserved on the right)
    assertRewrites(() => points.join(intervals,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"), "right"))
  }

  test("interval-preserved outer: strict bounds, residuals, and inverted intervals stay exact") {
    val (points, intervals0) = fixture(22) // fixture has ~10% inverted spans
    val intervals = uniqueIntervals(intervals0)
    // strict + residual route to innerFilter: intervals whose every
    // candidate fails them null-extend, never drop
    assertRewrites(() => intervals.join(points,
      col("ik") === col("k") && col("ts") > col("s") && col("e") >= col("ts") &&
        col("ts") % 2L === col("s") % 2L, "left"))
    // randomized conjunct orders and orientations
    val rnd = new Random(2200)
    for (round <- 1 to 6) {
      val conds = List(
        if (rnd.nextBoolean()) col("k") === col("ik") else col("ik") === col("k"),
        if (rnd.nextBoolean()) col("s") <= col("ts") else col("ts") >= col("s"),
        if (rnd.nextBoolean()) col("ts") <= col("e") else col("e") >= col("ts")) ++
        (if (rnd.nextBoolean()) List(col("ts") % 3L =!= col("s") % 3L) else Nil)
      val cond = new Random(round).shuffle(conds).reduce(_ && _)
      val flip = rnd.nextBoolean()
      val rows = assertRewrites(() =>
        if (flip) points.join(intervals, cond, "right")
        else intervals.join(points, cond, "left"))
      assert(rows.nonEmpty, s"round $round")
    }
  }

  test("auto (default): sparse per-key density leaves the naive plan") {
    val (points, intervals) = fixture(4) // ~80 points/key, ~24 intervals/key
    spark.conf.unset(IntervalRewriteRule.ConfKey) // default = auto
    assert(!exploded(
      points.join(intervals, col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"))))
  }

  test("auto (default): dense per-key input fires the rewrite, results identical") {
    // single hot key: 400 points/key, 120 intervals/key — both past the
    // 100 rows/key break-even
    val (p0, iv0) = fixture(9)
    val points = p0.withColumn("k", lit("k0"))
    val intervals = iv0.withColumn("ik", lit("k0"))
    def mk() = points.join(intervals,
      col("k") === col("ik") && col("s") <= col("ts") && col("ts") <= col("e"))
    val off = withRule(on = false)(collectSorted(mk()))
    spark.conf.unset(IntervalRewriteRule.ConfKey)
    val df = mk()
    assert(exploded(df), "auto mode should fire at 120+ rows/key per side")
    assert(collectSorted(df) == off)
  }
}
