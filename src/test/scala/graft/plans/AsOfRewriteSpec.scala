package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.operators.AsOfJoin

/** The naive-as-of optimizer rewrite: the rank-1 and max_by spellings of
  * "latest right at-or-before each left" must optimize to the [[AsOfJoin]]
  * union+window plan (zero joins) when the rule is on, produce identical
  * results to the naive plan, and stay untouched when the rule is off or
  * the pattern is not actually an as-of join.
  *
  * The rule is registered through `experimental.extraOptimizations` here
  * (the same `Rule[LogicalPlan]` instance the `GraftExtensions` injection
  * path builds) so the suite is independent of which test session this
  * JVM created first — `spark.sql.extensions` only applies at session
  * creation. Gating still goes through `spark.graft.asof.rewrite`.
  *
  * A `QueryExecution` caches its optimized plan, so every rule-on /
  * rule-off measurement builds the query FRESH inside [[withRule]] —
  * queries are passed as thunks, not DataFrames. */
class AsOfRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.experimental.extraOptimizations ++= Seq(new AsOfRewriteRule(s))
    s
  }
  import spark.implicits._

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set(AsOfRewriteRule.ConfKey, on.toString)
    try body
    finally spark.conf.unset(AsOfRewriteRule.ConfKey)
  }

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  /** Random probe/version fixture. The version side is unique per
    * (key, ts) — the determinism contract under which naive and rewritten
    * plans must agree value-for-value; the probe side contains duplicate
    * rows on purpose (the rank-1/max_by patterns collapse them, and the
    * rewrite must too). */
  private def fixture(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    val probe = (1 to 300).map { _ =>
      ("k" + rnd.nextInt(5), rnd.nextInt(1000).toLong, "p" + rnd.nextInt(120))
    }
    val version = new Random(seed + 100).shuffle(
      (for (k <- 0 until 5; t <- 0 until 1000 if rnd.nextDouble() < 0.2)
        yield ("k" + k, t.toLong, s"v$k-$t")).toList)
    (probe.toDF("k", "lts", "lid"), version.toDF("vk", "rts", "rid"))
  }

  private def collectSorted(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))

  /** Collect + join-count a freshly built query under each rule setting
    * and assert: rule off keeps `expectOffJoins`, rule on leaves zero
    * joins, and both settings return identical rows. */
  private def assertRewrites(mk: () => DataFrame): Seq[Seq[String]] = {
    val (offRows, offJoins) = withRule(on = false) { val df = mk(); (collectSorted(df), joins(df)) }
    val (onRows, onJoins)   = withRule(on = true)  { val df = mk(); (collectSorted(df), joins(df)) }
    assert(offJoins == 1, "naive plan should keep its join with the rule off")
    assert(onJoins == 0, "rewrite should leave ZERO joins")
    assert(onRows == offRows, "rewritten results diverged from the naive plan")
    onRows
  }

  private def assertKeepsJoin(mk: () => DataFrame, clue: String): Unit =
    withRule(on = true)(assert(joins(mk()) == 1, clue))

  // ---------------------------------------------------------------- rank-1

  private def naiveRankOne(probe: DataFrame, version: DataFrame,
                           cmp: (Column, Column) => Column, desc: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = if (desc) col("rts").desc else col("rts").asc
    probe.join(version, col("k") === col("vk") && cmp(col("rts"), col("lts")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(ord)))
      .filter(col("rn") === 1)
      .select("k", "lts", "lid", "vk", "rts", "rid")
  }

  test("rank-1 backward: rule removes the join, results identical to the naive plan") {
    val (probe, version) = fixture(1)
    val rows = assertRewrites(() => naiveRankOne(probe, version, _ <= _, desc = true))
    // and the rewrite agrees with the operator it targets
    val direct = withRule(on = false)(collectSorted(
      AsOfJoin.backward(probe.dropDuplicates(), version.withColumnRenamed("vk", "k"),
          Seq("k"), "lts", "rts")
        .select(col("k"), col("lts"), col("lid"), col("k").as("vk"), col("rts"), col("rid"))))
    assert(rows == direct)
  }

  test("rank-1 forward strict: ascending order with a strict > inequality") {
    val (probe, version) = fixture(2)
    assertRewrites(() => naiveRankOne(probe, version, _ > _, desc = false))
  }

  test("rank-1 negative: partition not covering the probe row keeps the naive plan") {
    import org.apache.spark.sql.expressions.Window
    val (probe, version) = fixture(3)
    // partition by key only → one row per KEY, not per probe row: not an
    // as-of join; the rule must not fire
    assertKeepsJoin(() =>
      probe.join(version, col("k") === col("vk") && col("rts") <= col("lts"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("k")).orderBy(col("rts").desc)))
        .filter(col("rn") === 1),
      "rule fired on a non-as-of rank pattern")
  }

  test("rank-1 negative: order direction contradicting the inequality keeps the naive plan") {
    import org.apache.spark.sql.expressions.Window
    val (probe, version) = fixture(4)
    // rts <= lts but ASC order: picks the EARLIEST match, not an as-of
    assertKeepsJoin(() =>
      probe.join(version, col("k") === col("vk") && col("rts") <= col("lts"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(col("rts").asc)))
        .filter(col("rn") === 1),
      "rule fired on a direction-mismatched pattern")
  }

  // --------------------------------------------------------- density gate

  /** Single hot key: ~300 probe rows and ~200 version rows on "k0" —
    * both sides far past the 100 rows/key break-even; version unique per
    * (key, ts) to keep the determinism contract. */
  private def denseFixture(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    val probe = (1 to 300).map(i => ("k0", rnd.nextInt(1000).toLong, s"p${rnd.nextInt(120)}"))
    val version = (0 until 1000).filter(_ => rnd.nextDouble() < 0.2)
      .map(t => ("k0", t.toLong, s"v-$t"))
    (probe.toDF("k", "lts", "lid"), version.toDF("vk", "rts", "rid"))
  }

  private def withDefaultMode[T](body: => T): T = {
    spark.conf.unset(AsOfRewriteRule.ConfKey) // default = auto
    body
  }

  test("auto (default): dense per-key input fires the rewrite, results identical") {
    val (probe, version) = denseFixture(30)
    def mk() = naiveRankOne(probe, version, _ <= _, desc = true)
    val off = withRule(on = false)(collectSorted(mk()))
    withDefaultMode {
      val df = mk()
      assert(joins(df) == 0, "auto mode should fire at ~200+ rows/key per side")
      assert(collectSorted(df) == off)
    }
  }

  test("auto (default): sparse per-key input leaves the naive plan") {
    val (probe, version) = fixture(5) // ~60 and ~40 rows/key, below break-even
    withDefaultMode {
      assert(joins(naiveRankOne(probe, version, _ <= _, desc = true)) == 1)
    }
  }

  test("density threshold conf moves the break-even") {
    val (probe, version) = fixture(31)
    spark.conf.set(PlanStats.MinRowsPerKeyConf, "5")
    try withDefaultMode {
      assert(joins(naiveRankOne(probe, version, _ <= _, desc = true)) == 0,
        "a 5 rows/key threshold should fire on the sparse fixture")
    } finally spark.conf.unset(PlanStats.MinRowsPerKeyConf)
  }

  test("invalid conf value fails loudly, not silently off") {
    val (probe, version) = fixture(32)
    spark.conf.set(AsOfRewriteRule.ConfKey, "enabled")
    try {
      val e = intercept[Exception] {
        naiveRankOne(probe, version, _ <= _, desc = true).queryExecution.optimizedPlan
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains(AsOfRewriteRule.ConfKey))
    } finally spark.conf.unset(AsOfRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- max_by

  test("max_by backward: group-by argmax rewrites, results identical") {
    val (probe, version) = fixture(6)
    assertRewrites(() =>
      probe.join(version, col("k") === col("vk") && col("rts") <= col("lts"))
        .groupBy(col("k"), col("lts"), col("lid"))
        .agg(max_by(col("rid"), col("rts")).as("rid"), max(col("rts")).as("rts")))
  }

  test("min_by forward with a struct value and the version key in the output") {
    val (probe, version) = fixture(7)
    assertRewrites(() =>
      probe.join(version, col("k") === col("vk") && col("rts") >= col("lts"))
        .groupBy(col("k"), col("lts"), col("lid"))
        .agg(min_by(struct(col("vk"), col("rid")), col("rts")).as("m"))
        .select(col("k"), col("lts"), col("lid"), col("m.vk"), col("m.rid")))
  }

  test("max_by negative: a non-argmax aggregate keeps the naive plan") {
    val (probe, version) = fixture(8)
    assertKeepsJoin(() =>
      probe.join(version, col("k") === col("vk") && col("rts") <= col("lts"))
        .groupBy(col("k"), col("lts"), col("lid"))
        .agg(max_by(col("rid"), col("rts")).as("rid"), count(lit(1)).as("n")),
      "rule fired despite a count() aggregate")
  }

  // ---------------------------------------------------------------- left

  test("LEFT OUTER rank-1 maps to joinType=left: unmatched probes keep null version rows") {
    import org.apache.spark.sql.expressions.Window
    val (probe0, version0) = fixture(20)
    // guarantee unmatched probes: k4 has no versions at all, and some
    // probes predate every version of their key
    val version = version0.filter(col("vk") =!= "k4" && col("rts") >= 100L)
    val probe   = probe0
    val rows = assertRewrites(() =>
      probe.join(version, col("k") === col("vk") && col("rts") <= col("lts"), "left")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(col("rts").desc)))
        .filter(col("rn") === 1)
        .select("k", "lts", "lid", "vk", "rts", "rid"))
    // unmatched probes must be present, with the VERSION KEY null too
    assert(rows.exists(r => r(3) == "null" && r(4) == "null"), "no unmatched row survived")
    assert(!rows.exists(r => r(4) == "null" && r(3) != "null"),
      "unmatched row leaked a non-null version key")
  }

  test("LEFT OUTER max_by with tolerance band rewrites and matches") {
    val (probe, version0) = fixture(21)
    val version = version0.filter(col("rts") >= 200L)
    assertRewrites(() =>
      probe.join(version,
          col("k") === col("vk") && col("rts") <= col("lts") && col("rts") >= col("lts") - 60L,
          "left")
        .groupBy(col("k"), col("lts"), col("lid"))
        .agg(max_by(col("rid"), col("rts")).as("rid"), max(col("rts")).as("rts")))
  }

  test("negative: RIGHT OUTER keeps the naive plan (preserved side is not the probe)") {
    import org.apache.spark.sql.expressions.Window
    val (probe, version) = fixture(22)
    assertKeepsJoin(() =>
      probe.join(version, col("k") === col("vk") && col("rts") <= col("lts"), "right")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(col("rts").desc)))
        .filter(col("rn") === 1),
      "rule fired on a right-outer join")
  }

  test("RIGHT OUTER with the probe preserved normalizes to joinType=left and rewrites") {
    import org.apache.spark.sql.expressions.Window
    val (probe, version0) = fixture(23)
    // guarantee unmatched probes so the outer semantics are exercised
    val version = version0.filter(col("vk") =!= "k4" && col("rts") >= 100L)
    // `version RIGHT JOIN probe` IS `probe LEFT JOIN version` spelled
    // backwards; the rule must normalize the orientation before matching
    val rows = assertRewrites(() =>
      version.join(probe, col("k") === col("vk") && col("rts") <= col("lts"), "right")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(col("rts").desc)))
        .filter(col("rn") === 1)
        .select("k", "lts", "lid", "vk", "rts", "rid"))
    assert(rows.exists(r => r(3) == "null" && r(4) == "null"), "no unmatched row survived")
    assert(!rows.exists(r => r(4) == "null" && r(3) != "null"),
      "unmatched row leaked a non-null version key")
  }

  // ---------------------------------------------------------------- band

  test("tolerance band on rank-1 maps to the operator's tolerance flag") {
    import org.apache.spark.sql.expressions.Window
    val (probe, version) = fixture(10)
    val rows = assertRewrites(() =>
      probe.join(version,
          col("k") === col("vk") && col("rts") <= col("lts") && col("rts") >= col("lts") - 50L)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(col("rts").desc)))
        .filter(col("rn") === 1)
        .select("k", "lts", "lid", "vk", "rts", "rid"))
    // and the band really is the operator's tolerance semantics
    val direct = withRule(on = false)(collectSorted(
      AsOfJoin.backward(probe.dropDuplicates(), version.withColumnRenamed("vk", "k"),
          Seq("k"), "lts", "rts", tolerance = Some(50L))
        .select(col("k"), col("lts"), col("lid"), col("k").as("vk"), col("rts"), col("rid"))))
    assert(rows == direct)
  }

  test("forward band in the distance spelling rewrites through max_by") {
    val (probe, version) = fixture(11)
    assertRewrites(() =>
      probe.join(version,
          col("k") === col("vk") && col("rts") >= col("lts") && col("rts") - col("lts") <= 40L)
        .groupBy(col("k"), col("lts"), col("lid"))
        .agg(min_by(col("rid"), col("rts")).as("rid"), min(col("rts")).as("rts")))
  }

  test("negative: a stray non-band conjunct keeps the naive plan") {
    import org.apache.spark.sql.expressions.Window
    val (probe, version) = fixture(12)
    assertKeepsJoin(() =>
      probe.join(version,
          col("k") === col("vk") && col("rts") <= col("lts") && col("rid") =!= col("lid"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(col("rts").desc)))
        .filter(col("rn") === 1),
      "rule fired despite a non-band residual conjunct")
  }

  // -------------------------------------------------------------- fuzzed

  test("randomized conjunct forms: every firing rewrite matches the naive plan") {
    val rnd = new Random(2024)
    for (round <- 1 to 12) {
      import org.apache.spark.sql.expressions.Window
      val (probe, version) = fixture(100 + round)
      val strict  = rnd.nextBoolean()
      val forward = rnd.nextBoolean()
      val left    = rnd.nextBoolean()
      val band    = rnd.nextBoolean()
      val flipKey = rnd.nextBoolean()
      val flipIneq = rnd.nextBoolean()
      val flipSides = rnd.nextBoolean() // version JOIN probe (RIGHT for outer)
      def mk(): DataFrame = {
        val key  = if (flipKey) col("vk") === col("k") else col("k") === col("vk")
        val core = (forward, strict, flipIneq) match {
          case (false, false, false) => col("rts") <= col("lts")
          case (false, false, true)  => col("lts") >= col("rts")
          case (false, true, false)  => col("rts") < col("lts")
          case (false, true, true)   => col("lts") > col("rts")
          case (true, false, false)  => col("rts") >= col("lts")
          case (true, false, true)   => col("lts") <= col("rts")
          case (true, true, false)   => col("rts") > col("lts")
          case (true, true, true)    => col("lts") < col("rts")
        }
        val bandCond =
          if (!band) lit(true)
          else if (forward) {
            if (rnd.nextBoolean()) col("rts") <= col("lts") + 70L else col("rts") - col("lts") <= 70L
          } else {
            if (rnd.nextBoolean()) col("rts") >= col("lts") - 70L else col("lts") - col("rts") <= 70L
          }
        // conjunct order shuffled; half the rounds spell the join with
        // the version side first (RIGHT OUTER when the probe is preserved)
        val conds = new Random(round).shuffle(List(key, core) ++ (if (band) List(bandCond) else Nil))
        val joined =
          if (flipSides) version.join(probe, conds.reduce(_ && _), if (left) "right" else "inner")
          else probe.join(version, conds.reduce(_ && _), if (left) "left" else "inner")
        val ord = if (forward) col("rts").asc else col("rts").desc
        joined
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k"), col("lts"), col("lid")).orderBy(ord)))
          .filter(col("rn") === 1)
          .select("k", "lts", "lid", "vk", "rts", "rid")
      }
      val off = withRule(on = false)(collectSorted(mk()))
      val (on, nJoins) = withRule(on = true)((collectSorted(mk()), joins(mk())))
      assert(nJoins == 0, s"round $round (strict=$strict fwd=$forward left=$left band=$band): no rewrite")
      assert(on == off, s"round $round (strict=$strict fwd=$forward left=$left band=$band): diverged")
    }
  }

  // ---------------------------------------------------------------- SQL

  test("SQL rank-1 formulation rewrites and matches DataFrame results") {
    val (probe, version) = fixture(9)
    probe.createOrReplaceTempView("asof_probe")
    version.createOrReplaceTempView("asof_version")
    val sql =
      """SELECT k, lts, lid, vk, rts, rid FROM (
        |  SELECT p.*, v.vk, v.rts, v.rid,
        |         ROW_NUMBER() OVER (PARTITION BY p.k, p.lts, p.lid ORDER BY v.rts DESC) AS rn
        |  FROM asof_probe p JOIN asof_version v
        |    ON p.k = v.vk AND v.rts <= p.lts
        |) WHERE rn = 1""".stripMargin
    assertRewrites(() => spark.sql(sql))
  }
}
