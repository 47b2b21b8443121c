package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{AsOfJoin, HeavyHitters, IntervalJoin}
import graft.operators.Checkpoints.CheckpointOps
import graft.functions.TextFunctions
import graft.GraftSql

/** Round-9 relational-operator queries: the general as-of join, the
  * bucketized point-in-interval join, and exact sketch-pruned heavy
  * hitters — each an operator family Spark lacks natively, oracle-checked
  * against DuckDB (ASOF JOIN / inequality join / plain GROUP BY). */
object RelOpsQueries {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  private def ev(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables(spark, dir).events
    raw.withColumn("ts_us", Tables.tsToMicros(raw, "ts"))
  }

  // ---------------------------------------------------------------- q110
  /** As-of join ([[AsOfJoin]]): each purchase matched to the user's latest
    * at-or-before click. The right side is pre-aggregated to one row per
    * (user, ts) — max event_id — so the match is deterministic and the
    * DuckDB `ASOF JOIN` oracle is well-defined under ties. */
  def q110AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val clicks = e.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts_us".as("click_us"))
      .agg(max($"event_id").as("click_id"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
    AsOfJoin
      .backward(purchases, clicks, Seq("user_id"), leftTs = "purchase_us", rightTs = "click_us")
      .select($"user_id", $"purchase_id", $"purchase_us", $"click_id", $"click_us",
        ($"purchase_us" - $"click_us").as("wait_us"))
  }

  // ---------------------------------------------------------------- q111
  /** Point-in-interval join ([[IntervalJoin]]): error events located inside
    * the q12 user sessions (30-min-gap, ≥3 events), rolled up per session.
    * Errors belonging to dropped (<3-event) sessions match nothing. */
  def q111IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sessions = EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
    val errors = ev(spark, dir)
      .filter($"event_type" === "error")
      .select($"user_id", $"ts_us", cents($"value").as("v_c"))
    IntervalJoin
      .pointInInterval(errors, sessions, Seq("user_id"),
        pointTs = "ts_us", startCol = "start_us", endCol = "end_us",
        bucketWidth = 3600L * 1000000L)
      .groupBy($"user_id", $"session_id", $"start_us", $"end_us")
      .agg(count(lit(1)).as("n_errors"), sum($"v_c").as("sum_err_v_c"))
  }

  // ---------------------------------------------------------------- q112
  /** Exact heavy hitters ([[HeavyHitters]]): corpus tokens above 2 000 ppm,
    * sketch-pruned (Misra–Gries, k=1023 → guarantee holds for
    * φ ≥ 977 ppm) then exactly re-counted — same answer as the oracle's
    * full GROUP BY, a fraction of its shuffle. */
  def q112HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir).documents
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
    HeavyHitters.exact(toks, $"tok", phiPpm = 2000L, k = 1023)
      .select($"item".as("tok"), $"cnt", $"ppm")
  }

  // ---------------------------------------------------------------- q113
  /** Interval-overlap self-join ([[IntervalJoin.overlap]]): pairs of the
    * same customer's orders whose fulfillment spans
    * `[o_orderdate, max(l_shipdate)]` overlap — concurrent open orders.
    * ~45k pairs from 15k orders at sf0.01. Width is DERIVED from the
    * span distribution ([[IntervalJoin.medianSpanWidth]] ≈ 734 days here:
    * dates are uniform over ~2 500 days, so spans are huge) ⇒ ~2 replicas
    * per interval, ~2 shared cells per overlapping pair. The first cut
    * hard-coded 30 days ("a month sounds natural"), replicated 28× and
    * ran 3.5× slower — measured in PLANS.md round 9; results are
    * width-invariant so the derivation affects cost only. */
  def q113OverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val o = t.orders
    val l = t.lineitem
    val spans = o.withColumn("o_us", Tables.tsToMicros(o, "o_orderdate"))
      .join(l.withColumn("ship_us", Tables.tsToMicros(l, "l_shipdate")), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey".as("cust"), $"o_orderkey".as("ok"), $"o_us".as("s"))
      // The synthetic tables don't order shipdate after orderdate; clamp so
      // every span is well-formed (fulfillment covers at least order day).
      .agg(max($"ship_us").as("max_ship_us"))
      .withColumn("e", greatest($"max_ship_us", $"s")).drop("max_ship_us")
      // materialized once: consumed by both self-join sides AND the
      // width derivation below (span count is |orders|, not |lineitem|)
      .stageCheckpoint()
    val a = spans.select($"cust", $"ok".as("a_ok"), $"s".as("a_s"), $"e".as("a_e"))
    val b = spans.select($"cust", $"ok".as("b_ok"), $"s".as("b_s"), $"e".as("b_e"))
    IntervalJoin
      .overlap(a, b, Seq("cust"), "a_s", "a_e", "b_s", "b_e",
        bucketWidth = IntervalJoin.medianSpanWidth(spans.select($"s", $"e"), "s", "e"))
      .filter($"a_ok" < $"b_ok")
      .select($"cust", $"a_ok", $"b_ok",
        (least($"a_e", $"b_e") - greatest($"a_s", $"b_s")).as("overlap_us"))
  }

  // ---------------------------------------------------------------- q114
  /** N-gram novelty per document: the share of a doc's distinct 3-gram
    * shingles whose FIRST corpus occurrence (min doc_id = corpus order) is
    * that doc — the curation signal for "how much genuinely new text does
    * this document add" (high duplication ⇒ low novelty).
    *
    * Decomposed so the corpus-sized shingle stream is shuffled ONCE and
    * never joined: per-doc totals are a NARROW `size(array_distinct(...))`
    * projection (no explode, no shuffle); per-doc novel counts are the
    * first-owner table — one row per DISTINCT shingle — re-aggregated by
    * its owner doc. The natural join-back formulation (shingle stream ⋈
    * first-owner on the shingle string, then roll up) shuffles the stream
    * twice more and measured 6.65 s vs ~3.0 s at sf0.1 (PLANS.md round 9;
    * the remaining cost is the one explode + map-side-combined shuffle). */
  def q114NgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select($"doc_id",
        array_distinct(TextFunctions.wordShingles(TextFunctions.tokens($"text"), 3)).as("sh"))
    val totals = docs.select($"doc_id", size($"sh").cast("long").as("n_shingles"))
      .filter($"n_shingles" > 0)
    val novel = docs.select($"doc_id", explode($"sh").as("shingle"))
      .groupBy($"shingle").agg(min($"doc_id").as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_novel"))
    totals.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce($"n_novel", lit(0L)))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_shingles"))
  }

  // ---------------------------------------------------------------- q115
  /** Chunked as-of join ([[AsOfJoin.backwardChunked]] — the hot-key path,
    * oracle-checked here, not just parity-spec'd): each order matched to
    * the same customer's latest STRICTLY-earlier order day (right side
    * pre-aggregated per (cust, day): max orderkey + that day's order
    * count), 90-day chunks. */
  def q115PrevOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables(spark, dir).orders
    val o = raw.select($"o_custkey".as("cust"), $"o_orderkey".as("ok"),
      Tables.tsToMicros(raw, "o_orderdate").as("o_us"))
    val d = o.groupBy($"cust", $"o_us".as("prev_us"))
      .agg(max($"ok").as("prev_ok"), count(lit(1)).as("n_prev_day"))
      // the operator consumes its right side TWICE (per-chunk snapshot
      // aggregate + in-chunk union rows), so the per-day aggregate would
      // evaluate once under each — materialize it once (q113's spans
      // pattern; |cust×day| rows, narrower than the orders scan)
      .stageCheckpoint()
    AsOfJoin
      .backwardChunked(o, d, Seq("cust"), leftTs = "o_us", rightTs = "prev_us",
        chunkWidth = 90L * 86400L * 1000000L, strict = true)
      .select($"cust", $"ok", $"o_us", $"prev_us", $"prev_ok", $"n_prev_day",
        ($"o_us" - $"prev_us").as("gap_us"))
  }

  // ---------------------------------------------------------------- q116
  /** Grouped exact heavy hitters ([[HeavyHitters.exactPerGroup]]): tokens
    * above 30 000 ppm of their SOURCE's token count — per-domain
    * boilerplate detection. Driver-free verify: candidate (source, token)
    * pairs broadcast-semi-join the token stream. */
  def q116SourceHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir).documents
      .select($"source", explode(TextFunctions.tokens($"text")).as("tok"))
    HeavyHitters.exactPerGroup(toks, Seq("source"), $"tok", phiPpm = 30000L, k = 1023)
      .select($"source", $"item".as("tok"), $"cnt", $"ppm")
  }

  // ---------------------------------------------------------------- q117
  /** Forward chunked as-of ([[AsOfJoin.forwardChunked]], oracle-checked):
    * q115's mirror — each order matched to the same customer's earliest
    * STRICTLY-later order day. */
  def q117NextOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables(spark, dir).orders
    val o = raw.select($"o_custkey".as("cust"), $"o_orderkey".as("ok"),
      Tables.tsToMicros(raw, "o_orderdate").as("o_us"))
    val d = o.groupBy($"cust", $"o_us".as("next_us"))
      .agg(max($"ok").as("next_ok"), count(lit(1)).as("n_next_day"))
      // materialized once — q115's comment; the forward variant consumes
      // the right side twice the same way
      .stageCheckpoint()
    AsOfJoin
      .forwardChunked(o, d, Seq("cust"), leftTs = "o_us", rightTs = "next_us",
        chunkWidth = 90L * 86400L * 1000000L, strict = true)
      .select($"cust", $"ok", $"o_us", $"next_us", $"next_ok", $"n_next_day",
        ($"next_us" - $"o_us").as("gap_us"))
  }

  // ---------------------------------------------------------------- q118
  /** As-of with tolerance + left join (the two [[AsOfJoin]] flags q110
    * doesn't oracle): every purchase keeps its row; the matched click is
    * nulled when the nearest prior one is more than 24 h away — DuckDB
    * mirrors this as ASOF LEFT JOIN + a conditional projection (both
    * engines pick the nearest match FIRST, then apply the distance cut,
    * which is exactly the tolerance semantics). */
  def q118AsOfTolerance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val clicks = e.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts_us".as("click_us"))
      .agg(max($"event_id").as("click_id"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
    AsOfJoin
      .backward(purchases, clicks, Seq("user_id"), leftTs = "purchase_us", rightTs = "click_us",
        tolerance = Some(86400L * 1000000L), joinType = "left")
      .select($"user_id", $"purchase_id", $"purchase_us", $"click_id", $"click_us",
        ($"purchase_us" - $"click_us").as("wait_us"))
  }

  // ---------------------------------------------------------------- q119
  /** LEFT-outer point-in-interval join ([[IntervalJoin.pointInIntervalLeft]]):
    * q111's error-in-session placement, but every error event keeps its
    * row — errors outside any qualifying session carry null session
    * columns (the enrichment default: never silently drop the fact
    * stream). One row per error (sessions are disjoint), so no rollup. */
  def q119IntervalLeft(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sessions = EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
    val errors = ev(spark, dir)
      .filter($"event_type" === "error")
      .select($"user_id", $"event_id", $"ts_us")
    IntervalJoin.pointInIntervalLeft(errors, sessions, Seq("user_id"),
      pointId = "event_id", pointTs = "ts_us",
      startCol = "start_us", endCol = "end_us",
      bucketWidth = 3600L * 1000000L)
  }

  // ---------------------------------------------------------------- q120
  /** Chunked as-of with tolerance + left (the flag pair q118 oracles on
    * the PLAIN backward path, here on [[AsOfJoin.backwardChunked]] — the
    * hot-key path's tolerance/left handling was previously only
    * parity-spec'd): q115's previous-order lookup, keeping every order
    * and nulling matches farther than 30 days. */
  def q120ChunkedTolerance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables(spark, dir).orders
    val o = raw.select($"o_custkey".as("cust"), $"o_orderkey".as("ok"),
      Tables.tsToMicros(raw, "o_orderdate").as("o_us"))
    // NOT stage-checkpointed (unlike q115/q117): under the LEFT join the
    // unreferenced window/payload columns prune out of a count-style
    // action entirely, so the twice-consumed aggregate is already cheap —
    // an eager materialization would force computing the payloads the
    // pruned plan never needs (measured 0.20 → 0.45 s when tried).
    val d = o.groupBy($"cust", $"o_us".as("prev_us"))
      .agg(max($"ok").as("prev_ok"), count(lit(1)).as("n_prev_day"))
    AsOfJoin
      .backwardChunked(o, d, Seq("cust"), leftTs = "o_us", rightTs = "prev_us",
        chunkWidth = 90L * 86400L * 1000000L, strict = true,
        tolerance = Some(30L * 86400L * 1000000L), joinType = "left")
      .select($"cust", $"ok", $"o_us", $"prev_us", $"prev_ok", $"n_prev_day",
        ($"o_us" - $"prev_us").as("gap_us"))
  }

  // ---------------------------------------------------------------- q121
  /** The NAIVE as-of SQL — inequality join + rank-1 filter, exactly the
    * quadratic pattern [[AsOfJoin]]'s scaladoc warns about — optimized by
    * [[graft.plans.AsOfRewriteRule]] into the q110 union+window plan
    * (zero joins; plan-shape pinned in PlanShapeSpec). Same semantics and
    * oracle as q110, but here the ENGINE supplies the good plan: the SQL
    * user didn't call the operator API. The rewrite conf is enabled only
    * while this query plans (the physical plan is forced before the
    * conf resets, so later queries optimize with the rule off). */
  def q121NaiveAsofRewrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.AsOfRewriteRule.ensure(spark)
    val e = ev(spark, dir)
    e.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts_us".as("click_us"))
      .agg(max($"event_id").as("click_id"))
      .select($"user_id".as("cuser"), $"click_us", $"click_id")
      .createOrReplaceTempView("g_clicks")
    e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
      .createOrReplaceTempView("g_purchases")
    spark.conf.set(graft.plans.AsOfRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """SELECT user_id, purchase_id, purchase_us, click_id, click_us,
          |       purchase_us - click_us AS wait_us
          |FROM (
          |  SELECT p.*, c.click_id, c.click_us,
          |         ROW_NUMBER() OVER (PARTITION BY p.user_id, p.purchase_id, p.purchase_us
          |                            ORDER BY c.click_us DESC) AS rn
          |  FROM g_purchases p JOIN g_clicks c
          |    ON p.user_id = c.cuser AND c.click_us <= p.purchase_us)
          |WHERE rn = 1""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.AsOfRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q122
  /** SQL-surface as-of ([[graft.GraftSql.asofJoin]]): the temp-view face
    * of the operator — inputs built with `spark.sql`, one verb call, more
    * SQL over the registered output view. Forward + strict here (first
    * click strictly after each purchase), the direction q110/q121 don't
    * cover on the un-chunked path. */
  def q122SqlAsof(spark: SparkSession, dir: String): DataFrame = {
    ev(spark, dir).createOrReplaceTempView("g_events")
    spark.sql(
      """SELECT user_id, ts_us AS click_us, max(event_id) AS click_id
        |FROM g_events WHERE event_type = 'click' GROUP BY 1, 2""".stripMargin)
      .createOrReplaceTempView("g_clicks_sql")
    spark.sql(
      """SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us
        |FROM g_events WHERE event_type = 'purchase'""".stripMargin)
      .createOrReplaceTempView("g_purch_sql")
    GraftSql.asofJoin(spark, out = "g_next_click", left = "g_purch_sql", right = "g_clicks_sql",
      keys = Seq("user_id"), leftTs = "purchase_us", rightTs = "click_us",
      direction = "forward", strict = true)
    spark.sql(
      """SELECT user_id, purchase_id, purchase_us, click_id, click_us,
        |       click_us - purchase_us AS react_us FROM g_next_click""".stripMargin)
  }

  // ---------------------------------------------------------------- q123
  /** SQL-surface left point-in-interval ([[graft.GraftSql.pointInInterval]]):
    * q119's error-in-session placement through the view verb, with the
    * bucket width DERIVED by the verb itself (`bucketWidth = None` →
    * median span) — the SQL user never tunes a width; results are
    * width-invariant so the oracle is q119's. */
  def q123SqlInterval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
      .createOrReplaceTempView("g_sessions")
    ev(spark, dir).createOrReplaceTempView("g_events")
    spark.sql("SELECT user_id, event_id, ts_us FROM g_events WHERE event_type = 'error'")
      .createOrReplaceTempView("g_errors")
    GraftSql.pointInInterval(spark, out = "g_err_sess", points = "g_errors",
      intervals = "g_sessions", keys = Seq("user_id"),
      pointTs = "ts_us", startCol = "start_us", endCol = "end_us",
      pointId = Some("event_id"))
    spark.sql("SELECT user_id, event_id, ts_us, session_id, start_us, end_us FROM g_err_sess")
  }

  // ---------------------------------------------------------------- q124
  /** SQL-surface grouped heavy hitters ([[graft.GraftSql.heavyHitters]]):
    * q116's per-source boilerplate tokens through the view verb (grouped
    * form — `groupCols` routes to [[HeavyHitters.exactPerGroup]]). */
  def q124SqlHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"source", explode(TextFunctions.tokens($"text")).as("tok"))
      .createOrReplaceTempView("g_toks")
    GraftSql.heavyHitters(spark, out = "g_hh", view = "g_toks", itemCol = "tok",
      phiPpm = 30000L, k = 1023, groupCols = Seq("source"))
    spark.sql("SELECT source, item AS tok, cnt, ppm FROM g_hh")
  }

  // ---------------------------------------------------------------- q125
  /** The NAIVE point-in-interval SQL — equi-join + BETWEEN, exactly the
    * range-join trap [[IntervalJoin]]'s scaladoc warns about — optimized
    * by [[graft.plans.IntervalRewriteRule]] into the bucketized cell
    * join (plan-pinned in PlanShapeSpec). Same semantics and oracle as
    * q111: errors located in the q12 sessions, rolled up per session.
    * The rewrite conf is enabled only while this query plans. */
  def q125NaiveIntervalRewrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.IntervalRewriteRule.ensure(spark)
    EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
      .createOrReplaceTempView("g_sessions")
    ev(spark, dir)
      .filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"ts_us", cents($"value").as("v_c"))
      .createOrReplaceTempView("g_errors_v")
    spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """SELECT s.user_id, s.session_id, s.start_us, s.end_us,
          |       count(*) AS n_errors, sum(e.v_c) AS sum_err_v_c
          |FROM g_errors_v e JOIN g_sessions s
          |  ON e.e_user = s.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us
          |GROUP BY 1, 2, 3, 4""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.IntervalRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q126
  /** The NAIVE interval-overlap SQL — `a.s <= b.e AND b.s <= a.e` on the
    * user key — optimized by [[graft.plans.IntervalRewriteRule]]'s
    * overlap shape into the canonical-cell plan. The q12 sessions
    * overlapped against the same user's per-DAY activity spans
    * (min/max event time per calendar day): how many distinct days each
    * qualifying session touches, with the overlap microseconds summed —
    * a genuinely two-table overlap (no anti-reflexive predicate, which
    * the rule deliberately vetoes). */
  def q126NaiveOverlapRewrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.IntervalRewriteRule.ensure(spark)
    EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
      .createOrReplaceTempView("g_sessions")
    ev(spark, dir)
      .groupBy($"user_id".as("d_user"), expr("ts_us div 86400000000").as("day"))
      .agg(min($"ts_us").as("d_start_us"), max($"ts_us").as("d_end_us"))
      .createOrReplaceTempView("g_days")
    spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """SELECT s.user_id, s.session_id, count(*) AS n_days,
          |       sum(least(s.end_us, d.d_end_us) - greatest(s.start_us, d.d_start_us)) AS overlap_us
          |FROM g_sessions s JOIN g_days d
          |  ON s.user_id = d.d_user
          | AND s.start_us <= d.d_end_us AND d.d_start_us <= s.end_us
          |GROUP BY 1, 2""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.IntervalRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q127
  /** The OTHER naive as-of spellings through [[graft.plans.AsOfRewriteRule]]
    * in one query: LEFT OUTER + tolerance band + max_by/max argmax (q121
    * oracles the inner rank-1 shape). Same semantics as q118 — every
    * purchase kept, the latest prior click nulled past 24 h — so it
    * shares q118's ASOF LEFT + conditional-projection oracle. `wait_us`
    * is computed OUTSIDE the aggregate: the rule matches pure argmax
    * aggregates, not composites embedding them. */
  def q127NaiveAsofLeftMaxby(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.AsOfRewriteRule.ensure(spark)
    val e = ev(spark, dir)
    e.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts_us".as("click_us"))
      .agg(max($"event_id").as("click_id"))
      .select($"user_id".as("cuser"), $"click_us", $"click_id")
      .createOrReplaceTempView("g_clicks_sql")
    e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
      .createOrReplaceTempView("g_purch_sql")
    spark.conf.set(graft.plans.AsOfRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """SELECT user_id, purchase_id, purchase_us, click_id, click_us,
          |       purchase_us - click_us AS wait_us
          |FROM (
          |  SELECT p.user_id, p.purchase_id, p.purchase_us,
          |         max_by(c.click_id, c.click_us) AS click_id,
          |         max(c.click_us) AS click_us
          |  FROM g_purch_sql p LEFT JOIN g_clicks_sql c
          |    ON p.user_id = c.cuser
          |   AND c.click_us <= p.purchase_us
          |   AND c.click_us >= p.purchase_us - 86400000000
          |  GROUP BY 1, 2, 3)""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.AsOfRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q128
  /** q127's naive LEFT + band + max_by as-of spelled BACKWARDS — `clicks
    * RIGHT JOIN purchases`, the preserved side on the right — which
    * [[graft.plans.AsOfRewriteRule]] normalizes to the probe-preserved
    * orientation before matching instead of rejecting (round 11).
    * Identical semantics to q118/q127, so it shares their independent
    * DuckDB `ASOF LEFT JOIN` oracle. */
  def q128NaiveAsofRight(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.AsOfRewriteRule.ensure(spark)
    val e = ev(spark, dir)
    e.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts_us".as("click_us"))
      .agg(max($"event_id").as("click_id"))
      .select($"user_id".as("cuser"), $"click_us", $"click_id")
      .createOrReplaceTempView("g_clicks_sql")
    e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
      .createOrReplaceTempView("g_purch_sql")
    spark.conf.set(graft.plans.AsOfRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """SELECT user_id, purchase_id, purchase_us, click_id, click_us,
          |       purchase_us - click_us AS wait_us
          |FROM (
          |  SELECT p.user_id, p.purchase_id, p.purchase_us,
          |         max_by(c.click_id, c.click_us) AS click_id,
          |         max(c.click_us) AS click_us
          |  FROM g_clicks_sql c RIGHT JOIN g_purch_sql p
          |    ON p.user_id = c.cuser
          |   AND c.click_us <= p.purchase_us
          |   AND c.click_us >= p.purchase_us - 86400000000
          |  GROUP BY 1, 2, 3)""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.AsOfRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q129
  /** q122's forward-strict as-of with the ENTIRE query text in SQL — the
    * [[graft.GraftTableFunctions]] `graft_asof_join` table-valued
    * function (round 11): no Scala verb call anywhere in the query path,
    * `ensure` only registers the function. Same semantics as q122, so it
    * shares q122's independent DuckDB ASOF oracle. */
  def q129SqlTfAsof(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftTableFunctions.ensure(spark)
    ev(spark, dir).createOrReplaceTempView("g_events")
    spark.sql(
      """SELECT user_id, ts_us AS click_us, max(event_id) AS click_id
        |FROM g_events WHERE event_type = 'click' GROUP BY 1, 2""".stripMargin)
      .createOrReplaceTempView("g_clicks_tf")
    spark.sql(
      """SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us
        |FROM g_events WHERE event_type = 'purchase'""".stripMargin)
      .createOrReplaceTempView("g_purch_tf")
    spark.sql(
      """SELECT user_id, purchase_id, purchase_us, click_id, click_us,
        |       click_us - purchase_us AS react_us
        |FROM graft_asof_join('g_purch_tf', 'g_clicks_tf', 'user_id',
        |                     'purchase_us', 'click_us', 'forward', true)""".stripMargin)
  }

  // ---------------------------------------------------------------- q130
  /** q124's per-source heavy hitters with the query text all-SQL through
    * the `graft_heavy_hitters` table function — same semantics, same
    * independent oracle. */
  def q130SqlTfHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.GraftTableFunctions.ensure(spark)
    Tables(spark, dir).documents
      .select($"source", explode(TextFunctions.tokens($"text")).as("tok"))
      .createOrReplaceTempView("g_toks_tf")
    spark.sql(
      """SELECT source, item AS tok, cnt, ppm
        |FROM graft_heavy_hitters('g_toks_tf', 'tok', 30000, 1023, 'source')""".stripMargin)
  }

  // ---------------------------------------------------------------- q131
  /** The NAIVE LEFT OUTER point-in-interval SQL — `points LEFT JOIN
    * intervals ON key AND ts BETWEEN s AND e` — rewritten by
    * [[graft.plans.IntervalRewriteRule]]'s round-11 outer path into
    * [[graft.operators.IntervalJoin.pointInIntervalLeft]]: the point
    * side is an Aggregate grouped on `event_id` alone, which is the
    * structural uniqueness proof the rule requires. Same semantics as
    * q119 (each event id is already unique in `events`, so the max()
    * passthroughs are identities), so it shares q119's independent
    * LEFT-BETWEEN oracle. */
  def q131NaiveIntervalLeft(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.IntervalRewriteRule.ensure(spark)
    EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
      .createOrReplaceTempView("g_sessions")
    ev(spark, dir)
      .filter($"event_type" === "error")
      .select($"event_id", $"user_id".as("e_user"), $"ts_us")
      .createOrReplaceTempView("g_errors_raw")
    spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """WITH e AS (
          |  SELECT event_id, max(e_user) AS e_user, max(ts_us) AS ts_us
          |  FROM g_errors_raw GROUP BY event_id)
          |SELECT e.e_user AS user_id, e.event_id, e.ts_us,
          |       s.session_id, s.start_us, s.end_us
          |FROM e LEFT JOIN g_sessions s
          |  ON e.e_user = s.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.IntervalRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q132
  /** q123's left point-in-interval with the ENTIRE query text in SQL —
    * the `graft_point_in_interval` table function with `point_id` set
    * routes to [[graft.operators.IntervalJoin.pointInIntervalLeft]] and
    * derives the bucket width itself (8th arg omitted). Same semantics
    * as q119/q123, so it shares their independent LEFT-BETWEEN oracle. */
  def q132SqlTfInterval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.GraftTableFunctions.ensure(spark)
    EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
      .createOrReplaceTempView("g_sessions_tf")
    ev(spark, dir).createOrReplaceTempView("g_events")
    spark.sql("SELECT user_id, event_id, ts_us FROM g_events WHERE event_type = 'error'")
      .createOrReplaceTempView("g_errors_tf")
    spark.sql(
      """SELECT user_id, event_id, ts_us, session_id, start_us, end_us
        |FROM graft_point_in_interval('g_errors_tf', 'g_sessions_tf', 'user_id',
        |                             'ts_us', 'start_us', 'end_us', 'event_id')""".stripMargin)
  }

  // ---------------------------------------------------------------- q133
  /** q113's per-customer order-span overlap with the operator call in
    * pure SQL — the `graft_overlap_join` table function (width derived
    * from the union of both sides' spans), the anti-reflexive `a_ok <
    * b_ok` applied on the OUTPUT as the verb scaladoc prescribes. This
    * is also the overlapJoin VERB core's first driver oracle (q126
    * covers the rewrite path, not the verb). Shares q113's oracle. */
  def q133SqlTfOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.GraftTableFunctions.ensure(spark)
    val t = Tables(spark, dir)
    val o = t.orders
    val l = t.lineitem
    val spans = o.withColumn("o_us", Tables.tsToMicros(o, "o_orderdate"))
      .join(l.withColumn("ship_us", Tables.tsToMicros(l, "l_shipdate")), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey".as("cust"), $"o_orderkey".as("ok"), $"o_us".as("s"))
      .agg(max($"ship_us").as("max_ship_us"))
      .withColumn("e", greatest($"max_ship_us", $"s")).drop("max_ship_us")
      .stageCheckpoint()
    spans.select($"cust", $"ok".as("a_ok"), $"s".as("a_s"), $"e".as("a_e"))
      .createOrReplaceTempView("g_span_a")
    spans.select($"cust", $"ok".as("b_ok"), $"s".as("b_s"), $"e".as("b_e"))
      .createOrReplaceTempView("g_span_b")
    spark.sql(
      """SELECT cust, a_ok, b_ok,
        |       least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
        |FROM graft_overlap_join('g_span_a', 'g_span_b', 'cust',
        |                        'a_s', 'a_e', 'b_s', 'b_e')
        |WHERE a_ok < b_ok""".stripMargin)
  }

  // ---------------------------------------------------------------- q136
  /** q131's naive LEFT BETWEEN spelling widened with a STRICT lower
    * bound and a RESIDUAL conjunct ("error strictly inside the session,
    * in its second half") — the round-11 extension of the outer interval
    * rewrite: both route to the operator's `innerFilter`, applied to
    * matched candidates BEFORE the unmatched set is computed
    * (join-condition semantics — a post-filter would drop the naive
    * plan's null-extended rows). Oracle is the same LEFT JOIN in DuckDB
    * with the identical extra conjuncts. */
  def q136NaiveIntervalLeftResidual(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.IntervalRewriteRule.ensure(spark)
    EventQueries.q12Sessions(spark, dir)
      .select($"user_id", $"session_id", $"start_us", $"end_us")
      .createOrReplaceTempView("g_sessions")
    ev(spark, dir)
      .filter($"event_type" === "error")
      .select($"event_id", $"user_id".as("e_user"), $"ts_us")
      .createOrReplaceTempView("g_errors_raw")
    spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """WITH e AS (
          |  SELECT event_id, max(e_user) AS e_user, max(ts_us) AS ts_us
          |  FROM g_errors_raw GROUP BY event_id)
          |SELECT e.e_user AS user_id, e.event_id, e.ts_us,
          |       s.session_id, s.start_us, s.end_us
          |FROM e LEFT JOIN g_sessions s
          |  ON e.e_user = s.user_id
          | AND e.ts_us > s.start_us AND e.ts_us <= s.end_us
          | AND (e.ts_us - s.start_us) * 2 >= (s.end_us - s.start_us)""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.IntervalRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q139
  /** The INTERVAL-PRESERVED naive outer spelling — `sessions LEFT JOIN
    * errors ON key AND ts BETWEEN s AND e` — the round-12 extension of
    * the outer interval rewrite, routed to
    * [[graft.operators.IntervalJoin.pointInIntervalRight]]: the interval
    * side is an Aggregate grouped on the synthetic `sid` alone (the
    * structural uniqueness proof), sessions covering no error
    * null-extend the point columns. Oracle is the identical LEFT JOIN in
    * DuckDB over its own session derivation. */
  def q139NaiveIntervalIvLeft(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.IntervalRewriteRule.ensure(spark)
    EventQueries.q12Sessions(spark, dir)
      .select(($"user_id" * 1000000L + $"session_id").as("sid"),
        $"user_id", $"start_us", $"end_us")
      .createOrReplaceTempView("g_sessions_iv")
    ev(spark, dir)
      .filter($"event_type" === "error")
      .select($"event_id", $"user_id".as("e_user"), $"ts_us")
      .createOrReplaceTempView("g_errors_iv")
    spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "true")
    try {
      val df = spark.sql(
        """WITH s AS (
          |  SELECT sid, max(user_id) AS s_user, max(start_us) AS start_us,
          |         max(end_us) AS end_us
          |  FROM g_sessions_iv GROUP BY sid)
          |SELECT s.sid, s.s_user AS user_id, s.start_us, s.end_us,
          |       e.event_id, e.ts_us
          |FROM s LEFT JOIN g_errors_iv e
          |  ON s.s_user = e.e_user AND e.ts_us BETWEEN s.start_us AND s.end_us""".stripMargin)
      df.queryExecution.executedPlan // plan NOW, while the rule is on
      df
    } finally spark.conf.unset(graft.plans.IntervalRewriteRule.ConfKey)
  }

  // ---------------------------------------------------------------- q140
  /** Gap-break sessionization with the query text all-SQL through the
    * `graft_sessionize` table function — q12's semantics (30-min gap,
    * `event_id` tiebreak, sessions under 3 events dropped) reached with
    * no Scala in the query path; the oracle is the independent DuckDB
    * gaps-and-islands derivation. */
  def q140SqlTfSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.GraftTableFunctions.ensure(spark)
    ev(spark, dir).createOrReplaceTempView("g_events_sess")
    spark.sql(
      """SELECT user_id, session_id, n_events, session_start, session_end
        |FROM graft_sessionize('g_events_sess', 'user_id', 'ts_us',
        |                      1800000000, 'event_id', 3)""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_sql_tf_sessionize" -> q140SqlTfSessionize _,
    "q139_naive_interval_iv_left" -> q139NaiveIntervalIvLeft _,
    "q136_naive_interval_left_residual" -> q136NaiveIntervalLeftResidual _,
    "q133_sql_tf_overlap"         -> q133SqlTfOverlap _,
    "q132_sql_tf_interval"        -> q132SqlTfInterval _,
    "q131_naive_interval_left"    -> q131NaiveIntervalLeft _,
    "q130_sql_tf_heavy_hitters"   -> q130SqlTfHeavyHitters _,
    "q129_sql_tf_asof"            -> q129SqlTfAsof _,
    "q128_naive_asof_right"       -> q128NaiveAsofRight _,
    "q127_naive_asof_left_maxby"  -> q127NaiveAsofLeftMaxby _,
    "q126_naive_overlap_rewrite"  -> q126NaiveOverlapRewrite _,
    "q125_naive_interval_rewrite" -> q125NaiveIntervalRewrite _,
    "q122_sql_asof"           -> q122SqlAsof _,
    "q123_sql_interval"       -> q123SqlInterval _,
    "q124_sql_heavy_hitters"  -> q124SqlHeavyHitters _,
    "q121_naive_asof_rewrite" -> q121NaiveAsofRewrite _,
    "q119_interval_left"    -> q119IntervalLeft _,
    "q120_chunked_tolerance" -> q120ChunkedTolerance _,
    "q118_asof_tolerance"       -> q118AsOfTolerance _,
    "q117_next_order"           -> q117NextOrder _,
    "q116_source_heavy_hitters" -> q116SourceHeavyHitters _,
    "q110_asof_join"     -> q110AsOfJoin _,
    "q111_interval_join" -> q111IntervalJoin _,
    "q112_heavy_hitters" -> q112HeavyHitters _,
    "q113_overlap_join"  -> q113OverlapJoin _,
    "q114_ngram_novelty" -> q114NgramNovelty _,
    "q115_prev_order"    -> q115PrevOrder _
  )

  private val toksSql =
    """list_filter(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+'), t -> t <> '')"""

  val oracleSql: Map[String, String] = Map(
    // q140 routes q12's gap sessionization through the pure-SQL table
    // function; the oracle is the independent gaps-and-islands SQL
    "q140_sql_tf_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts_us) AS session_start, max(ts_us) AS session_end
        |FROM s GROUP BY user_id, session_id HAVING count(*) >= 3""".stripMargin,
    // q139 is the interval-preserved naive outer: sessions (grouped to a
    // unique sid) LEFT JOIN errors — the identical LEFT JOIN in DuckDB
    "q139_naive_interval_iv_left" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id * 1000000 + CAST(session_id AS BIGINT) AS sid,
        |    user_id, min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error')
        |SELECT se.sid, se.user_id, se.start_us, se.end_us,
        |  e.event_id, e.ts_us
        |FROM sess se LEFT JOIN err e
        |  ON se.user_id = e.user_id AND e.ts_us BETWEEN se.start_us AND se.end_us""".stripMargin,
    // q136 is q131's LEFT BETWEEN with a strict lower bound + residual —
    // the identical LEFT JOIN in DuckDB is the oracle
    "q136_naive_interval_left_residual" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, e.ts_us,
        |  s.session_id, s.start_us, s.end_us
        |FROM err e LEFT JOIN sess s
        |  ON s.user_id = e.user_id
        | AND e.ts_us > s.start_us AND e.ts_us <= s.end_us
        | AND (e.ts_us - s.start_us) * 2 >= (s.end_us - s.start_us)""".stripMargin,
    // q132 routes q123's left point-in-interval through the pure-SQL
    // table function, so it shares the q119/q123 LEFT-BETWEEN oracle
    "q132_sql_tf_interval" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, e.ts_us,
        |  s.session_id, s.start_us, s.end_us
        |FROM err e LEFT JOIN sess s
        |  ON s.user_id = e.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us""".stripMargin,
    // q133 routes q113's overlap join through the pure-SQL table
    // function, so it shares q113's independent inequality-join oracle
    "q133_sql_tf_overlap" ->
      """WITH span AS (
        |  SELECT o_custkey AS cust, o_orderkey AS ok,
        |    epoch_us(o_orderdate) AS s,
        |    greatest(epoch_us(max(l_shipdate)), epoch_us(o_orderdate)) AS e
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2, epoch_us(o_orderdate))
        |SELECT a.cust, a.ok AS a_ok, b.ok AS b_ok,
        |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
        |FROM span a JOIN span b
        |  ON a.cust = b.cust AND a.ok < b.ok AND a.s <= b.e AND b.s <= a.e""".stripMargin,
    // q131 computes q119's result through the naive LEFT BETWEEN SQL +
    // the outer interval rewrite, so it shares q119's independent oracle
    "q131_naive_interval_left" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, e.ts_us,
        |  s.session_id, s.start_us, s.end_us
        |FROM err e LEFT JOIN sess s
        |  ON s.user_id = e.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us""".stripMargin,
    // q129/q130 route q122's / q124's semantics through the pure-SQL
    // table functions, so they share those queries' independent oracles
    "q129_sql_tf_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us,
        |  c.click_us - p.purchase_us AS react_us
        |FROM purch p ASOF JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us < c.click_us""".stripMargin,
    "q130_sql_tf_heavy_hitters" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |tot AS (SELECT source, count(*) AS n FROM toks GROUP BY 1)
         |SELECT t.source, t.tok, count(*) AS cnt,
         |  CAST(count(*) * 1000000 // any_value(tt.n) AS BIGINT) AS ppm
         |FROM toks t JOIN tot tt USING (source)
         |GROUP BY 1, 2
         |HAVING count(*) * 1000000 > any_value(tt.n) * 30000""".stripMargin,
    // q128 is q127's query with the join spelled RIGHT OUTER (preserved
    // side on the right) — same semantics, same q118-family oracle
    "q128_naive_asof_right" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_us,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000 THEN c.click_id END AS click_id,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000 THEN c.click_us END AS click_us,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000
        |       THEN p.purchase_us - c.click_us END AS wait_us
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us""".stripMargin,
    // q127 computes q118's result through the naive LEFT + band + max_by
    // SQL and the as-of rewrite, so it shares q118's independent oracle
    "q127_naive_asof_left_maxby" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_us,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000 THEN c.click_id END AS click_id,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000 THEN c.click_us END AS click_us,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000
        |       THEN p.purchase_us - c.click_us END AS wait_us
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us""".stripMargin,
    "q126_naive_overlap_rewrite" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |days AS (
        |  SELECT user_id AS d_user, epoch_us(ts) // 86400000000 AS day,
        |    min(epoch_us(ts)) AS d_start_us, max(epoch_us(ts)) AS d_end_us
        |  FROM events GROUP BY 1, 2)
        |SELECT s.user_id, s.session_id, count(*) AS n_days,
        |  CAST(sum(least(s.end_us, d.d_end_us) - greatest(s.start_us, d.d_start_us)) AS BIGINT) AS overlap_us
        |FROM sess s JOIN days d
        |  ON s.user_id = d.d_user
        | AND s.start_us <= d.d_end_us AND d.d_start_us <= s.end_us
        |GROUP BY 1, 2""".stripMargin,
    // q125 computes q111's result through the naive BETWEEN SQL + the
    // interval rewrite rule, so it shares q111's inequality-join oracle
    "q125_naive_interval_rewrite" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS v_c
        |  FROM events WHERE event_type = 'error')
        |SELECT s.user_id, s.session_id, s.start_us, s.end_us,
        |  count(*) AS n_errors, CAST(sum(e.v_c) AS BIGINT) AS sum_err_v_c
        |FROM sess s JOIN err e
        |  ON e.user_id = s.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    "q122_sql_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us,
        |  c.click_us - p.purchase_us AS react_us
        |FROM purch p ASOF JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us < c.click_us""".stripMargin,
    // q123/q124 route q119's / q116's semantics through the GraftSql view
    // verbs, so they share those queries' independent oracles
    "q123_sql_interval" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, e.ts_us,
        |  s.session_id, s.start_us, s.end_us
        |FROM err e LEFT JOIN sess s
        |  ON s.user_id = e.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us""".stripMargin,
    "q124_sql_heavy_hitters" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |tot AS (SELECT source, count(*) AS n FROM toks GROUP BY 1)
         |SELECT t.source, t.tok, count(*) AS cnt,
         |  CAST(count(*) * 1000000 // any_value(tt.n) AS BIGINT) AS ppm
         |FROM toks t JOIN tot tt USING (source)
         |GROUP BY 1, 2
         |HAVING count(*) * 1000000 > any_value(tt.n) * 30000""".stripMargin,
    "q119_interval_left" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, e.ts_us,
        |  s.session_id, s.start_us, s.end_us
        |FROM err e LEFT JOIN sess s
        |  ON s.user_id = e.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us""".stripMargin,
    "q120_chunked_tolerance" ->
      """WITH o AS (SELECT o_custkey AS cust, o_orderkey AS ok,
        |  epoch_us(o_orderdate) AS o_us FROM orders),
        |d AS (SELECT cust, o_us AS prev_us, max(ok) AS prev_ok,
        |  count(*) AS n_prev_day FROM o GROUP BY 1, 2)
        |SELECT l.cust, l.ok, l.o_us,
        |  CASE WHEN l.o_us - d.prev_us <= 2592000000000 THEN d.prev_us END AS prev_us,
        |  CASE WHEN l.o_us - d.prev_us <= 2592000000000 THEN d.prev_ok END AS prev_ok,
        |  CASE WHEN l.o_us - d.prev_us <= 2592000000000 THEN d.n_prev_day END AS n_prev_day,
        |  CASE WHEN l.o_us - d.prev_us <= 2592000000000
        |       THEN l.o_us - d.prev_us END AS gap_us
        |FROM o l ASOF LEFT JOIN d ON l.cust = d.cust AND l.o_us > d.prev_us""".stripMargin,
    // q121 computes q110's result through the naive SQL + rewrite rule, so
    // it shares q110's independent DuckDB ASOF JOIN oracle
    "q121_naive_asof_rewrite" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us,
        |  p.purchase_us - c.click_us AS wait_us
        |FROM purch p ASOF JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us""".stripMargin,
    "q110_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us,
        |  p.purchase_us - c.click_us AS wait_us
        |FROM purch p ASOF JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us""".stripMargin,
    "q111_interval_join" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM t),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_id HAVING count(*) >= 3),
        |err AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS v_c
        |  FROM events WHERE event_type = 'error')
        |SELECT s.user_id, s.session_id, s.start_us, s.end_us,
        |  count(*) AS n_errors, CAST(sum(e.v_c) AS BIGINT) AS sum_err_v_c
        |FROM sess s JOIN err e
        |  ON e.user_id = s.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    "q113_overlap_join" ->
      """WITH span AS (
        |  SELECT o_custkey AS cust, o_orderkey AS ok,
        |    epoch_us(o_orderdate) AS s,
        |    greatest(epoch_us(max(l_shipdate)), epoch_us(o_orderdate)) AS e
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2, epoch_us(o_orderdate))
        |SELECT a.cust, a.ok AS a_ok, b.ok AS b_ok,
        |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
        |FROM span a JOIN span b
        |  ON a.cust = b.cust AND a.ok < b.ok AND a.s <= b.e AND b.s <= a.e""".stripMargin,
    "q118_asof_tolerance" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_us,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000 THEN c.click_id END AS click_id,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000 THEN c.click_us END AS click_us,
        |  CASE WHEN p.purchase_us - c.click_us <= 86400000000
        |       THEN p.purchase_us - c.click_us END AS wait_us
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us""".stripMargin,
    "q117_next_order" ->
      """WITH o AS (SELECT o_custkey AS cust, o_orderkey AS ok,
        |  epoch_us(o_orderdate) AS o_us FROM orders),
        |d AS (SELECT cust, o_us AS next_us, max(ok) AS next_ok,
        |  count(*) AS n_next_day FROM o GROUP BY 1, 2)
        |SELECT l.cust, l.ok, l.o_us, d.next_us, d.next_ok, d.n_next_day,
        |  d.next_us - l.o_us AS gap_us
        |FROM o l ASOF JOIN d ON l.cust = d.cust AND l.o_us < d.next_us""".stripMargin,
    "q116_source_heavy_hitters" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |tot AS (SELECT source, count(*) AS n FROM toks GROUP BY 1)
         |SELECT t.source, t.tok, count(*) AS cnt,
         |  CAST(count(*) * 1000000 // any_value(tt.n) AS BIGINT) AS ppm
         |FROM toks t JOIN tot tt USING (source)
         |GROUP BY 1, 2
         |HAVING count(*) * 1000000 > any_value(tt.n) * 30000""".stripMargin,
    "q115_prev_order" ->
      """WITH o AS (SELECT o_custkey AS cust, o_orderkey AS ok,
        |  epoch_us(o_orderdate) AS o_us FROM orders),
        |d AS (SELECT cust, o_us AS prev_us, max(ok) AS prev_ok,
        |  count(*) AS n_prev_day FROM o GROUP BY 1, 2)
        |SELECT l.cust, l.ok, l.o_us, d.prev_us, d.prev_ok, d.n_prev_day,
        |  l.o_us - d.prev_us AS gap_us
        |FROM o l ASOF JOIN d ON l.cust = d.cust AND l.o_us > d.prev_us""".stripMargin,
    "q114_ngram_novelty" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id,
         |  unnest(list_distinct(list_transform(
         |    generate_series(1, greatest(len(t)-2, 0)),
         |    i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS shingle FROM tok),
         |f AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
         |SELECT s.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) * 1000000
         |       // count(*) AS BIGINT) AS novelty_ppm
         |FROM sh s JOIN f USING (shingle) GROUP BY 1""".stripMargin,
    "q112_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
         |tot AS (SELECT count(*) AS n FROM toks)
         |SELECT tok, count(*) AS cnt,
         |  CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT) AS ppm
         |FROM toks GROUP BY tok
         |HAVING count(*) * 1000000 > (SELECT n FROM tot) * 2000""".stripMargin
  )
}
