package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.{ExactPercentiles, PairingJoin, Sessionize}

/** The reference's signature operators (SURVEY.md §2.5/§2.6) re-expressed
  * over the driver's `events` stream table, each with a DuckDB oracle.
  *
  * Timestamps are handled as exact integer microseconds (`unix_micros` /
  * `epoch_us`) so latency arithmetic is integral and hash-stable across
  * engines (the reference keeps nanosecond `time.Time`; parquet ns is
  * truncated to µs identically by both readers).
  */
object EventQueries {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Events with an exact integer-µs event-time column, tolerant of the
    * three type flavors the driver's events.parquet has resolved as
    * (LongType ns / TIMESTAMP / TIMESTAMP_NTZ) — see [[Tables.tsToMicros]]. */
  private def ev(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables(spark, dir).events
    raw.withColumn("ts_us", Tables.tsToMicros(raw, "ts"))
  }

  // ---------------------------------------------------------------- q11
  /** FIFO stream pairing (J4, `network-latency/processor.go:278-285`):
    * the n-th click by a user pairs with their n-th purchase. */
  def q11FifoPairing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val sends = e.filter($"event_type" === "click")
      .select($"user_id", $"ts_us".as("send_us"), $"event_id".as("send_id"))
    val recvs = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us".as("recv_us"), $"event_id".as("recv_id"))
    PairingJoin
      .fifo(sends, recvs, Seq("user_id"), Seq("send_us", "send_id"), Seq("recv_us", "recv_id"))
      .select($"user_id", $"pair_seq", $"send_id", $"recv_id", ($"recv_us" - $"send_us").as("wait_us"))
  }

  // ---------------------------------------------------------------- q12
  /** Gaps-and-islands sessionization (A10, `timeout-analysis/processor.go:180-199`):
    * per-user sessions broken on >30 min inactivity, sessions with >= 3
    * events kept (the reference's cluster minimum). */
  def q12Sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gapUs  = 30L * 60 * 1000000
    val tagged = Sessionize.assign(
      ev(spark, dir),
      keys = Seq("user_id"),
      orderBy = Seq("ts_us", "event_id"),
      breakWhen = prev => $"ts_us" - prev("ts_us") > gapUs
    )
    Sessionize
      .rollup(tagged, Seq("user_id"), "ts_us", minEvents = 3L)
      .select(
        $"user_id", $"session_id", $"n_events",
        $"session_start".as("start_us"), $"session_end".as("end_us"),
        ($"session_end" - $"session_start").as("duration_us")
      )
  }

  // ---------------------------------------------------------------- q13
  /** Exact-percentile histogram (A3) with the reference's index formulas
    * over per-type event values (integer cents). */
  def q13ExactPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ExactPercentiles.histogram(
      ev(spark, dir).withColumn("v_c", cents($"value")),
      groupCols = Seq("event_type"),
      valueCol = $"v_c"
    )
  }

  // ---------------------------------------------------------------- q14
  /** Consecutive-step timing (A1, `consensus-timing/processor.go:108-130`):
    * lag-based durations between consecutive events per user, rolled up
    * by (previous type -> current type) transition. */
  def q14StepTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
    ev(spark, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("delta_us", $"ts_us" - lag($"ts_us", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(
        count(lit(1)).as("n_transitions"),
        sum($"delta_us").as("sum_delta_us"),
        min($"delta_us").as("min_delta_us"),
        max($"delta_us").as("max_delta_us")
      )
  }

  // ---------------------------------------------------------------- q15
  /** Duplicate-traffic diagnostics (A7, `network-latency/processor.go:801-818`):
    * keys observed more than once, with occurrence counts and first/last
    * seen times. */
  def q15DupKeys(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .withColumn("v_c", cents($"value"))
      .groupBy($"user_id", $"event_type", $"v_c")
      .agg(
        count(lit(1)).as("n_occurrences"),
        min($"ts_us").as("first_seen_us"),
        max($"ts_us").as("last_seen_us")
      )
      .filter($"n_occurrences" > 1)
  }

  // ---------------------------------------------------------------- q16
  /** Recovery-flag lookback (A9, `timeout-analysis/processor.go:201-208`):
    * an error is a "recovery" if >= 2 errors by the same user occurred in
    * the preceding 10 minutes — a range-frame window over event time. */
  def q16RecoveryFlag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lookbackUs = 10L * 60 * 1000000
    val w = Window
      .partitionBy($"user_id")
      .orderBy($"ts_us")
      .rangeBetween(-lookbackUs, -1)
    ev(spark, dir)
      .filter($"event_type" === "error")
      .withColumn("prior_errors", count(lit(1)).over(w))
      .withColumn("is_recovery", ($"prior_errors" >= 2).cast("boolean"))
      .select($"event_id", $"user_id", $"ts_us", $"prior_errors", $"is_recovery")
  }

  // ---------------------------------------------------------------- q17
  /** Semi-structured extraction (S3/S4 — the reference's `_msg` JSON peek):
    * pull a field out of the JSON `props` column and aggregate it. */
  def q17JsonProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .withColumn("k_val", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k_val").as("sum_k"),
        countDistinct($"k_val").as("distinct_k"),
        max($"k_val").as("max_k")
      )
  }

  // ---------------------------------------------------------------- q18
  /** Last-send/first-receive pairing (J1, `vote-latency/processor.go:52-53`):
    * per user, the LAST view pairs with the FIRST purchase, confirmed only
    * when the view precedes the purchase — the reference's overwrite-on-send
    * quirk (SURVEY §7.4-3). */
  def q18LastSendFirstReceive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val sends = e.filter($"event_type" === "view")
      .select($"user_id", $"ts_us".as("send_us"), $"event_id".as("send_id"))
    val recvs = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us".as("recv_us"), $"event_id".as("recv_id"))
    PairingJoin
      .lastSendFirstReceive(sends, recvs, Seq("user_id"), "send_us", "recv_us", Seq("send_id"), Seq("recv_id"))
      .select($"user_id", $"send_id", $"recv_id", ($"recv_us" - $"send_us").as("latency_us"))
  }

  // ---------------------------------------------------------------- q19
  /** Tumbling event-time windows (the batch shape of the streaming
    * windowed aggregation, §2.9): events per (1-hour window, type). */
  def q19TumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .withColumn("ts_t", timestamp_micros($"ts_us"))
      .groupBy(window($"ts_t", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(cents($"value")).as("sum_v_c"))
      .select(unix_micros($"window.start").as("window_start_us"), $"event_type", $"n", $"sum_v_c")
  }

  // ---------------------------------------------------------------- q36
  /** Skew-salted dimension join: every event enriched with its type's
    * totals. `event_type` has only 5 values (each key = 20% of the fact
    * side — maximal skew), so the plain shuffle join would put each key
    * on one reducer; [[graft.operators.SkewJoin.salted]] spreads each key
    * over 8 salt buckets. The oracle is the UNsalted join — proving the
    * rewrite is result-identical. */
  def q36SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).select($"event_id", $"event_type", cents($"value").as("value_cents"))
    val dim = e.groupBy($"event_type")
      .agg(count(lit(1)).as("n_type"), sum($"value_cents").as("type_sum_cents"))
    graft.operators.SkewJoin.salted(e, dim, Seq("event_type"), $"event_id", buckets = 8)
      .filter($"event_id" % 37 === 0)
      .select($"event_id", $"event_type", $"n_type", $"value_cents", $"type_sum_cents")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_last_send_first_receive" -> q18LastSendFirstReceive _,
    "q19_tumbling_window"         -> q19TumblingWindow _,
    "q36_salted_join"             -> q36SaltedJoin _,
    "q11_fifo_pairing"      -> q11FifoPairing _,
    "q12_sessions"          -> q12Sessions _,
    "q13_exact_percentiles" -> q13ExactPercentiles _,
    "q14_step_transitions"  -> q14StepTransitions _,
    "q15_dup_keys"          -> q15DupKeys _,
    "q16_recovery_flag"     -> q16RecoveryFlag _,
    "q17_json_props"        -> q17JsonProps _
  )

  val oracleSql: Map[String, String] = Map(
    "q36_salted_join" ->
      """WITH e AS (SELECT event_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents FROM events),
        |d AS (SELECT event_type, count(*) AS n_type,
        |  CAST(sum(value_cents) AS BIGINT) AS type_sum_cents FROM e GROUP BY 1)
        |SELECT e.event_id, e.event_type, d.n_type, e.value_cents, d.type_sum_cents
        |FROM e JOIN d USING (event_type)
        |WHERE e.event_id % 37 = 0""".stripMargin,
    "q19_tumbling_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_v_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q18_last_send_first_receive" ->
      """WITH sends AS (
        |  SELECT user_id, epoch_us(ts) AS send_us, event_id AS send_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view'),
        |recvs AS (
        |  SELECT user_id, epoch_us(ts) AS recv_us, event_id AS recv_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id, s.send_id, r.recv_id, r.recv_us - s.send_us AS latency_us
        |FROM sends s JOIN recvs r ON s.user_id = r.user_id
        |WHERE s.rn = 1 AND r.rn = 1 AND s.send_us <= r.recv_us""".stripMargin,
    "q11_fifo_pairing" ->
      """WITH sends AS (
        |  SELECT user_id, epoch_us(ts) AS send_us, event_id AS send_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pair_seq
        |  FROM events WHERE event_type = 'click'),
        |recvs AS (
        |  SELECT user_id, epoch_us(ts) AS recv_us, event_id AS recv_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pair_seq
        |  FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id, s.pair_seq, s.send_id, r.recv_id, r.recv_us - s.send_us AS wait_us
        |FROM sends s JOIN recvs r ON s.user_id = r.user_id AND s.pair_seq = r.pair_seq""".stripMargin,
    "q12_sessions" ->
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
        |  count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY user_id, session_id HAVING count(*) >= 3""".stripMargin,
    "q13_exact_percentiles" ->
      """WITH g AS (
        |  SELECT event_type,
        |    list(v ORDER BY v) AS vals, count(*) AS cnt,
        |    CAST(sum(v) AS BIGINT) AS sum_v,
        |    min(v) AS min_v, max(v) AS max_v
        |  FROM (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v FROM events)
        |  GROUP BY event_type),
        |p AS (
        |  SELECT event_type, cnt, min_v, max_v,
        |    CAST(sum_v // cnt AS BIGINT) AS mean_v,
        |    CAST(CASE WHEN cnt % 2 = 0
        |      THEN (vals[CAST(cnt//2 AS INT)] + vals[CAST(cnt//2 + 1 AS INT)]) // 2
        |      ELSE vals[CAST(cnt//2 + 1 AS INT)] END AS BIGINT) AS median_v,
        |    vals[CAST(floor(cnt * CAST(0.95 AS DOUBLE)) AS INT) + 1] AS p95_v,
        |    vals[CAST(floor(cnt * CAST(0.99 AS DOUBLE)) AS INT) + 1] AS p99_v,
        |    vals
        |  FROM g)
        |SELECT event_type, cnt, min_v, max_v, mean_v, median_v, p95_v, p99_v,
        |  CAST(len(list_filter(vals, x -> x < median_v)) AS BIGINT) AS below_p50,
        |  CAST(len(list_filter(vals, x -> x >= median_v AND x < p95_v)) AS BIGINT) AS p50_to_p95,
        |  CAST(len(list_filter(vals, x -> x >= p95_v AND x < p99_v)) AS BIGINT) AS p95_to_p99,
        |  CAST(len(list_filter(vals, x -> x >= p99_v)) AS BIGINT) AS above_p99
        |FROM p""".stripMargin,
    "q14_step_transitions" ->
      """WITH t AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |    lag(event_type) OVER w AS prev_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT prev_type, event_type, count(*) AS n_transitions,
        |  CAST(sum(delta_us) AS BIGINT) AS sum_delta_us,
        |  min(delta_us) AS min_delta_us, max(delta_us) AS max_delta_us
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin,
    "q15_dup_keys" ->
      """SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS v_c,
        |  count(*) AS n_occurrences,
        |  min(epoch_us(ts)) AS first_seen_us,
        |  max(epoch_us(ts)) AS last_seen_us
        |FROM events
        |GROUP BY user_id, event_type, CAST(round(value*100) AS BIGINT)
        |HAVING count(*) > 1""".stripMargin,
    "q16_recovery_flag" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                 RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING) AS prior_errors,
        |  (count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                  RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING) >= 2) AS is_recovery
        |FROM events WHERE event_type = 'error'""".stripMargin,
    "q17_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin
  )
}
