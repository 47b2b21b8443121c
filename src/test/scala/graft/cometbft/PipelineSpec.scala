package graft.cometbft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: fixture logs → ingest → normalize → all 9 analytics.
  * The acceptance scenario mirrors the reference's example-logs: node0 is
  * configured slow (10x step latencies) and the consensus_timing output
  * must expose it. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val warehouse: String = {
    val logDir = java.nio.file.Files.createTempDirectory("graft-logs").toString
    val wh     = java.nio.file.Files.createTempDirectory("graft-wh").toString
    Fixtures.writeScenario(logDir, heights = 5)
    Pipeline.run(spark, logDir, wh)
    wh
  }

  private def t(name: String) = spark.read.parquet(s"$warehouse/$name")

  test("Pipeline.run returns the written row counts (observe-counted sinks)") {
    // fresh small run so the returned map is in hand; every count must
    // equal the actual stored table - the counts ride the WRITE jobs via
    // observe(), and a silently-unpopulated metric would read as zero
    val logDir = java.nio.file.Files.createTempDirectory("graft-cnt-logs").toString
    val wh     = java.nio.file.Files.createTempDirectory("graft-cnt-wh").toString
    Fixtures.writeScenario(logDir, heights = 2)
    val counts = Pipeline.run(spark, logDir, wh)
    assert(counts("events") > 0L, "events count must be populated, not zero")
    counts.foreach { case (tbl, n) =>
      val stored = spark.read.parquet(s"$wh/$tbl").count()
      assert(n == stored, s"$tbl: returned $n, stored $stored")
    }
  }

  test("events are produced for every family") {
    val byType = t("events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet.contains("entering_new_round"))
    assert(byType.keySet.contains("entering_prevote_step"))
    assert(byType.keySet.contains("propose_step"))
    assert(byType.keySet.contains("send_vote"))
    assert(byType.keySet.contains("receive_packet_vote"))
    assert(byType.keySet.contains("receive_packet_block_part"))
    assert(byType.keySet.contains("send_proposal"))
    assert(byType.keySet.contains("committed_block"))
    assert(byType.keySet.contains("scheduled_timeout"))
    assert(byType.keySet.contains("received_proposal"))
    // 4 nodes x 5 heights
    assert(byType("entering_new_round") == 20L)
    assert(byType("committed_block") == 20L)
    // each node sends prevote+precommit to 3 peers per height
    assert(byType("send_vote") == 4L * 5 * 6)
  }

  test("non-consensus channel traffic decodes but never surfaces as events") {
    // the fixture gossips mempool/blocksync/pex/statesync/evidence lines
    // every proposer turn; the reference decodes the first four then
    // rejects all of them at channel-validity (convereter.go:46-58)
    val types = t("events").select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    val leaked = types.filter(t => t.contains("mempool") || t.contains("blocksync") ||
      t.contains("pex") || t.contains("statesync") || t.contains("evidence"))
    assert(leaked.isEmpty, s"non-consensus events leaked: $leaked")
  }

  test("metadata attach: every event carries node_id and validator_address") {
    assert(t("events").filter(col("node_id").isNull || col("validator_address").isNull).count() == 0L)
  }

  test("vote latency pairing produces confirmed pairs with positive latency") {
    val vl = t("vote_latencies")
    assert(vl.count() > 0)
    assert(vl.filter(col("latency_ms") < 0).count() == 0L)
  }

  test("p2p message confirmation covers votes") {
    val p2p = t("p2p_messages")
    assert(p2p.filter(col("msg_family") === "vote").count() > 0)
  }

  test("consensus timing exposes the slow node (acceptance scenario)") {
    val avgByNode = t("consensus_timing")
      .groupBy("node_id").agg(avg(col("total_round_time_ms")).as("avg_ms"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val slow   = avgByNode.keys.find(_.startsWith("aaaa")).get
    val others = avgByNode.filter(!_._1.startsWith("aaaa")).values
    assert(avgByNode(slow) > others.max * 3,
      s"slow node not detected: $avgByNode")
  }

  test("consensus timing has step durations in canonical order") {
    val row = t("consensus_timing").filter(col("height") === 2L).limit(1).collect().head
    val durs = row.getMap[String, Long](row.fieldIndex("step_durations_ms"))
    assert(durs.nonEmpty)
    assert(durs.keys.exists(_.contains("_to_")))
  }

  test("timeout analysis: node0 has timeouts every height and clusters") {
    val ta = t("timeout_analysis")
    val node0 = ta.filter(col("node_id").startsWith("aaaa")).collect().head
    assert(node0.getLong(node0.fieldIndex("total_timeouts")) == 5L)
    assert(t("timeout_clusters").count() >= 1)
  }

  test("network latency: measurements and five tables exist") {
    assert(t("network_latency_measurements").count() > 0)
    assert(t("network_latency_node_stats").count() == 4L)
    assert(t("network_latency_global_stats").count() == 1L)
    val hist = t("network_latency_nodepair_summary")
    assert(hist.filter(col("msg_type") === "overall").count() > 0)
  }

  test("validator participation: all four validators participate") {
    val vp = t("validator_participation")
    assert(vp.select(countDistinct(col("validator_address"))).collect().head.getLong(0) == 4L)
    assert(vp.filter(col("participated_prevote") && col("participated_precommit")).count() > 0)
  }

  test("tracer events: union of consensus + p2p, time-ordered") {
    val te = t("tracer_events")
    assert(te.filter(col("stream") === "consensus").count() > 0)
    assert(te.filter(col("stream") === "p2p").count() > 0)
  }

  test("block parser results flow into committed_block events") {
    val cb = t("events").filter(col("event_type") === "committed_block")
      .select(col("block.chainId"), col("block.txsHex"))
    assert(cb.filter(col("chainId") === "graft-test").count() == 20L)
  }

  test("analytics selection by name mirrors the reference plugin list") {
    assert(graft.cometbft.Analytics.byNames(Nil).size == 9)
    assert(graft.cometbft.Analytics.byNames(Seq("vote_latency", "tracer_events")).map(_.name) ==
      Seq("vote_latency", "tracer_events"))
    intercept[IllegalArgumentException] {
      graft.cometbft.Analytics.byNames(Seq("nope"))
    }
  }

  test("P7 fail-fast: a file without metadata lines fails with its name (app.go:97-99)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nometa").toString
    // valid consensus line, but neither "P2P Node ID" nor validator line
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/orphan_cometbft.log"),
      """{"_msg":"Entering prevote step","ts":"2025-06-08T01:00:00.000000001Z","current":"3/0/RoundStepPropose","height":3,"round":0}"""
        .getBytes("UTF-8"))
    val ex = intercept[Throwable] {
      graft.cometbft.LogIngest.read(spark, dir).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("node ID or validator address not found") && m.contains("orphan_cometbft")),
      s"unexpected failure: $ex")
  }

  test("P7 fail-fast: a ZERO-line .log file fails with its name (app.go:97-99)") {
    // an empty file yields no text-source rows, so the metadata aggregate
    // alone cannot see it — the driver-side listing check must catch it
    val dir = java.nio.file.Files.createTempDirectory("graft-zeroline").toString
    val meta = graft.cometbft.Fixtures.nodeLog(1, 1) // one fully valid file
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/good_cometbft.log"),
      meta.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/empty_cometbft.log"),
      Array.empty[Byte])
    val ex = intercept[IllegalArgumentException] {
      graft.cometbft.LogIngest.read(spark, dir).count()
    }
    assert(ex.getMessage.contains("node ID or validator address not found") &&
      ex.getMessage.contains("empty_cometbft"), s"unexpected failure: $ex")
  }

  test("S5 first-match inference: wait-step lines collapse into prevote/precommit (parsers.go:94-128)") {
    // The reference scans [propose, prevote, prevote_wait, precommit,
    // precommit_wait, commit] and breaks on the first substring hit, so
    // "entering prevote wait step" => targetStep "prevote" and
    // "entering precommit wait step" => "precommit"; the wait cases in
    // ConvertToSpecificStepEvent (convereter.go:179-190) are dead code.
    val dir = java.nio.file.Files.createTempDirectory("graft-wait").toString
    val meta = graft.cometbft.Fixtures.nodeLog(1, 1).take(2) // node-id + validator lines
    val lines = meta ++ Seq(
      """{"_msg":"Entering prevote wait step","ts":"2025-06-08T01:00:00.000000001Z","current":"7/0/RoundStepPrevote","height":7,"round":0}""",
      """{"_msg":"Entering precommit wait step","ts":"2025-06-08T01:00:00.000000002Z","current":"7/0/RoundStepPrecommit","height":7,"round":0}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/node1_cometbft.log"),
      lines.mkString("\n").getBytes("UTF-8"))
    val events = graft.cometbft.Normalize.normalize(
      graft.cometbft.LogIngest.read(spark, dir))
    val byType = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.get("entering_prevote_step").contains(1L), s"got $byType")
    assert(byType.get("entering_precommit_step").contains(1L), s"got $byType")
    assert(!byType.keySet.exists(_.contains("wait")), s"wait event leaked: $byType")
    // curr_step still reflects the line's own round-info, as in the reference
    val steps = events.orderBy("ts_ns").select("step").collect().map(_.getString(0))
    assert(steps.toSeq == Seq("prevote", "precommit"))
  }

  test("malformed lines drop silently like the reference dispatcher") {
    val dir = java.nio.file.Files.createTempDirectory("graft-malformed").toString
    val good = graft.cometbft.Fixtures.nodeLog(0, 1)
    val garbage = Seq(
      "not json at all {{{",
      """{"no_msg_field": 1}""",
      """{"_msg":"Totally Unknown Message","ts":"2025-06-08T01:00:00.000000001Z"}""",
      """{"_msg":"Entering prevote step with invalid args","ts":"2025-06-08T01:00:00.000000001Z","current":"9/0/RoundStepPropose","height":9,"round":0}""",
      """{"_msg":"Received bytes","ts":"2025-06-08T01:00:00.000000001Z","chID":34,"msgBytes":"AAAA////","peer":"bbbb000000000000000000000000000000000002@10.0.0.1:26656"}""")
    // interleave garbage into a copy of a valid node log
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/node0_cometbft.log"),
      (good.take(5) ++ garbage ++ good.drop(5)).mkString("\n").getBytes("UTF-8"))
    val events = graft.cometbft.Normalize.normalize(
      graft.cometbft.LogIngest.read(spark, dir))
    val withGarbage = events.count()
    // the same log without garbage yields the same event count
    val dir2 = java.nio.file.Files.createTempDirectory("graft-clean").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir2/node0_cometbft.log"),
      good.mkString("\n").getBytes("UTF-8"))
    val clean = graft.cometbft.Normalize.normalize(
      graft.cometbft.LogIngest.read(spark, dir2)).count()
    assert(withGarbage == clean, "garbage lines must drop silently without affecting valid events")
  }

  // Negative test of the sink-count mechanism: each sink's row count rides
  // the write job via observe() + a QueryExecutionListener; if the metric
  // never reaches the listener map (broken observe plumbing, unregistered
  // listener, desynced name) the pipeline must throw — not report 0 rows.
  test("a sink-count metric that never arrives fails loudly, never reads as 0 rows") {
    val captured = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val ex = intercept[IllegalStateException] {
      graft.cometbft.Pipeline.awaitObservedMetric(captured, "graft_rows_never",
        timeoutNs = 100L * 1000 * 1000)
    }
    assert(ex.getMessage.contains("graft_rows_never"))
    // and the happy path reads the delivered value, mapping a NULL count
    // (zero-row sink) to 0 explicitly rather than by accident
    import spark.implicits._
    val row = Seq(Tuple1(42L)).toDF("rows").collect()(0)
    captured.put("graft_rows_events", row)
    assert(graft.cometbft.Pipeline.awaitObservedMetric(captured, "graft_rows_events") == 42L)
  }
}
