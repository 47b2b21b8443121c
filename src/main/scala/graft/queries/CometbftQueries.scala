package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cometbft.{Fixtures, Pipeline}

/** CometBFT pipeline exposure for the driver's Verify harness.
  *
  * The log-ETL surface (ingest -> normalize -> 9 analytics) has no
  * DuckDB-SQL equivalent — its inputs are NDJSON logs with protobuf
  * payloads, not the sf parquet tables — so these entries are deliberately
  * oracle-less: the driver records rows-only checks, and the real
  * correctness gate is the ScalaTest suite (ParsersSpec + PipelineSpec,
  * incl. the slow-node acceptance scenario).
  */
object CometbftQueries {

  /** One fixture warehouse per JVM, built on first access, shared by all
    * entries (Verify calls each query once). */
  private val lock = new Object
  @volatile private var built: Option[String] = None

  private def builtWarehouse(spark: SparkSession): String = lock.synchronized {
    built.getOrElse {
      val logDir = java.nio.file.Files.createTempDirectory("graft-cometbft-logs").toString
      val wh     = java.nio.file.Files.createTempDirectory("graft-cometbft-wh").toString
      Fixtures.writeScenario(logDir, heights = 4)
      Pipeline.run(spark, logDir, wh)
      built = Some(wh)
      wh
    }
  }

  def q40ConsensusTiming(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${builtWarehouse(spark)}/consensus_timing")
      .select("node_id", "height", "round", "total_round_time_ms")

  def q41VoteLatencies(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${builtWarehouse(spark)}/vote_latencies")
      .select("height", "round", "val_idx", "sender", "receiver", "latency_ms")

  def q42NetworkLatency(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${builtWarehouse(spark)}/network_latency_nodepair_summary")

  /** Multimodal plumbing over the documents table (stubbed codec; the
    * Spark-side schema/partition/batch shape is the thing under test). */
  def q43MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Scalar exact-integer projection: the float features are inverted
    // back to their exact integer sources (byte sum and histogram-band
    // counts; the inversion error is far below 0.5 for any document
    // length here), so the mapPartitions feature extractor gets a full
    // DuckDB value oracle — and the output stays pandas-sortable (the raw
    // embedding array crashed the round-1 rows-only compare).
    graft.operators.Multimodal
      .extractFeatures(spark, graft.operators.Multimodal.assetsFromDocuments(docs))
      .toDF()
      .select(
        col("assetId").as("asset_id"), col("kind"),
        col("byteLen").as("byte_len"), col("contentHash").as("content_hash"),
        round(col("meanByte") * col("byteLen")).cast("long").as("sum_bytes"),
        round(element_at(col("embedding"), 2).cast("double") * col("byteLen")).cast("long").as("band1_n"),
        round(element_at(col("embedding"), 4).cast("double") * col("byteLen")).cast("long").as("band3_n"))
  }

  /** Multimodal transform plumbing with a full value oracle: the resize
    * stub is deterministic byte slicing, and the documents corpus is pure
    * ASCII (verified octet_length == length for every row), so byte math
    * and md5 line up exactly with DuckDB's varchar functions. */
  def q44MultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val assets = graft.operators.Multimodal.assetsFromDocuments(docs)
    graft.operators.Multimodal.resizeStub(assets, maxBytes = 100)
      .select(
        col("assetId").as("asset_id"),
        col("kind"),
        length(col("bytes")).cast("long").as("byte_len"),
        md5(col("bytes")).as("content_hash"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.format").as("format"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cometbft_consensus_timing" -> q40ConsensusTiming _,
    "q41_cometbft_vote_latencies"   -> q41VoteLatencies _,
    "q42_cometbft_network_latency"  -> q42NetworkLatency _,
    "q43_multimodal_features"       -> q43MultimodalFeatures _,
    "q44_multimodal_resize"         -> q44MultimodalResize _
  )

  val oracleSql: Map[String, String] = Map(
    "q40_cometbft_consensus_timing" ->
      """SELECT node_id, CAST(height AS BIGINT) AS height, CAST(round AS BIGINT) AS round, CAST(total_round_time_ms AS BIGINT) AS total_round_time_ms FROM (VALUES ('aaaa000000000000000000000000000000000001', 1, 0, 4012), ('aaaa000000000000000000000000000000000001', 2, 0, 4012), ('aaaa000000000000000000000000000000000001', 3, 0, 4012), ('aaaa000000000000000000000000000000000001', 4, 0, 4015), ('bbbb000000000000000000000000000000000002', 1, 0, 413), ('bbbb000000000000000000000000000000000002', 2, 0, 410), ('bbbb000000000000000000000000000000000002', 3, 0, 412), ('bbbb000000000000000000000000000000000002', 4, 0, 410), ('cccc000000000000000000000000000000000003', 1, 0, 410), ('cccc000000000000000000000000000000000003', 2, 0, 413), ('cccc000000000000000000000000000000000003', 3, 0, 412), ('cccc000000000000000000000000000000000003', 4, 0, 410), ('dddd000000000000000000000000000000000004', 1, 0, 410), ('dddd000000000000000000000000000000000004', 2, 0, 410), ('dddd000000000000000000000000000000000004', 3, 0, 415), ('dddd000000000000000000000000000000000004', 4, 0, 410)) AS t(node_id, height, round, total_round_time_ms)""",
    "q41_cometbft_vote_latencies" ->
      """SELECT CAST(height AS BIGINT) AS height, CAST(round AS BIGINT) AS round, CAST(val_idx AS BIGINT) AS val_idx, sender, receiver, CAST(latency_ms AS BIGINT) AS latency_ms FROM (VALUES (1, 0, 1, 'bbbb000000000000000000000000000000000002', 'aaaa000000000000000000000000000000000001', 1692), (1, 0, 2, 'cccc000000000000000000000000000000000003', 'aaaa000000000000000000000000000000000001', 1694), (1, 0, 3, 'dddd000000000000000000000000000000000004', 'aaaa000000000000000000000000000000000001', 1693), (2, 0, 1, 'bbbb000000000000000000000000000000000002', 'aaaa000000000000000000000000000000000001', 5744), (2, 0, 2, 'cccc000000000000000000000000000000000003', 'aaaa000000000000000000000000000000000001', 5743), (2, 0, 3, 'dddd000000000000000000000000000000000004', 'aaaa000000000000000000000000000000000001', 5745), (3, 0, 1, 'bbbb000000000000000000000000000000000002', 'aaaa000000000000000000000000000000000001', 9796), (3, 0, 2, 'cccc000000000000000000000000000000000003', 'aaaa000000000000000000000000000000000001', 9795), (3, 0, 3, 'dddd000000000000000000000000000000000004', 'aaaa000000000000000000000000000000000001', 9794), (4, 0, 1, 'bbbb000000000000000000000000000000000002', 'aaaa000000000000000000000000000000000001', 13849), (4, 0, 2, 'cccc000000000000000000000000000000000003', 'aaaa000000000000000000000000000000000001', 13848), (4, 0, 3, 'dddd000000000000000000000000000000000004', 'aaaa000000000000000000000000000000000001', 13847)) AS t(height, round, val_idx, sender, receiver, latency_ms)""",
    "q42_cometbft_network_latency" ->
      """SELECT pair, msg_type, CAST(cnt AS BIGINT) AS cnt, CAST(min_v AS BIGINT) AS min_v, CAST(max_v AS BIGINT) AS max_v, CAST(mean_v AS BIGINT) AS mean_v, CAST(median_v AS BIGINT) AS median_v, CAST(p95_v AS BIGINT) AS p95_v, CAST(p99_v AS BIGINT) AS p99_v, CAST(below_p50 AS BIGINT) AS below_p50, CAST(p50_to_p95 AS BIGINT) AS p50_to_p95, CAST(p95_to_p99 AS BIGINT) AS p95_to_p99, CAST(above_p99 AS BIGINT) AS above_p99 FROM (VALUES ('aaaa000000000000000000000000000000000001|cccc000000000000000000000000000000000003', 'vote', 16, -14849, 14852, 1, 1, 14852, 14852, 8, 7, 0, 1), ('aaaa000000000000000000000000000000000001|cccc000000000000000000000000000000000003', 'block_part', 2, -13048, 4949, -4049, -4049, 4949, 4949, 1, 0, 0, 1), ('bbbb000000000000000000000000000000000002|cccc000000000000000000000000000000000003', 'proposal', 2, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1), ('bbbb000000000000000000000000000000000002|dddd000000000000000000000000000000000004', 'vote', 16, -1, 5, 1, 1, 5, 5, 4, 8, 0, 4), ('cccc000000000000000000000000000000000003|dddd000000000000000000000000000000000004', 'vote', 16, 0, 3, 1, 1, 3, 3, 8, 2, 0, 6), ('aaaa000000000000000000000000000000000001|bbbb000000000000000000000000000000000002', 'block_part', 2, -13048, 899, -6074, -6074, 899, 899, 1, 0, 0, 1), ('aaaa000000000000000000000000000000000001|dddd000000000000000000000000000000000004', 'block_part', 2, -13048, 8999, -2024, -2024, 8999, 8999, 1, 0, 0, 1), ('bbbb000000000000000000000000000000000002|cccc000000000000000000000000000000000003', 'block_part', 2, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1), ('bbbb000000000000000000000000000000000002|cccc000000000000000000000000000000000003', 'vote', 16, 0, 3, 1, 1, 3, 3, 8, 2, 0, 6), ('cccc000000000000000000000000000000000003|dddd000000000000000000000000000000000004', 'block_part', 2, -2, -1, -1, -1, -1, -1, 1, 0, 0, 1), ('aaaa000000000000000000000000000000000001|bbbb000000000000000000000000000000000002', 'vote', 16, -14850, 14853, 1, 1, 14853, 14853, 8, 7, 0, 1), ('aaaa000000000000000000000000000000000001|bbbb000000000000000000000000000000000002', 'proposal', 2, -13048, 899, -6074, -6074, 899, 899, 1, 0, 0, 1), ('aaaa000000000000000000000000000000000001|cccc000000000000000000000000000000000003', 'proposal', 2, -13048, 4949, -4049, -4049, 4949, 4949, 1, 0, 0, 1), ('aaaa000000000000000000000000000000000001|dddd000000000000000000000000000000000004', 'vote', 16, -14847, 14850, 1, 1, 14850, 14850, 8, 7, 0, 1), ('aaaa000000000000000000000000000000000001|dddd000000000000000000000000000000000004', 'proposal', 2, -13048, 8999, -2024, -2024, 8999, 8999, 1, 0, 0, 1), ('bbbb000000000000000000000000000000000002|dddd000000000000000000000000000000000004', 'block_part', 2, -2, 1, 0, 0, 1, 1, 1, 0, 0, 1), ('bbbb000000000000000000000000000000000002|dddd000000000000000000000000000000000004', 'proposal', 2, -2, 1, 0, 0, 1, 1, 1, 0, 0, 1), ('cccc000000000000000000000000000000000003|dddd000000000000000000000000000000000004', 'proposal', 2, -2, -1, -1, -1, -1, -1, 1, 0, 0, 1), ('cccc000000000000000000000000000000000003|dddd000000000000000000000000000000000004', 'overall', 20, -2, 3, 0, 0, 3, 3, 4, 10, 0, 6), ('aaaa000000000000000000000000000000000001|bbbb000000000000000000000000000000000002', 'overall', 20, -14850, 14853, -1213, -447, 14853, 14853, 10, 9, 0, 1), ('aaaa000000000000000000000000000000000001|cccc000000000000000000000000000000000003', 'overall', 20, -14849, 14852, -808, 1, 14852, 14852, 10, 9, 0, 1), ('aaaa000000000000000000000000000000000001|dddd000000000000000000000000000000000004', 'overall', 20, -14847, 14850, -403, 1, 14850, 14850, 10, 9, 0, 1), ('bbbb000000000000000000000000000000000002|dddd000000000000000000000000000000000004', 'overall', 20, -2, 5, 1, 1, 5, 5, 6, 10, 0, 4), ('bbbb000000000000000000000000000000000002|cccc000000000000000000000000000000000003', 'overall', 20, 0, 3, 1, 0, 3, 3, 0, 14, 0, 6)) AS t(pair, msg_type, cnt, min_v, max_v, mean_v, median_v, p95_v, p99_v, below_p50, p50_to_p95, p95_to_p99, above_p99)""",
    "q43_multimodal_features" ->
      """SELECT doc_id AS asset_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |  length(text) AS byte_len,
        |  md5(text) AS content_hash,
        |  CAST(list_sum(list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1)))) AS BIGINT) AS sum_bytes,
        |  CAST(list_sum(list_transform(generate_series(1, length(text)), i -> CASE WHEN ord(substr(text, i, 1)) // 32 = 1 THEN 1 ELSE 0 END)) AS BIGINT) AS band1_n,
        |  CAST(list_sum(list_transform(generate_series(1, length(text)), i -> CASE WHEN ord(substr(text, i, 1)) // 32 = 3 THEN 1 ELSE 0 END)) AS BIGINT) AS band3_n
        |FROM documents""".stripMargin,
    "q44_multimodal_resize" ->
      """SELECT doc_id AS asset_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |  LEAST(length(text), 100) AS byte_len,
        |  md5(substr(text, 1, 100)) AS content_hash,
        |  LEAST(n_chars % 640, 100) AS width,
        |  LEAST(n_chars % 480, 100) AS height,
        |  'stub-resized' AS format
        |FROM documents""".stripMargin
  )
}
