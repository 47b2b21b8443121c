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
    // Scalar-only projection: the driver's rows-only check sorts every
    // column with pandas, which cannot sort an embedding array column
    // (round-1 q43 crashed its compare). The array stays covered by
    // MultimodalSpec; here it is reduced to scalar summaries.
    graft.operators.Multimodal
      .extractFeatures(spark, graft.operators.Multimodal.assetsFromDocuments(docs))
      .toDF()
      .select(
        col("assetId"), col("kind"), col("byteLen"), col("contentHash"),
        round(col("meanByte") * 1000).cast("long").as("mean_byte_milli"),
        round(element_at(col("embedding"), 1) * 1000000).cast("long").as("emb0_ppm"),
        round(element_at(col("embedding"), 8) * 1000000).cast("long").as("emb7_ppm"))
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
