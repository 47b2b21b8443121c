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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cometbft_consensus_timing" -> q40ConsensusTiming _,
    "q41_cometbft_vote_latencies"   -> q41VoteLatencies _,
    "q42_cometbft_network_latency"  -> q42NetworkLatency _,
    "q43_multimodal_features"       -> q43MultimodalFeatures _
  )

  val oracleSql: Map[String, String] = Map.empty
}
