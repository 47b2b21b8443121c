package graft.cometbft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CometBFT NDJSON log ingestion (SURVEY.md §2.1 S1-S6, §2.2 P1-P3, P7).
  *
  * `spark.read.text` over the dir's `.log` glob replaces the per-file scanner
  * loop (`internal/app/app.go:25-66`) — the text source has no 64 MB line
  * limit and parallelizes by file split. The `_msg` peek + case-insensitive
  * dispatch (`internal/parser/dispatcher.go:69-97`) becomes a
  * `get_json_object` + `lower()` + one permissive `from_json` over the
  * union schema of all 22 raw message shapes (`types/raws.go`) — Catalyst
  * prunes unused fields per downstream query.
  */
object LogIngest {

  /** Union schema of the raw typed structs (`types/raws.go:7-283`).
    * `chID` (ReceivedBytes) is fetched via case-sensitive
    * `get_json_object` because it collides case-insensitively with
    * `chId` (Receive). */
  val rawUnionSchema: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("module", StringType),
    StructField("level", StringType),
    StructField("addr", StringType),
    StructField("pubKey", StringType),
    StructField("current", StringType),
    StructField("previous", StringType),
    StructField("proposer", StringType),
    StructField("height", LongType),
    StructField("round", LongType),
    StructField("hash", StringType),
    StructField("cs_height", LongType),
    StructField("extLen", LongType),
    StructField("extSigLen", LongType),
    StructField("val_index", LongType),
    StructField("vote_height", LongType),
    StructField("vote_type", StringType),
    StructField("vote", StringType),
    StructField("prevotes", StringType),
    StructField("data", StringType),
    StructField("validator", StringType),
    StructField("vote_timestamp", StringType),
    StructField("last_commit", StringType),
    StructField("src", StringType),
    StructField("msgBytes", StringType),
    StructField("peer", StringType),
    StructField("conn", StringType),
    StructField("packet", StructType(Seq(
      StructField("channel_id", LongType),
      StructField("eof", BooleanType),
      StructField("data", StringType)))),
    StructField("channel", LongType),
    StructField("count", LongType),
    StructField("from", StringType),
    StructField("index", LongType),
    StructField("total", LongType),
    StructField("dur", StringType),
    StructField("step", StringType),
    StructField("proposal", StringType),
    StructField("num_txs", LongType),
    StructField("root", StringType),
    StructField("block", StringType)
  ))

  /** Raw parsed lines: one row per dispatchable log line, with
    * `src_file`, `msg_lc` (lowercased `_msg`), `ch_id` and `node_id_raw` /
    * `validator_addr_raw` side-channel fields, and the union-schema
    * `r` struct.
    *
    * Filters applied exactly as the reference dispatcher:
    *   P1 drop lines without `_msg` (`dispatcher.go:71-77`)
    *   P2 drop "with invalid args" (`dispatcher.go:80-83`)
    */
  def readRaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // pathGlobFilter instead of a glob-in-path: same non-recursive
    // *.log selection (S1), but avoids the FileStreamSink metadata probe
    // that logs a FileNotFoundException stack trace for glob paths.
    spark.read
      .option("pathGlobFilter", "*.log")
      .textFile(dir)
      .select(
        input_file_name().as("src_file"),
        col("value")
      )
      .withColumn("msg_raw", get_json_object($"value", "$._msg"))
      .filter($"msg_raw".isNotNull)
      .withColumn("msg_lc", lower($"msg_raw"))
      .filter(!$"msg_lc".contains("with invalid args"))
      .withColumn("r", from_json($"value", rawUnionSchema))
      .withColumn("ch_id", get_json_object($"value", "$.chID").cast("long"))
      .withColumn("node_id_raw",
        when($"msg_lc" === "p2p node id", get_json_object($"value", "$.ID")))
      .withColumn("validator_addr_raw",
        when($"msg_lc" === "this node is a validator", get_json_object($"value", "$.addr")))
  }

  /** P7 metadata attach (`app.go:77-86,103-108`): per-file nodeID and
    * validatorAddress broadcast-joined onto every row of that file;
    * files missing either value fail the job with the file name (the
    * reference aborts the whole run, `app.go:97-99`).
    *
    * Scale shape: the metadata aggregation is pre-filtered to the two
    * metadata `_msg` lines, so the broadcast build side carries a handful
    * of rows per file instead of every parsed line, and the
    * missing-metadata check rides the main join (left join + raise_error
    * on a null side) instead of a separate driver-side collect pass over
    * the data — no third scan of the log text. */
  def attachMetadata(raw: DataFrame): DataFrame = {
    val meta = raw
      .filter(col("msg_lc").isin("p2p node id", "this node is a validator"))
      .groupBy(col("src_file"))
      .agg(
        min(col("node_id_raw")).as("node_id"),
        min(col("validator_addr_raw")).as("validator_address")
      )
    def required(c: Column): Column = coalesce(c,
      raise_error(concat(lit("node ID or validator address not found in "),
        col("src_file"))).cast("string"))
    raw.join(broadcast(meta), Seq("src_file"), "left")
      .withColumn("node_id", required(col("node_id")))
      .withColumn("validator_address", required(col("validator_address")))
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    attachMetadata(readRaw(spark, dir))
}
