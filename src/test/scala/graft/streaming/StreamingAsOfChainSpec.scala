package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingPipeline.AsOfSide

/** Composed multi-stateful topology: temporal as-of enrichment
  * (flatMapGroupsWithState) chained into a watermarked tumbling-window
  * aggregation in ONE streaming query — "how many events ran under each
  * config version per window", the production enrich-then-rollup shape. */
class StreamingAsOfChainSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("as-of enrichment chains into a windowed rollup; parity with batch on closed input") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext

    val mem = MemoryStream[AsOfSide]
    val agg = StreamingPipeline.temporalAsOfStream(spark, mem.toDS())
      .withColumn("ets", timestamp_micros($"ts"))
      .withWatermark("ets", "10 seconds")
      .groupBy(window($"ets", "1 minute"), $"rightPayload")
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"window.start").as("win_us"), $"rightPayload", $"n")

    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("asof_chain").start()
    try {
      val m = 60L * 1000000L
      mem.addData(Seq(
        AsOfSide("k", 1L * m / 60, "r", "v1"),       // version v1 at 1s
        AsOfSide("k", 10L * m / 60, "l", "e1"),      // window 0 under v1
        AsOfSide("k", 70L * m / 60, "r", "v2"),      // v2 at 70s
        AsOfSide("k", 80L * m / 60, "l", "e2"),      // window 1 under v2
        AsOfSide("k", 85L * m / 60, "l", "e3"),      // window 1 under v2
        AsOfSide("k2", 90L * m / 60, "l", "e4")))    // window 1, no version
      q.processAllAvailable()
      mem.addData(Seq(AsOfSide("k", 600L * m / 60, "l", "pusher"))) // closes both windows
      q.processAllAvailable()

      val got = spark.sql("select win_us, rightPayload, n from asof_chain")
        .as[(Long, Option[String], Long)].collect().toSet
      assert(got == Set(
        (0L, Some("v1"), 1L),
        (1L * m, Some("v2"), 2L),
        (1L * m, None, 1L)))
    } finally q.stop()
  }
}
