package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.streaming.StreamingPipeline.{AsOfJoined, AsOfSide}
import scala.util.Random

/** Temporal as-of stream: closed-input parity with the batch operator,
  * cross-batch snapshot carry, and fail-closed late probes. */
class StreamingAsOfSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("closed single-batch input matches batch AsOfJoin.backward exactly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val rnd  = new Random(9114)
    val keys = Seq("a", "b", "c")
    val probes   = (1 to 200).map(i => AsOfSide(keys(rnd.nextInt(3)), rnd.nextInt(500).toLong, "l", s"p$i"))
    val versions = (1 to 150).map(i => AsOfSide(keys(rnd.nextInt(3)), rnd.nextInt(500).toLong, "r", s"v$i"))

    val l = probes.map(s => (s.key, s.ts, s.payload)).toDF("key", "ts", "payload")
    val r = versions.map(s => (s.key, s.ts, s.payload)).toDF("key", "rts", "rpayload")
    val want = AsOfJoin
      .backward(l, r, Seq("key"), "ts", "rts", joinType = "left", tiebreak = Seq("rpayload"))
      .select($"payload", $"rts", $"rpayload")
      .as[(String, Option[Long], Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    val mem = MemoryStream[AsOfSide]
    val q = StreamingPipeline.temporalAsOfStream(spark, mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("asof_parity").start()
    try {
      mem.addData(rnd.shuffle(probes ++ versions))
      q.processAllAvailable()
      val got = spark.sql("select payload, rightTs, rightPayload from asof_parity")
        .as[(String, Option[Long], Option[String])].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got.size == probes.size)
      assert(got == want)
    } finally q.stop()
  }

  test("snapshot carries across batches; a newer version supersedes it") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[AsOfSide]
    val q = StreamingPipeline.temporalAsOfStream(spark, mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("asof_carry").start()
    try {
      mem.addData(Seq(AsOfSide("k", 10L, "r", "v1")))
      q.processAllAvailable()
      mem.addData(Seq(AsOfSide("k", 20L, "l", "p1")))
      q.processAllAvailable()
      mem.addData(Seq(AsOfSide("k", 30L, "r", "v2"), AsOfSide("k", 40L, "l", "p2")))
      q.processAllAvailable()
      val got = spark.sql("select payload, rightPayload from asof_carry")
        .as[(String, Option[String])].collect().toMap
      assert(got == Map("p1" -> Some("v1"), "p2" -> Some("v2")))
    } finally q.stop()
  }

  test("historyDepth: late probes inside the horizon match correctly, beyond it fail closed") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[AsOfSide]
    val q = StreamingPipeline.temporalAsOfStream(spark, mem.toDS(), historyDepth = 2)
      .writeStream.outputMode("append").format("memory").queryName("asof_hist").start()
    try {
      mem.addData(Seq(AsOfSide("k", 10L, "r", "v1"), AsOfSide("k", 50L, "r", "v2"),
        AsOfSide("k", 100L, "r", "v3"))) // v1 falls off the 2-deep horizon
      q.processAllAvailable()
      mem.addData(Seq(
        AsOfSide("k", 60L, "l", "p-in"),   // floor v2 retained → correct match
        AsOfSide("k", 20L, "l", "p-out"))) // floor v1 evicted → fail closed
      q.processAllAvailable()
      val got = spark.sql("select payload, rightPayload from asof_hist")
        .as[(String, Option[String])].collect().toMap
      assert(got == Map("p-in" -> Some("v2"), "p-out" -> None))
    } finally q.stop()
  }

  test("closed single-batch parity holds at depth > 1 too") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val rnd  = new Random(9118)
    val rows = (1 to 150).map(i => AsOfSide("k" + rnd.nextInt(2), rnd.nextInt(300).toLong,
      if (rnd.nextBoolean()) "r" else "l", s"x$i"))
    def run(depth: Int): Map[String, (Option[Long], Option[String])] = {
      val mem = MemoryStream[AsOfSide]
      val q = StreamingPipeline.temporalAsOfStream(spark, mem.toDS(), historyDepth = depth)
        .writeStream.outputMode("append").format("memory").queryName(s"asof_d$depth").start()
      try {
        mem.addData(rows); q.processAllAvailable()
        spark.sql(s"select payload, rightTs, rightPayload from asof_d$depth")
          .as[(String, Option[Long], Option[String])].collect()
          .map(t => t._1 -> ((t._2, t._3))).toMap
      } finally q.stop()
    }
    val d1 = run(1)
    assert(d1.nonEmpty)
    assert(run(4) == d1)
  }

  test("late probe older than the held snapshot fails closed, not wrong") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[AsOfSide]
    val q = StreamingPipeline.temporalAsOfStream(spark, mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("asof_late").start()
    try {
      mem.addData(Seq(AsOfSide("k", 100L, "r", "v-new")))
      q.processAllAvailable()
      // ts=50 probe: the true as-of row (some ts<=50 version) was never
      // seen; matching v-new (ts=100) would time-travel. Must emit null.
      mem.addData(Seq(AsOfSide("k", 50L, "l", "p-late")))
      q.processAllAvailable()
      val got = spark.sql("select payload, rightPayload from asof_late")
        .as[(String, Option[String])].collect().toMap
      assert(got == Map("p-late" -> None))
    } finally q.stop()
  }
}
