package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.operators.AsOfJoin

/** Native watermarked stream-stream as-of ([[StreamingPipeline.asofStream]]):
  * closed-input parity with the batch operator (tolerance = horizon) under
  * batch slicings, the leftOuter variant, checkpoint restart, and the
  * construction guards. Version rows are unique per (key, ts) by fixture
  * construction — the operator's documented tie contract. */
class StreamingAsofNativeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2025-01-01 00:$min%02d:$sec%02d")

  private val HorizonUs = 10L * 60 * 1000000 // 10 minutes

  /** Probes: unique pid per row. Versions: unique (k, ts) per row (sec = j). */
  private def fixture(seed: Int, nP: Int, nV: Int) = {
    val rnd = new Random(seed)
    val probes = (1 to nP).map(j => ("k" + rnd.nextInt(3), ts(rnd.nextInt(55), rnd.nextInt(60)), s"p$j"))
    val versions = (1 to nV).map(j => ("k" + rnd.nextInt(3), ts(rnd.nextInt(45), j % 60), s"v$j"))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, ts)
    (probes, versions)
  }

  private def batchWant(probes: Seq[(String, java.sql.Timestamp, String)],
                        versions: Seq[(String, java.sql.Timestamp, String)],
                        joinType: String) =
    AsOfJoin.backward(
      probes.toDF("k", "pts", "pid")
        .select($"k", unix_micros($"pts").as("p_us"), $"pid"),
      versions.toDF("vk", "vts", "vid")
        .select($"vk".as("k"), unix_micros($"vts").as("v_us"), $"vid"),
      Seq("k"), "p_us", "v_us",
      strict = false, tolerance = Some(HorizonUs), joinType = joinType)
      .select($"pid", $"vid").as[(String, Option[String])].collect().toSet

  test("closed-input parity with the batch operator, across batch slicings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val (pRows, vRows) = fixture(41, 200, 80)
    val want = batchWant(pRows, vRows, "inner")
    assert(want.nonEmpty)

    for (nChunks <- Seq(1, 4, 8)) {
      val pMem = MemoryStream[(String, java.sql.Timestamp, String)]
      val vMem = MemoryStream[(String, java.sql.Timestamp, String)]
      val out = StreamingPipeline.asofStream(
        pMem.toDF().toDF("k", "pts", "pid"),
        vMem.toDF().toDF("k", "vts", "vid"),
        Seq("k"), "pts", "vts",
        horizon = "10 minutes",
        probeWatermark = "2 hours", versionWatermark = "2 hours")
      val qn = s"asofss_$nChunks"
      val q = out.select($"pid", $"vid").writeStream
        .outputMode("append").format("memory").queryName(qn).start()
      try {
        val pSize = math.max(1, (pRows.size + nChunks - 1) / nChunks)
        val vSize = math.max(1, (vRows.size + nChunks - 1) / nChunks)
        pRows.grouped(pSize).zipAll(vRows.grouped(vSize), Nil, Nil).foreach {
          case (pc, vc) =>
            if (pc.nonEmpty) pMem.addData(pc)
            if (vc.nonEmpty) vMem.addData(vc)
            q.processAllAvailable()
        }
        // append mode emits a probe only once the watermark passes its
        // event time; push the watermark far past the fixture hour
        pMem.addData(Seq(("kz", java.sql.Timestamp.valueOf("2025-01-02 12:00:00"), "wm")))
        vMem.addData(Seq(("kz", java.sql.Timestamp.valueOf("2025-01-02 12:00:00"), "wmv")))
        q.processAllAvailable()
        val got = spark.sql(s"select pid, vid from $qn where pid <> 'wm'")
          .as[(String, Option[String])].collect().toSet
        assert(got == want, s"slicing $nChunks diverged from the batch operator")
        assert(q.lastProgress == null || q.recentProgress.exists(_.stateOperators.size >= 2),
          "expected two stateful operators (join + per-probe argmax)")
      } finally q.stop()
    }
  }

  test("leftOuter keeps horizon-less probes with null version columns") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val (pRows, vRows) = fixture(42, 120, 40)
    val want = batchWant(pRows, vRows, "left")
    assert(want.exists(_._2.isEmpty), "fixture needs at least one unmatched probe")

    val pMem = MemoryStream[(String, java.sql.Timestamp, String)]
    val vMem = MemoryStream[(String, java.sql.Timestamp, String)]
    val out = StreamingPipeline.asofStream(
      pMem.toDF().toDF("k", "pts", "pid"),
      vMem.toDF().toDF("k", "vts", "vid"),
      Seq("k"), "pts", "vts",
      horizon = "10 minutes",
      probeWatermark = "2 hours", versionWatermark = "2 hours",
      joinType = "left")
    val q = out.select($"pid", $"vid").writeStream
      .outputMode("append").format("memory").queryName("asofss_left").start()
    try {
      pMem.addData(pRows); vMem.addData(vRows)
      q.processAllAvailable()
      // watermark push: outer null-extensions and agg closes both need it
      pMem.addData(Seq(("kz", java.sql.Timestamp.valueOf("2025-01-02 12:00:00"), "wm")))
      vMem.addData(Seq(("kz", java.sql.Timestamp.valueOf("2025-01-02 12:00:00"), "wmv")))
      q.processAllAvailable()
      val got = spark.sql("select pid, vid from asofss_left where pid <> 'wm'")
        .as[(String, Option[String])].collect().toSet
      assert(got == want, "leftOuter diverged from the batch operator")
    } finally q.stop()
  }

  test("restart from checkpoint resumes without loss or duplication") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val (pRows, vRows) = fixture(43, 80, 30)
    val want = batchWant(pRows, vRows, "inner")
    assert(want.nonEmpty)
    val ckpt = java.nio.file.Files.createTempDirectory("asofss-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("asofss-out").toString
    val pMem = MemoryStream[(String, java.sql.Timestamp, String)]
    val vMem = MemoryStream[(String, java.sql.Timestamp, String)]
    def start() = StreamingPipeline.asofStream(
        pMem.toDF().toDF("k", "pts", "pid"),
        vMem.toDF().toDF("k", "vts", "vid"),
        Seq("k"), "pts", "vts",
        horizon = "10 minutes",
        probeWatermark = "2 hours", versionWatermark = "2 hours")
      .select($"pid", $"vid").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .start()
    val q1 = start()
    try {
      pMem.addData(pRows.take(40)); vMem.addData(vRows.take(15))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      pMem.addData(pRows.drop(40)); vMem.addData(vRows.drop(15))
      q2.processAllAvailable()
      pMem.addData(Seq(("kz", java.sql.Timestamp.valueOf("2025-01-02 12:00:00"), "wm")))
      vMem.addData(Seq(("kz", java.sql.Timestamp.valueOf("2025-01-02 12:00:00"), "wmv")))
      q2.processAllAvailable()
    } finally q2.stop()
    val emitted = spark.read.parquet(outDir)
      .filter($"pid" =!= "wm")
      .select($"pid", $"vid").as[(String, Option[String])].collect().toSeq
    assert(emitted.size == emitted.distinct.size, "restart duplicated emitted rows")
    assert(emitted.toSet == want, "restart lost or fabricated rows")
  }

  test("construction guards: overlapping columns, bad horizon, bad joinType") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val pMem = MemoryStream[(String, java.sql.Timestamp, String)]
    val vMem = MemoryStream[(String, java.sql.Timestamp, String)]
    intercept[IllegalArgumentException] {
      StreamingPipeline.asofStream(
        pMem.toDF().toDF("k", "pts", "dup"),
        vMem.toDF().toDF("k", "vts", "dup"),
        Seq("k"), "pts", "vts", "10 minutes", "1 hour", "1 hour")
    }
    intercept[IllegalArgumentException] {
      StreamingPipeline.asofStream(
        pMem.toDF().toDF("k", "pts", "pid"),
        vMem.toDF().toDF("k", "vts", "vid"),
        Seq("k"), "pts", "vts", "0 minutes", "1 hour", "1 hour")
    }
    intercept[IllegalArgumentException] {
      StreamingPipeline.asofStream(
        pMem.toDF().toDF("k", "pts", "pid"),
        vMem.toDF().toDF("k", "vts", "vid"),
        Seq("k"), "pts", "vts", "10 minutes", "1 hour", "1 hour",
        joinType = "fullOuter")
    }
  }
}
