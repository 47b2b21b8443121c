package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.operators.IntervalJoin

/** Stream-stream point-in-interval: closed-input parity with the batch
  * operator under batch slicing, the maxSpan per-row guard, and the
  * state-bounding watermarks actually being planned (a stateful
  * stream-stream join, not a fallback). */
class StreamingIntervalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2025-01-01 00:$min%02d:$sec%02d")

  test("closed-input parity with the batch operator, across batch slicings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val rnd = new Random(77)
    // intervals up to 10 min long (maxSpan 15m); points over the same hour
    val ivRows = (1 to 60).map { j =>
      val s = rnd.nextInt(45); val len = rnd.nextInt(10)
      ("k" + rnd.nextInt(3), ts(s), ts(s + len, 30), s"iv$j")
    }
    val ptRows = (1 to 200).map { j =>
      ("k" + rnd.nextInt(3), ts(rnd.nextInt(55), rnd.nextInt(60)), s"p$j")
    }

    val batchWant = IntervalJoin.pointInInterval(
      ptRows.toDF("k", "pts", "pid")
        .select($"k", unix_micros($"pts").as("ts_us"), $"pid"),
      ivRows.toDF("ik", "s", "e", "iid")
        .select($"ik".as("k"), unix_micros($"s").as("s_us"), unix_micros($"e").as("e_us"), $"iid"),
      Seq("k"), "ts_us", "s_us", "e_us", bucketWidth = 60000000L)
      .select($"pid", $"iid").as[(String, String)].collect().toSet
    assert(batchWant.nonEmpty)

    for (nChunks <- Seq(1, 4)) {
      val pMem = MemoryStream[(String, java.sql.Timestamp, String)]
      val iMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
      val out = StreamingPipeline.pointInIntervalStream(
        pMem.toDF().toDF("k", "pts", "pid"),
        iMem.toDF().toDF("k", "s", "e", "iid"),
        Seq("k"), "pts", "s", "e",
        maxSpan = "15 minutes",
        pointWatermark = "2 hours", intervalWatermark = "2 hours")
      val qn = s"ivss_$nChunks"
      val q = out.select($"pid", $"iid").writeStream
        .outputMode("append").format("memory").queryName(qn).start()
      try {
        val pSize = math.max(1, (ptRows.size + nChunks - 1) / nChunks)
        val iSize = math.max(1, (ivRows.size + nChunks - 1) / nChunks)
        ptRows.grouped(pSize).zipAll(ivRows.grouped(iSize), Nil, Nil).foreach {
          case (pc, ic) =>
            if (pc.nonEmpty) pMem.addData(pc)
            if (ic.nonEmpty) iMem.addData(ic)
            q.processAllAvailable()
        }
        val got = spark.sql(s"select pid, iid from $qn").as[(String, String)].collect().toSet
        assert(got == batchWant, s"slicing $nChunks diverged from the batch operator")
        // the plan is a stateful stream-stream join (watermarked state)
        assert(q.lastProgress == null || q.recentProgress.exists(_.stateOperators.nonEmpty),
          "no stateful operator in the streaming query")
      } finally q.stop()
    }
  }

  // ------------------------------------------------- stream-stream overlap

  /** Random same-key interval fixture for the overlap tests: spans up to
    * 10 min (maxSpan 15m), some zero-length, over one hour. */
  private def overlapFixture(seed: Int, n: Int, tag: String) = {
    val rnd = new Random(seed)
    (1 to n).map { j =>
      val s = rnd.nextInt(45); val len = rnd.nextInt(10)
      ("k" + rnd.nextInt(3), ts(s), ts(s + len, 30), s"$tag$j")
    }
  }

  private def overlapBatchWant(
      lRows: Seq[(String, java.sql.Timestamp, java.sql.Timestamp, String)],
      rRows: Seq[(String, java.sql.Timestamp, java.sql.Timestamp, String)]) = {
    IntervalJoin.overlap(
      lRows.toDF("k", "ls", "le", "lid")
        .select($"k", unix_micros($"ls").as("ls_us"), unix_micros($"le").as("le_us"), $"lid"),
      rRows.toDF("k", "rs", "re", "rid")
        .select($"k", unix_micros($"rs").as("rs_us"), unix_micros($"re").as("re_us"), $"rid"),
      Seq("k"), "ls_us", "le_us", "rs_us", "re_us", bucketWidth = 60000000L)
      .select($"lid", $"rid").as[(String, String)].collect().toSet
  }

  test("overlapStream: closed-input parity with the batch operator, across batch slicings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val lRows = overlapFixture(91, 60, "a")
    val rRows = overlapFixture(92, 60, "b")
    val batchWant = overlapBatchWant(lRows, rRows)
    assert(batchWant.nonEmpty)

    for (nChunks <- Seq(1, 4, 8)) {
      val lMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
      val rMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
      val out = StreamingPipeline.overlapStream(
        lMem.toDF().toDF("k", "ls", "le", "lid"),
        rMem.toDF().toDF("k", "rs", "re", "rid"),
        Seq("k"), "ls", "le", "rs", "re",
        maxSpan = "15 minutes",
        leftWatermark = "2 hours", rightWatermark = "2 hours")
      val qn = s"ovss_$nChunks"
      val q = out.select($"lid", $"rid").writeStream
        .outputMode("append").format("memory").queryName(qn).start()
      try {
        val size = math.max(1, (lRows.size + nChunks - 1) / nChunks)
        lRows.grouped(size).zipAll(rRows.grouped(size), Nil, Nil).foreach {
          case (lc, rc) =>
            if (lc.nonEmpty) lMem.addData(lc)
            if (rc.nonEmpty) rMem.addData(rc)
            q.processAllAvailable()
        }
        val got = spark.sql(s"select lid, rid from $qn").as[(String, String)].collect().toSet
        assert(got == batchWant, s"slicing $nChunks diverged from the batch operator")
        assert(q.lastProgress == null || q.recentProgress.exists(_.stateOperators.nonEmpty),
          "no stateful operator in the streaming query")
      } finally q.stop()
    }
  }

  test("overlapStream: restart from checkpoint resumes without loss or duplication") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val lRows = overlapFixture(93, 40, "a")
    val rRows = overlapFixture(94, 40, "b")
    val batchWant = overlapBatchWant(lRows, rRows)
    assert(batchWant.nonEmpty)
    val ckpt = java.nio.file.Files.createTempDirectory("ovss-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("ovss-out").toString
    val lMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
    val rMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
    def start() = StreamingPipeline.overlapStream(
        lMem.toDF().toDF("k", "ls", "le", "lid"),
        rMem.toDF().toDF("k", "rs", "re", "rid"),
        Seq("k"), "ls", "le", "rs", "re",
        maxSpan = "15 minutes",
        leftWatermark = "2 hours", rightWatermark = "2 hours")
      .select($"lid", $"rid").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .start()
    // first half, then a hard stop
    val q1 = start()
    try {
      lMem.addData(lRows.take(20)); rMem.addData(rRows.take(20))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart on the same checkpoint; feed the rest
    val q2 = start()
    try {
      lMem.addData(lRows.drop(20)); rMem.addData(rRows.drop(20))
      q2.processAllAvailable()
    } finally q2.stop()
    val emitted = spark.read.parquet(outDir).select($"lid", $"rid")
      .as[(String, String)].collect().toSeq
    assert(emitted.size == emitted.distinct.size, "restart duplicated emitted pairs")
    assert(emitted.toSet == batchWant, "restart lost or fabricated pairs")
  }

  test("overlapStream: a span longer than maxSpan fails loudly on either side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val lMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
    val rMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
    val out = StreamingPipeline.overlapStream(
      lMem.toDF().toDF("k", "ls", "le", "lid"),
      rMem.toDF().toDF("k", "rs", "re", "rid"),
      Seq("k"), "ls", "le", "rs", "re",
      maxSpan = "5 minutes", leftWatermark = "1 hour", rightWatermark = "1 hour")
    val q = out.writeStream.outputMode("append").format("memory").queryName("ovss_guard").start()
    try {
      lMem.addData(Seq(("k", ts(0), ts(1), "ok")))
      rMem.addData(Seq(("k", ts(0), ts(40), "too-long")))
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("maxSpan")), s"unexpected failure: $e")
    } finally q.stop()
    // and disjoint-column / bad-span construction guards
    intercept[IllegalArgumentException] {
      StreamingPipeline.overlapStream(
        lMem.toDF().toDF("k", "ls", "le", "dup"),
        rMem.toDF().toDF("k", "rs", "re", "dup"),
        Seq("k"), "ls", "le", "rs", "re", "5 minutes", "1 hour", "1 hour")
    }
  }

  test("an interval longer than maxSpan fails loudly instead of silently losing matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val pMem = MemoryStream[(String, java.sql.Timestamp, String)]
    val iMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
    val out = StreamingPipeline.pointInIntervalStream(
      pMem.toDF().toDF("k", "pts", "pid"),
      iMem.toDF().toDF("k", "s", "e", "iid"),
      Seq("k"), "pts", "s", "e",
      maxSpan = "5 minutes", pointWatermark = "1 hour", intervalWatermark = "1 hour")
    val q = out.writeStream.outputMode("append").format("memory").queryName("ivss_guard").start()
    try {
      pMem.addData(Seq(("k", ts(30), "p1")))
      iMem.addData(Seq(("k", ts(0), ts(40), "too-long")))
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("maxSpan")), s"unexpected failure: $e")
    } finally q.stop()
  }

  test("non-key column overlap is rejected up front") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val pMem = MemoryStream[(String, java.sql.Timestamp, String)]
    val iMem = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp, String)]
    intercept[IllegalArgumentException] {
      StreamingPipeline.pointInIntervalStream(
        pMem.toDF().toDF("k", "pts", "dup"),
        iMem.toDF().toDF("k", "s", "e", "dup"),
        Seq("k"), "pts", "s", "e", "5 minutes", "1 hour", "1 hour")
    }
  }
}
