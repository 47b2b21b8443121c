package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Windowed MG sketch stream: the emitted summary must honor the sketch
  * guarantees per window on a closed input — superset of true heavy
  * items, count bounds, ≤ k entries — regardless of batch slicing. */
class StreamingHeavyHitterSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-window summaries honor MG guarantees for any batch slicing") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val k   = 16
    val rnd = new Random(9115)
    // Two 1-minute windows with different skew, item i ~ weight 1/(i+1).
    def draw(): String = { val u = rnd.nextDouble() * 5.19; s"w${(math.exp(u) - 1).toInt.min(178)}" }
    val rows = (1 to 3000).map { i =>
      val win = if (i % 2 == 0) "2025-01-01 00:00" else "2025-01-01 00:01"
      val sec = rnd.nextInt(60)
      (java.sql.Timestamp.valueOf(f"$win%s:$sec%02d"), draw())
    }
    val fixed = rows :+
      ((java.sql.Timestamp.valueOf("2025-01-01 01:00:00"), "pusher")) // closes both windows

    for (nChunks <- Seq(1, 4)) {
      val mem = MemoryStream[(java.sql.Timestamp, String)]
      val out = StreamingPipeline.heavyHitterStream(
        // 10-min watermark: batch slicing interleaves both windows' rows,
        // so a tight watermark would close window 0 after the first chunk
        // and drop the rest as late; only the 01:00 pusher may close.
        mem.toDF().toDF("ts", "item"), "ts", "item", "1 minute", "10 minutes", k)
      val qn = s"hh_win_$nChunks"
      val q  = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
      try {
        val size = math.max(1, (fixed.size + nChunks - 1) / nChunks)
        fixed.grouped(size).foreach { c => mem.addData(c); q.processAllAvailable() }
        val winRows = spark.sql(s"select window_start, entries, err, n from $qn")
          .collect()
          .map(r => (r.getTimestamp(0).toString,
            r.getSeq[org.apache.spark.sql.Row](1).map(e => e.getString(0) -> e.getLong(1)).toMap,
            r.getLong(2), r.getLong(3)))
          .filter(_._4 > 1) // skip the pusher's own window
        assert(winRows.length == 2, s"expected 2 closed windows, got ${winRows.map(_._1).toSeq}")
        winRows.foreach { case (winStart, est, err, n) =>
          val truth = rows
            .filter(_._1.toString.startsWith(winStart.substring(0, 16)))
            .groupBy(_._2).view.mapValues(_.size.toLong).toMap
          assert(n == truth.values.sum, s"window $winStart n mismatch")
          assert(est.size <= k)
          assert(err <= n / (k + 1))
          truth.foreach { case (item, cnt) =>
            if (cnt > n / (k + 1)) assert(est.contains(item), s"$winStart lost heavy $item ($cnt)")
          }
          est.foreach { case (item, c) =>
            val t = truth.getOrElse(item, 0L)
            assert(c <= t && t <= c + err, s"$winStart bounds broken for $item: est=$c true=$t err=$err")
          }
        }
      } finally q.stop()
    }
  }

  test("grouped variant: per-(window, group) summaries, groups isolated") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val out = StreamingPipeline.heavyHitterStream(
      mem.toDF().toDF("ts", "src", "item"), "ts", "item", "1 minute", "10 minutes",
      k = 4, groupCols = Seq("src"))
    val q = out.writeStream.outputMode("append").format("memory").queryName("hh_grp").start()
    try {
      val t = java.sql.Timestamp.valueOf("2025-01-01 00:00:30")
      val rows = Seq.fill(30)((t, "sA", "hot-a")) ++ Seq.fill(30)((t, "sB", "hot-b")) ++
        (1 to 10).map(i => (t, "sA", s"cold$i")) :+
        ((java.sql.Timestamp.valueOf("2025-01-01 01:00:00"), "sA", "pusher"))
      mem.addData(rows); q.processAllAvailable()
      val got = spark.sql("select src, entries, n from hh_grp where n > 1")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)).toSet, r.getLong(2))))
        .toMap
      assert(got("sA")._2 == 40L && got("sB")._2 == 30L)
      assert(got("sA")._1.contains("hot-a") && !got("sA")._1.contains("hot-b"))
      assert(got("sB")._1 == Set("hot-b"))
    } finally q.stop()
  }
}
