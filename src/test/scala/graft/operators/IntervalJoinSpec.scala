package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Bucketized point-in-interval join: hand cases + random parity against
  * the naive theta join, across bucket widths (the rewrite must be
  * width-invariant — width only tunes replication, never results). */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("inclusive bounds, overlapping intervals, per-key isolation") {
    val pts = Seq(("a", 10L, "p1"), ("a", 20L, "p2"), ("b", 10L, "p3"))
      .toDF("k", "ts", "pid")
    val ivs = Seq(("a", 10L, 20L, "i1"), ("a", 15L, 25L, "i2"))
      .toDF("k", "s", "e", "iid")
    val out = IntervalJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e", bucketWidth = 7L)
      .select($"pid", $"iid").as[(String, String)].collect().toSet
    // p1 at the start bound of i1; p2 at the end bound of i1 AND inside i2;
    // p3 is key b — no intervals.
    assert(out == Set(("p1", "i1"), ("p2", "i1"), ("p2", "i2")))
  }

  test("negative timestamps bucket correctly (floor, not truncate-toward-zero)") {
    val pts = Seq(("a", -1L, "p1"), ("a", 1L, "p2")).toDF("k", "ts", "pid")
    val ivs = Seq(("a", -5L, -1L, "i1"), ("a", 0L, 5L, "i2")).toDF("k", "s", "e", "iid")
    val out = IntervalJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e", bucketWidth = 10L)
      .select($"pid", $"iid").as[(String, String)].collect().toSet
    assert(out == Set(("p1", "i1"), ("p2", "i2")))
  }

  test("degenerate and inverted intervals") {
    val pts = Seq(("a", 5L, "p1")).toDF("k", "ts", "pid")
    val ivs = Seq(("a", 5L, 5L, "point"), ("a", 9L, 1L, "inverted")).toDF("k", "s", "e", "iid")
    val out = IntervalJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e", bucketWidth = 3L)
      .select($"iid").as[String].collect().toSeq
    assert(out == Seq("point")) // inverted interval is dropped, not exploded
  }

  test("overlap: inclusive touch counts, disjoint does not, exactly-once emission") {
    val a = Seq(("k", 0L, 10L, "a1"), ("k", 20L, 30L, "a2")).toDF("k", "as", "ae", "aid")
    val b = Seq(("k", 10L, 15L, "b1"), ("k", 16L, 19L, "b2"), ("k", 5L, 40L, "b3"))
      .toDF("k", "bs", "be", "bid")
    val out = IntervalJoin.overlap(a, b, Seq("k"), "as", "ae", "bs", "be", bucketWidth = 4L)
      .select($"aid", $"bid").as[(String, String)].collect().toList
    // b3 spans many shared cells with both a's — must still emit once each.
    assert(out.sorted == List(("a1", "b1"), ("a1", "b3"), ("a2", "b3")))
  }

  test("overlap: random parity with the naive theta join, across bucket widths") {
    val rnd  = new Random(9113)
    val keys = Seq("a", "b")
    def ivset(n: Int, tag: String) = (1 to n).map { i =>
      val s = rnd.nextInt(1000).toLong - 200
      (keys(rnd.nextInt(2)), s, s + rnd.nextInt(150), s"$tag$i")
    }
    val l = ivset(150, "l").toDF("k", "ls", "le", "lid")
    val r = ivset(150, "r").toDF("k", "rs", "re", "rid")
    val want = l.join(r, Seq("k")).where($"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").as[(String, String)].collect().toSet
    assert(want.nonEmpty)
    for (w <- Seq(1L, 17L, 128L, 100000L)) {
      val got = IntervalJoin.overlap(l, r, Seq("k"), "ls", "le", "rs", "re", bucketWidth = w)
        .select($"lid", $"rid").as[(String, String)].collect().toList
      assert(got.size == got.toSet.size, s"duplicate pair emitted at bucketWidth=$w")
      assert(got.toSet == want, s"bucketWidth=$w")
    }
  }

  test("medianSpanWidth lands near the median span; degenerate inputs floor at 1") {
    val ivs = Seq(("k", 0L, 10L, "a"), ("k", 0L, 100L, "b"), ("k", 0L, 1000L, "c"),
      ("k", 50L, 40L, "inverted")).toDF("k", "s", "e", "iid")
    val w = IntervalJoin.medianSpanWidth(ivs, "s", "e")
    assert(w >= 10L && w <= 1000L, s"width $w outside the span range")
    // all-zero spans and empty inputs must still return a legal width
    assert(IntervalJoin.medianSpanWidth(
      Seq(("k", 5L, 5L, "p")).toDF("k", "s", "e", "iid"), "s", "e") == 1L)
    assert(IntervalJoin.medianSpanWidth(
      Seq.empty[(String, Long, Long, String)].toDF("k", "s", "e", "iid"), "s", "e") == 1L)
    // zero-width spans carry no tuning signal and must not drag the
    // median to 0 → width 1 (which would explode every wide interval to
    // span-many cells — measured as an OOM on per-hour activity spans
    // where most hours hold one event)
    val mostlyPoints = (1 to 99).map(i => ("k", i.toLong, i.toLong, s"pt$i")) :+
      (("k", 0L, 3600L, "wide"))
    assert(IntervalJoin.medianSpanWidth(mostlyPoints.toDF("k", "s", "e", "iid"), "s", "e") == 3600L)
  }

  test("a bucketWidth orders of magnitude below the span scale fails loudly, not with an OOM") {
    // points must span the interval too - otherwise the point-range clamp
    // already contains the damage
    val pts = Seq(("k", 5L, "p1"), ("k", IntervalJoin.MaxCellsPerInterval * 2L, "p2"))
      .toDF("k", "ts", "pid")
    val ivs = Seq(("k", 0L, IntervalJoin.MaxCellsPerInterval * 2L, "huge")).toDF("k", "s", "e", "iid")
    val e = intercept[Exception] {
      IntervalJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e", bucketWidth = 1L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bucket cells")), s"unexpected failure: $e")
  }

  test("pointInInterval composes stream-static: streaming points, static intervals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ivs = Seq(("k", 10L, 20L, "i1"), ("k", 15L, 25L, "i2")).toDF("k", "s", "e", "iid")
    val mem = MemoryStream[(String, Long, String)]
    val out = IntervalJoin.pointInInterval(
      mem.toDF().toDF("k", "ts", "pid"), ivs, Seq("k"), "ts", "s", "e", bucketWidth = 4L)
    assert(out.isStreaming, "operator must stay streamable for a streaming point side")
    val q = out.writeStream.outputMode("append").format("memory").queryName("iv_stream").start()
    try {
      mem.addData(Seq(("k", 12L, "p1"), ("k", 30L, "p2")))
      q.processAllAvailable()
      mem.addData(Seq(("k", 18L, "p3")))
      q.processAllAvailable()
      val got = spark.sql("select pid, iid from iv_stream")
        .as[(String, String)].collect().toSet
      assert(got == Set(("p1", "i1"), ("p3", "i1"), ("p3", "i2")))
    } finally q.stop()
  }

  test("pathological open-ended spans: sentinel ends clamp to the point range instead of exploding") {
    // an unclamped sequence() over [0, Long.MaxValue-1] cells would fail the
    // job ("too long sequence") — the clamp makes it the points' own span
    val pts = Seq(("k", 10L, "p1"), ("k", 500L, "p2")).toDF("k", "ts", "pid")
    val ivs = Seq(("k", 5L, Long.MaxValue, "open"), ("k", Long.MinValue, 12L, "preexisting"))
      .toDF("k", "s", "e", "iid")
    val out = IntervalJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e", bucketWidth = 7L)
      .select($"pid", $"iid").as[(String, String)].collect().toSet
    assert(out == Set(("p1", "open"), ("p2", "open"), ("p1", "preexisting")))
    // same for overlap: ends clamp at the global max start
    val a = Seq(("k", 0L, Long.MaxValue, "a1")).toDF("k", "as", "ae", "aid")
    val b = Seq(("k", 90L, 95L, "b1"), ("k", Long.MinValue, -5L, "b2")).toDF("k", "bs", "be", "bid")
    val got = IntervalJoin.overlap(a, b, Seq("k"), "as", "ae", "bs", "be", bucketWidth = 8L)
      .select($"aid", $"bid").as[(String, String)].collect().toSet
    assert(got == Set(("a1", "b1")))
  }

  test("left-outer point-in-interval: uncovered points survive with null interval columns") {
    val pts = Seq(("a", 10L, "p1"), ("a", 99L, "p2"), ("b", 10L, "p3"))
      .toDF("k", "ts", "pid")
    val ivs = Seq(("a", 10L, 20L, "i1"), ("a", 5L, 15L, "i2")).toDF("k", "s", "e", "iid")
    val out = IntervalJoin
      .pointInIntervalLeft(pts, ivs, Seq("k"), "pid", "ts", "s", "e", bucketWidth = 7L)
      .select($"pid", $"iid").as[(String, Option[String])].collect().toList.sorted
    // p1 in both intervals (two rows); p2 and p3 uncovered but preserved
    assert(out == List(("p1", Some("i1")), ("p1", Some("i2")), ("p2", None), ("p3", None)))
  }

  test("left-outer: a NULL id that matches does not re-emit as a spurious unmatched row") {
    // the anti join must be null-safe: under plain equality NULL never
    // equals NULL, so the matched NULL-id point would ALSO null-extend —
    // a naive LEFT join gains a duplicate row after rewrite. The rewrite
    // rules feed the id from an Aggregate's grouping attribute, whose one
    // NULL group is a legitimate id value.
    val pts = Seq((Some("p1"), "a", 10L), (None: Option[String], "a", 12L))
      .toDF("pid", "k", "ts")
    val ivs = Seq(("a", 5L, 15L, "i1")).toDF("k", "s", "e", "iid")
    val out = IntervalJoin
      .pointInIntervalLeft(pts, ivs, Seq("k"), "pid", "ts", "s", "e", bucketWidth = 7L)
      .select($"pid", $"iid").as[(Option[String], Option[String])].collect().toList
    assert(out.sortBy(_.toString) ==
      List((None, Some("i1")), (Some("p1"), Some("i1"))).sortBy(_.toString))
    // and a NULL id that does NOT match still null-extends exactly once
    val far = Seq((None: Option[String], "a", 999L)).toDF("pid", "k", "ts")
    val un = IntervalJoin
      .pointInIntervalLeft(far, ivs, Seq("k"), "pid", "ts", "s", "e", bucketWidth = 7L)
      .select($"pid", $"iid").as[(Option[String], Option[String])].collect().toList
    assert(un == List((None, None)))
    // overlapLeft shares the anti join — same guarantee
    val l = Seq((None: Option[String], "a", 8L, 14L)).toDF("lid", "k", "ls", "le")
    val r = Seq(("a", 10L, 20L, "r1")).toDF("k", "rs", "re", "rid")
    val ov = IntervalJoin
      .overlapLeft(l, r, Seq("k"), "lid", "ls", "le", "rs", "re", bucketWidth = 7L)
      .select($"lid", $"rid").as[(Option[String], Option[String])].collect().toList
    assert(ov == List((None, Some("r1"))))
  }

  test("left-outer parity with the naive LEFT theta join, across bucket widths") {
    val rnd  = new Random(9119)
    val keys = Seq("a", "b", "c")
    val P = (1 to 300).map(i => (keys(rnd.nextInt(3)), rnd.nextInt(2000).toLong - 500, s"p$i"))
    val I = (1 to 80).map { i =>
      val s = rnd.nextInt(2000).toLong - 500
      (keys(rnd.nextInt(3)), s, s + rnd.nextInt(120), s"i$i")
    }
    val pts = P.toDF("k", "ts", "pid")
    val ivs = I.toDF("k", "s", "e", "iid")
    val want = pts.as("p").join(ivs.as("i"),
        $"p.k" === $"i.k" && $"s" <= $"ts" && $"ts" <= $"e", "left")
      .select($"pid", $"iid").as[(String, Option[String])].collect().toSet
    for (w <- Seq(1L, 13L, 100000L)) {
      val got = IntervalJoin
        .pointInIntervalLeft(pts, ivs, Seq("k"), "pid", "ts", "s", "e", bucketWidth = w)
        .select($"pid", $"iid").as[(String, Option[String])].collect().toSet
      assert(got == want, s"bucketWidth=$w")
    }
  }

  test("left-outer innerFilter: join-condition semantics, not a post-filter") {
    val pts = Seq(("a", 10L, "p1"), ("a", 12L, "p2")).toDF("k", "ts", "pid")
    val ivs = Seq(("a", 5L, 15L, "even"), ("a", 9L, 13L, "odd")).toDF("k", "s", "e", "iid")
    // candidates whose iid fails the predicate don't just drop — the
    // point null-extends when NO candidate passes (p2 matches both
    // intervals but only 'odd' passes; with iid='none' nothing passes)
    val out = IntervalJoin
      .pointInIntervalLeft(pts, ivs, Seq("k"), "pid", "ts", "s", "e", bucketWidth = 7L,
        innerFilter = Some($"iid" === "odd"))
      .select($"pid", $"iid").as[(String, Option[String])].collect().toSet
    assert(out == Set(("p1", Some("odd")), ("p2", Some("odd"))))
    val none = IntervalJoin
      .pointInIntervalLeft(pts, ivs, Seq("k"), "pid", "ts", "s", "e", bucketWidth = 7L,
        innerFilter = Some($"iid" === "nope"))
      .select($"pid", $"iid").as[(String, Option[String])].collect().toSet
    assert(none == Set(("p1", None), ("p2", None)),
      "innerFilter must null-extend filtered-out points, not drop them")
  }

  test("pointInIntervalRight: parity with the naive interval-preserved LEFT theta join") {
    val rnd  = new Random(2026)
    val keys = Seq("a", "b", "c")
    val P = (1 to 300).map(i => (keys(rnd.nextInt(3)), rnd.nextInt(2000).toLong - 500, s"p$i"))
    val I = (1 to 80).map { i =>
      val s = rnd.nextInt(2000).toLong - 500
      // ~10% malformed (inverted) intervals: naive LEFT preserves them
      val e = if (rnd.nextDouble() < 0.1) s - 5 else s + rnd.nextInt(120)
      (keys(rnd.nextInt(3)), s, e, s"i$i")
    }
    val pts = P.toDF("k", "ts", "pid")
    val ivs = I.toDF("k", "s", "e", "iid")
    val want = ivs.as("i").join(pts.as("p"),
        $"i.k" === $"p.k" && $"s" <= $"ts" && $"ts" <= $"e", "left")
      .select($"iid", $"pid").as[(String, Option[String])].collect().toSet
    for (w <- Seq(1L, 13L, 100000L)) {
      val got = IntervalJoin
        .pointInIntervalRight(pts, ivs, Seq("k"), "iid", "ts", "s", "e", bucketWidth = w)
        .select($"iid", $"pid").as[(String, Option[String])].collect().toSet
      assert(got == want, s"bucketWidth=$w")
    }
    // innerFilter: join-condition semantics — an interval whose every
    // candidate fails it null-extends instead of dropping
    val fpts = Seq(("a", 10L, "p1")).toDF("k", "ts", "pid")
    val fivs = Seq(("a", 5L, 15L, "i1"), ("a", 8L, 12L, "i2")).toDF("k", "s", "e", "iid")
    val out = IntervalJoin
      .pointInIntervalRight(fpts, fivs, Seq("k"), "iid", "ts", "s", "e", bucketWidth = 7L,
        innerFilter = Some($"iid" === "i2"))
      .select($"iid", $"pid").as[(String, Option[String])].collect().toSet
    assert(out == Set(("i1", None), ("i2", Some("p1"))))
    // NULL interval id: null-safe anti join, no spurious duplicate
    val nivs = Seq((Some("a"), "a", 5L, 15L), (None: Option[String], "a", 8L, 12L))
      .toDF("iid", "k", "s", "e")
    val nout = IntervalJoin
      .pointInIntervalRight(fpts, nivs, Seq("k"), "iid", "ts", "s", "e", bucketWidth = 7L)
      .select($"iid", $"pid").as[(Option[String], Option[String])].collect().toList
    assert(nout.size == 2 && nout.forall(_._2.contains("p1")))
  }

  test("overlapLeft: parity with the naive LEFT theta join; malformed left rows preserved") {
    val rnd = new Random(3311)
    val keys = Seq("a", "b", "c")
    val L = (1 to 120).map { i =>
      val s = rnd.nextInt(1000).toLong
      (keys(rnd.nextInt(3)), s, s + rnd.nextInt(50), s"l$i")
    }
    val R = (1 to 60).map { i =>
      val s = rnd.nextInt(1000).toLong
      (keys(rnd.nextInt(3)), s, s + rnd.nextInt(50), s"r$i")
    }
    val l = L.toDF("k", "ls", "le", "lid")
    val r = R.toDF("k", "rs", "re", "rid")
    val want = l.as("l").join(r.as("r"),
        $"l.k" === $"r.k" && $"ls" <= $"re" && $"rs" <= $"le", "left")
      .select($"lid", $"rid").as[(String, Option[String])].collect().toSet
    for (w <- Seq(1L, 17L, 100000L)) {
      val got = IntervalJoin
        .overlapLeft(l, r, Seq("k"), "lid", "ls", "le", "rs", "re", bucketWidth = w)
        .select($"lid", $"rid").as[(String, Option[String])].collect().toSet
      assert(got == want, s"bucketWidth=$w")
    }
    // a malformed left interval matches nothing but survives null-extended
    val withBad = l.unionByName(Seq(("a", 50L, 10L, "bad")).toDF("k", "ls", "le", "lid"))
    val gotBad = IntervalJoin
      .overlapLeft(withBad, r, Seq("k"), "lid", "ls", "le", "rs", "re", bucketWidth = 17L)
      .filter($"lid" === "bad")
      .select($"lid", $"rid").as[(String, Option[String])].collect().toSet
    assert(gotBad == Set(("bad", None)))
    // innerFilter: join-condition semantics (null-extends, never drops)
    val filtered = IntervalJoin
      .overlapLeft(l, r, Seq("k"), "lid", "ls", "le", "rs", "re", bucketWidth = 17L,
        innerFilter = Some($"rid" === "nope"))
      .select($"lid", $"rid").as[(String, Option[String])].collect().toSet
    assert(filtered == L.map(x => (x._4, None: Option[String])).toSet)
  }

  test("guards: reserved __ columns and out-of-range widths fail loudly") {
    val pts = Seq(("a", 10L, "p1")).toDF("k", "ts", "__pid")
    val ivs = Seq(("a", 10L, 20L, "i1")).toDF("k", "s", "e", "iid")
    val okPts = Seq(("a", 10L, "p1")).toDF("k", "ts", "pid")
    assert(intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e", 7L)
    }.getMessage.contains("reserved '__' prefix"))
    assert(intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(okPts, ivs, Seq("k"), "ts", "s", "e", Long.MaxValue / 2 + 1)
    }.getMessage.contains("floorDiv"))
    assert(intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(okPts, ivs, Seq("k"), "ts", "s", "e", 0L)
    }.getMessage.contains("bucketWidth"))
  }

  test("random parity with the naive theta join, across bucket widths") {
    val rnd  = new Random(9111)
    val keys = Seq("a", "b", "c")
    val P = (1 to 500).map(i => (keys(rnd.nextInt(3)), rnd.nextInt(2000).toLong - 500, s"p$i"))
    val I = (1 to 120).map { i =>
      val s = rnd.nextInt(2000).toLong - 500
      (keys(rnd.nextInt(3)), s, s + rnd.nextInt(120), s"i$i")
    }
    val pts = P.toDF("k", "ts", "pid")
    val ivs = I.toDF("k", "s", "e", "iid")
    val want = pts.join(ivs, Seq("k")).where($"s" <= $"ts" && $"ts" <= $"e")
      .select($"pid", $"iid").as[(String, String)].collect().toSet
    assert(want.nonEmpty)
    for (w <- Seq(1L, 13L, 64L, 100000L)) {
      val got = IntervalJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e", bucketWidth = w)
        .select($"pid", $"iid").as[(String, String)].collect().toSet
      assert(got == want, s"bucketWidth=$w")
    }
  }
}
