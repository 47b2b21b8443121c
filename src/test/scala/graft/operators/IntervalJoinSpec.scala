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
