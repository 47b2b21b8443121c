package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** As-of join semantics: hand-built cases for every flag, plus random
  * parity against the naive inequality-join + argmax formulation (the
  * definitionally-correct but quadratic plan the operator replaces). */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def left(rows: (String, Long, String)*): DataFrame =
    rows.toDF("k", "lts", "lid")
  private def right(rows: (String, Long, String)*): DataFrame =
    rows.toDF("k", "rts", "rid")

  test("backward inclusive: latest right at-or-before each left") {
    val out = AsOfJoin
      .backward(left(("a", 10L, "l1"), ("a", 20L, "l2")), right(("a", 10L, "r1"), ("a", 15L, "r2"), ("a", 25L, "r3")),
        Seq("k"), "lts", "rts")
      .select($"lid", $"rid").as[(String, String)].collect().toMap
    assert(out == Map("l1" -> "r1", "l2" -> "r2"))
  }

  test("backward strict excludes the equal-ts right row") {
    val out = AsOfJoin
      .backward(left(("a", 10L, "l1")), right(("a", 10L, "r1"), ("a", 5L, "r0")),
        Seq("k"), "lts", "rts", strict = true)
      .select($"rid").as[String].collect()
    assert(out.toSeq == Seq("r0"))
  }

  test("forward inclusive picks the earliest right at-or-after") {
    val out = AsOfJoin
      .forward(left(("a", 10L, "l1")), right(("a", 10L, "r1"), ("a", 12L, "r2")),
        Seq("k"), "lts", "rts")
      .select($"rid").as[String].collect()
    assert(out.toSeq == Seq("r1"))
    val strictOut = AsOfJoin
      .forward(left(("a", 10L, "l1")), right(("a", 10L, "r1"), ("a", 12L, "r2")),
        Seq("k"), "lts", "rts", strict = true)
      .select($"rid").as[String].collect()
    assert(strictOut.toSeq == Seq("r2"))
  }

  test("tolerance turns far matches into no-match; inner drops, left keeps nulls") {
    val l = left(("a", 100L, "l1"), ("a", 200L, "l2"))
    val r = right(("a", 95L, "r1"), ("a", 120L, "r2"))
    val inner = AsOfJoin.backward(l, r, Seq("k"), "lts", "rts", tolerance = Some(10L))
      .select($"lid", $"rid").as[(String, String)].collect().toMap
    assert(inner == Map("l1" -> "r1")) // l2's nearest (r2) is 80 away — dropped
    val outer = AsOfJoin.backward(l, r, Seq("k"), "lts", "rts", tolerance = Some(10L), joinType = "left")
    assert(outer.count() == 2)
    assert(outer.filter($"rid".isNull).select($"lid").as[String].collect().toSeq == Seq("l2"))
  }

  test("unmatched lefts: inner drops, left keeps with null right columns") {
    val l = left(("a", 5L, "l1"), ("b", 10L, "l2"))
    val r = right(("a", 7L, "r1"))
    assert(AsOfJoin.backward(l, r, Seq("k"), "lts", "rts").count() == 0)
    val keep = AsOfJoin.backward(l, r, Seq("k"), "lts", "rts", joinType = "left")
    assert(keep.count() == 2)
    assert(keep.filter($"rid".isNotNull).count() == 0)
  }

  test("equal-ts right rows: greatest tiebreak wins, both directions") {
    val r = right(("a", 10L, "rA"), ("a", 10L, "rB"))
    val back = AsOfJoin.backward(left(("a", 15L, "l1")), r, Seq("k"), "lts", "rts", tiebreak = Seq("rid"))
      .select($"rid").as[String].collect()
    assert(back.toSeq == Seq("rB"))
    val fwd = AsOfJoin.forward(left(("a", 5L, "l1")), r, Seq("k"), "lts", "rts", tiebreak = Seq("rid"))
      .select($"rid").as[String].collect()
    assert(fwd.toSeq == Seq("rB"))
  }

  test("null timestamps: null right ts never matches, null left ts matches nothing") {
    val l = Seq(("a", Some(10L), "l1"), ("a", None, "l2"))
      .toDF("k", "lts", "lid")
    val r = Seq(("a", Some(5L), "r1"), ("a", None, "r2"))
      .toDF("k", "rts", "rid")
    val out = AsOfJoin.backward(l, r, Seq("k"), "lts", "rts", joinType = "left")
      .select($"lid", $"rid").as[(String, Option[String])].collect().toMap
    assert(out == Map("l1" -> Some("r1"), "l2" -> None))
  }

  test("backwardChunked: random parity with backward across chunk widths and flags") {
    val rnd  = new Random(9116)
    // one deliberately hot key — the case the chunking exists for
    val keyPool = Seq("hot", "hot", "hot", "hot", "a", "b")
    val L = (1 to 500).map(i => (keyPool(rnd.nextInt(6)), rnd.nextInt(2000).toLong, s"l$i"))
    val R = (1 to 400).map(i => (keyPool(rnd.nextInt(6)), rnd.nextInt(2000).toLong, s"r$i"))
    val l = L.toDF("k", "lts", "lid")
    val r = R.toDF("k", "rts", "rid")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"lid", $"rid").as[(String, Option[String])].collect().toMap

    for {
      w        <- Seq(1L, 37L, 256L, 100000L)
      strict   <- Seq(false, true)
      joinType <- Seq("inner", "left")
    } {
      val want = rows(AsOfJoin.backward(l, r, Seq("k"), "lts", "rts",
        strict = strict, joinType = joinType, tiebreak = Seq("rid")))
      val got = rows(AsOfJoin.backwardChunked(l, r, Seq("k"), "lts", "rts", chunkWidth = w,
        strict = strict, joinType = joinType, tiebreak = Seq("rid")))
      assert(got == want, s"chunkWidth=$w strict=$strict joinType=$joinType")
    }
    // tolerance path
    val wantTol = rows(AsOfJoin.backward(l, r, Seq("k"), "lts", "rts",
      tolerance = Some(25L), joinType = "left", tiebreak = Seq("rid")))
    val gotTol = rows(AsOfJoin.backwardChunked(l, r, Seq("k"), "lts", "rts", chunkWidth = 64L,
      tolerance = Some(25L), joinType = "left", tiebreak = Seq("rid")))
    assert(gotTol == wantTol)
  }

  test("forwardChunked: random parity with forward, ts columns restored intact") {
    val rnd  = new Random(9117)
    val keyPool = Seq("hot", "hot", "hot", "a", "b")
    val L = (1 to 300).map(i => (keyPool(rnd.nextInt(5)), rnd.nextInt(1500).toLong, s"l$i"))
    val R = (1 to 250).map(i => (keyPool(rnd.nextInt(5)), rnd.nextInt(1500).toLong, s"r$i"))
    val l = L.toDF("k", "lts", "lid")
    val r = R.toDF("k", "rts", "rid")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"lid", $"lts", $"rid", $"rts")
        .as[(String, Long, Option[String], Option[Long])].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    for (w <- Seq(1L, 41L, 100000L); strict <- Seq(false, true)) {
      val want = rows(AsOfJoin.forward(l, r, Seq("k"), "lts", "rts",
        strict = strict, joinType = "left", tiebreak = Seq("rid")))
      val got = rows(AsOfJoin.forwardChunked(l, r, Seq("k"), "lts", "rts", chunkWidth = w,
        strict = strict, joinType = "left", tiebreak = Seq("rid")))
      assert(got == want, s"chunkWidth=$w strict=$strict")
    }
  }

  test("random parity with the naive inequality-join + argmax formulation") {
    val rnd  = new Random(9110)
    val keys = Seq("a", "b", "c", "d")
    val L = (1 to 400).map(i => (keys(rnd.nextInt(4)), rnd.nextInt(1000).toLong, s"l$i"))
    val R = (1 to 300).map(i => (keys(rnd.nextInt(4)), rnd.nextInt(1000).toLong, s"r$i"))
    val l = L.toDF("k", "lts", "lid")
    // Make right unique per (k, ts) so argmax is deterministic without a
    // payload tiebreak (mirrors the q110 pre-aggregation contract).
    val r = R.toDF("k", "rts", "rid").groupBy($"k", $"rts").agg(max($"rid").as("rid"))

    for (forward <- Seq(false, true); strict <- Seq(false, true)) {
      val got = AsOfJoin
        .asof(l, r, Seq("k"), "lts", "rts", forward, strict, None, "inner", Nil)
        .select($"lid", $"rid").as[(String, String)].collect().toMap
      val cmp  = (lt: Long, rt: Long) =>
        if (forward) { if (strict) rt > lt else rt >= lt }
        else { if (strict) rt < lt else rt <= lt }
      val rMap = r.as[(String, Long, String)].collect().groupBy(_._1)
      val want = L.flatMap { case (k, lt, lid) =>
        val c = rMap.getOrElse(k, Array.empty).filter(t => cmp(lt, t._2))
        if (c.isEmpty) None
        else {
          val best = if (forward) c.minBy(_._2) else c.maxBy(_._2)
          Some(lid -> best._3)
        }
      }.toMap
      assert(got == want, s"forward=$forward strict=$strict")
    }
  }

  test("guards: reserved __ columns rejected; forwardChunked fails loudly on Long.MinValue ts") {
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.backward(
        Seq(("a", 1L, "x")).toDF("k", "lts", "__lid"), right(("a", 1L, "r")),
        Seq("k"), "lts", "rts")
    }.getMessage.contains("reserved '__' prefix"))
    // Long.MinValue cannot be negated: the chunk assignment would silently
    // corrupt, so the row raises instead.
    val ex = intercept[Exception] {
      AsOfJoin.forwardChunked(
        left(("a", Long.MinValue, "l1")), right(("a", 5L, "r1")),
        Seq("k"), "lts", "rts", chunkWidth = 10L).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("cannot be negated"), msgs(ex))
  }
}
