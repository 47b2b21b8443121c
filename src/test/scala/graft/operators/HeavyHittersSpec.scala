package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.agg.MisraGriesAgg
import scala.util.Random

/** Misra–Gries guarantees (unit-level, driving the Aggregator directly)
  * and the exactness of the sketch-prune-then-verify heavy hitters. */
class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Zipf-ish random stream: item i drawn with weight 1/(i+1). */
  private def zipfStream(n: Int, universe: Int, seed: Int): Seq[String] = {
    val rnd     = new Random(seed)
    val weights = (0 until universe).map(i => 1.0 / (i + 1))
    val total   = weights.sum
    val cum     = weights.scanLeft(0.0)(_ + _).tail
    (1 to n).map { _ =>
      val x = rnd.nextDouble() * total
      s"w${cum.indexWhere(_ >= x)}"
    }
  }

  test("MG guarantee: every item above n/(k+1) survives; bounds hold (single buffer)") {
    for (seed <- 1 to 5; k <- Seq(8, 32)) {
      val stream = zipfStream(5000, 200, seed)
      val truth  = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val agg    = MisraGriesAgg(k)
      val s      = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
      assert(s.n == stream.size)
      assert(s.err <= stream.size / (k + 1), s"err ${s.err} exceeds n/(k+1)")
      val est = s.entries.map(e => e.item -> e.count).toMap
      truth.foreach { case (item, cnt) =>
        if (cnt > stream.size.toLong / (k + 1))
          assert(est.contains(item), s"heavy item $item (cnt=$cnt) missing, k=$k seed=$seed")
      }
      est.foreach { case (item, c) =>
        val t = truth(item)
        assert(c <= t && t <= c + s.err, s"bounds violated for $item: est=$c true=$t err=${s.err}")
      }
    }
  }

  test("MG merge of partitioned buffers keeps the guarantees") {
    val k      = 16
    val stream = zipfStream(8000, 300, 42)
    val truth  = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg    = MisraGriesAgg(k)
    val merged = stream.grouped(977) // uneven partitions
      .map(part => part.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val s = agg.finish(merged)
    assert(s.entries.size <= k)
    assert(s.n == stream.size)
    val est = s.entries.map(e => e.item -> e.count).toMap
    truth.foreach { case (item, cnt) =>
      if (cnt > stream.size.toLong / (k + 1)) assert(est.contains(item))
    }
    est.foreach { case (item, c) =>
      val t = truth(item)
      assert(c <= t && t <= c + s.err)
    }
  }

  test("HeavyHitters.exact equals the exhaustive groupBy, k far below distinct count") {
    val stream = zipfStream(20000, 2000, 7) // ~1k+ distinct, k=63 forces pruning
    val df     = stream.toDF("item")
    val phiPpm = 20000L // 2% — needs k+1 >= 50
    val got = HeavyHitters.exact(df, $"item", phiPpm = phiPpm, k = 63)
      .select($"item", $"cnt", $"ppm").as[(String, Long, Long)].collect().toSet
    val n = stream.size.toLong
    val want = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 1000000L > n * phiPpm }
      .map { case (i, c) => (i, c, c * 1000000L / n) }.toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("exactPerGroup equals the exhaustive per-group groupBy; groups isolated") {
    val rnd = new Random(11)
    // group g0: heavy skew; g1: different heavy items; g2: uniform (no HH)
    val stream =
      (1 to 6000).map(_ => ("g0", if (rnd.nextDouble() < 0.6) s"a${rnd.nextInt(5)}" else s"x${rnd.nextInt(500)}")) ++
      (1 to 4000).map(_ => ("g1", if (rnd.nextDouble() < 0.5) s"b${rnd.nextInt(3)}" else s"y${rnd.nextInt(500)}")) ++
      (1 to 2000).map(_ => ("g2", s"z${rnd.nextInt(800)}"))
    val df     = stream.toDF("g", "item")
    val phiPpm = 20000L
    val got = HeavyHitters.exactPerGroup(df, Seq("g"), $"item", phiPpm = phiPpm, k = 63)
      .select($"g", $"item", $"cnt", $"ppm").as[(String, String, Long, Long)].collect().toSet
    val want = stream.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, i), c) => (g, i, c) }
      .groupBy(_._1).flatMap { case (g, rows) =>
        val n = rows.map(_._3).sum
        rows.filter(r => r._3 * 1000000L > n * phiPpm)
          .map(r => (g, r._2, r._3, r._3 * 1000000L / n))
      }.toSet
    assert(want.exists(_._1 == "g0") && want.exists(_._1 == "g1"))
    assert(!want.exists(_._1 == "g2"))
    assert(got == want)
  }

  test("exactPerGroup above the broadcast ceiling: identical results via the shuffle semi-join") {
    val rnd = new Random(12)
    val stream =
      (1 to 3000).map(_ => ("g0", if (rnd.nextDouble() < 0.6) s"a${rnd.nextInt(4)}" else s"x${rnd.nextInt(400)}")) ++
      (1 to 2000).map(_ => ("g1", if (rnd.nextDouble() < 0.5) s"b${rnd.nextInt(3)}" else s"y${rnd.nextInt(400)}"))
    val df     = stream.toDF("g", "item")
    val phiPpm = 30000L
    def run() = HeavyHitters.exactPerGroup(df, Seq("g"), $"item", phiPpm = phiPpm, k = 63)
    val want = run().select($"g", $"item", $"cnt", $"ppm")
      .as[(String, String, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1") // force the fallback
      val fb = run()
      val got = fb.select($"g", $"item", $"cnt", $"ppm")
        .as[(String, String, Long, Long)].collect().toSet
      assert(got == want, "shuffle fallback diverged from the broadcast path")
      assert(!fb.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "verify join still broadcast despite a 1-byte ceiling")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("phi below the guarantee line is rejected loudly") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(Seq("a").toDF("item"), $"item", phiPpm = 10L, k = 63)
    }
  }

  test("any string is a legal item — including ones that look like internal fields") {
    // An earlier formulation kept err/n under magic map keys; these items
    // would have corrupted the summary. Pin that every string is data.
    val weird  = Seq(" __mg_err", " __mg_n", "", " ", "__mg_err")
    val stream = weird.flatMap(w => Seq.fill(50)(w)) ++ (1 to 100).map(i => s"rare$i")
    val agg    = MisraGriesAgg(8)
    val s      = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    assert(s.n == stream.size)
    assert(s.err <= stream.size / 9)
    weird.foreach { w =>
      val e = s.entries.find(_.item == w)
      assert(e.isDefined, s"heavy item '$w' evicted")
      assert(e.get.count <= 50L && 50L <= e.get.count + s.err)
    }
    val got = HeavyHitters.exact(stream.toDF("item"), $"item", phiPpm = 130000L, k = 63)
      .select($"item", $"cnt").as[(String, Long)].collect().toMap
    assert(got == weird.map(_ -> 50L).toMap)
  }

  test("empty input yields an empty result, not a failure") {
    val out = HeavyHitters.exact(Seq.empty[String].toDF("item"), $"item", phiPpm = 1000L, k = 4095)
    assert(out.count() == 0)
  }
}
