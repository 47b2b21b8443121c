package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin
import graft.plans.{AsOfRewriteRule, IntervalRewriteRule, PlanStats}

/** Scratch 10x scaling smoke for the RELATIONAL family (not part of the
  * driver contract; safe to delete) — the ProfScale discipline applied to
  * the round-10/11 operators and rewrite rules:
  *
  *  1. Naive-vs-rewritten separation under scale: the 16-hot-key as-of
  *     pair at 1x (sf0.01 events) and 10x. The naive intermediate is
  *     quadratic per key, so 10x data on FIXED keys should widen the gap
  *     ~10x (naive ~100x, rewritten ~10x); this is the measured proof
  *     that the rescue matters MORE as data grows.
  *  2. Interval-family linearity: pointInInterval / pointInIntervalLeft /
  *     overlap on events with per-copy-SHIFTED keys (density constant),
  *     expecting ~10x time at 10x rows — any superlinearity is a plan
  *     bug the sf ladder can't see.
  *  3. Optimization-time statistics at 10x: the density gate's two
  *     cached jobs plus the width statistic, measured as the wall time of
  *     one cold `optimizedPlan` of the naive query in `auto` mode — the
  *     cost every matching query pays ONCE per canonical plan; must stay
  *     sub-second.
  */
object ProfScaleRelOps {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    AsOfRewriteRule.ensure(spark); IntervalRewriteRule.ensure(spark)
    import spark.implicits._

    val raw = spark.read.parquet(s"$dir/events.parquet")
    val e1 = raw
      .withColumn("ts_us", graft.sources.Tables.tsToMicros(raw, "ts"))
      .select($"user_id", $"event_id", $"event_type", $"ts_us")
      .localCheckpoint()
    // 10x with SHIFTED users (constant per-key density — plan scaling)
    val e10shift = (0 until 10).map { c =>
      e1.select(($"user_id" + lit(c.toLong * 10000000L)).as("user_id"),
        $"event_id", $"event_type", $"ts_us")
    }.reduce(_.unionByName(_)).localCheckpoint()
    // 10x keeping the SAME keys (density x10 — separation growth); ts
    // micro-shifted per copy so BOTH sides' per-key row counts scale
    // (the version side groups by (key, ts) — identical ts would collapse)
    val e10same = (0 until 10).map { c =>
      e1.select($"user_id", ($"event_id" + lit(c.toLong * 1000000000L)).as("event_id"),
        $"event_type", ($"ts_us" + lit(c.toLong)).as("ts_us"))
    }.reduce(_.unionByName(_)).localCheckpoint()
    println(s"events 1x=${e1.count()} 10x=${e10shift.count()}")

    def timeIt(f: () => Long): Double = {
      f(); val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // single run, no warm — for the quadratic side at 10x, where the job
    // itself is minutes and a warm-up pass would double the wait
    def timeOnce(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    // ---- 1. separation growth on 16 fixed hot keys ----
    def hotSides(e: DataFrame): (DataFrame, DataFrame) = {
      val k = pmod($"user_id", lit(16))
      val clicks = e.filter($"event_type" === "click")
        .groupBy(k.as("ck"), $"ts_us".as("rts")).agg(max($"event_id").as("click_id"))
        .localCheckpoint()
      val purchases = e.filter($"event_type" === "purchase")
        .select(k.as("k"), $"event_id".as("purchase_id"), $"ts_us".as("lts"))
        .localCheckpoint()
      (purchases, clicks)
    }
    def naiveAsof(p: DataFrame, c: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      p.join(c, $"k" === $"ck" && $"rts" <= $"lts")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"k", $"purchase_id", $"lts").orderBy($"rts".desc)))
        .filter($"rn" === 1)
    }
    for ((label, e, once) <- Seq(("1x ", e1, false), ("10x", e10same, true))) {
      val (p, c) = hotSides(e)
      spark.conf.set(AsOfRewriteRule.ConfKey, "false")
      val tN = if (once) timeOnce(() => naiveAsof(p, c).count())
               else timeIt(() => naiveAsof(p, c).count())
      spark.conf.set(AsOfRewriteRule.ConfKey, "force")
      val tR = timeIt(() => naiveAsof(p, c).count())
      spark.conf.unset(AsOfRewriteRule.ConfKey)
      println(f"asof-hot16 $label  naive=$tN%7.2f s  rewritten=$tR%7.2f s  separation=${tN / tR}%5.1fx")
    }

    // ---- 2. interval-family linearity at constant density ----
    def ivSides(e: DataFrame): (DataFrame, DataFrame) = {
      val pts = e.select($"user_id".as("k"), $"event_id", $"ts_us").localCheckpoint()
      val iv = e.groupBy($"user_id".as("ik"), floor($"ts_us" / (3600L * 1000000L)).as("hr"))
        .agg(min($"ts_us").as("s"), max($"ts_us").as("e"), count(lit(1)).as("n"))
        .drop("hr").localCheckpoint()
      (pts, iv)
    }
    val widths = scala.collection.mutable.Map.empty[String, Long]
    for ((label, e) <- Seq(("1x ", e1), ("10x", e10shift))) {
      val (pts, iv) = ivSides(e)
      val w = IntervalJoin.medianSpanWidth(iv, "s", "e")
      widths(label) = w
      val tPI = timeIt(() => IntervalJoin.pointInInterval(
        pts, iv.withColumnRenamed("ik", "k"), Seq("k"), "ts_us", "s", "e", w).count())
      val tPL = timeIt(() => IntervalJoin.pointInIntervalLeft(
        pts, iv.withColumnRenamed("ik", "k"), Seq("k"), "event_id", "ts_us", "s", "e", w).count())
      val l = iv.select($"ik".as("k"), $"s".as("as"), $"e".as("ae"), $"n".as("an"))
      val r = iv.select($"ik".as("k"), $"s".as("bs"), $"e".as("be"), $"n".as("bn"))
      val tOV = timeIt(() => IntervalJoin.overlap(
        l, r, Seq("k"), "as", "ae", "bs", "be", w).count())
      println(f"interval   $label  pointIn=$tPI%7.2f s  left=$tPL%7.2f s  overlap=$tOV%7.2f s")
    }

    // ---- 3. optimization-time statistics at 10x (cold cache) ----
    val (pts10, iv10) = ivSides(e10shift)
    def naiveIv() = pts10.join(iv10, $"k" === $"ik" && $"s" <= $"ts_us" && $"ts_us" <= $"e")
    PlanStats.clearCache()
    val t0 = System.nanoTime()
    naiveIv().queryExecution.optimizedPlan
    val tCold = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    naiveIv().queryExecution.optimizedPlan
    val tWarm = (System.nanoTime() - t1) / 1e9
    println(f"opt-time   10x  cold=$tCold%6.2f s (gate jobs + width)  warm=$tWarm%6.2f s (cached)")
    spark.stop()
  }
}
