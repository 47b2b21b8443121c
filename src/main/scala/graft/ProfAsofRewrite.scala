package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.AsOfRewriteRule

/** Scratch profiler (not part of the driver contract; safe to delete):
  * the payoff of [[graft.plans.AsOfRewriteRule]] — the naive
  * inequality-join + rank-1 plan vs the same query with the rewrite on,
  * vs calling [[AsOfJoin.backward]] directly. Two key densities: the
  * q110 shape (user_id keys, ~13 x 13 rows/key) and a density-ramped
  * variant (user_id % 16, ~1.2k x 1.2k rows/key) where the naive plan's
  * O(|L|x|R|/keys) intermediate actually bites. */
object ProfAsofRewrite {
  def main(args: Array[String]): Unit = {
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
    import spark.implicits._

    val raw = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val e = raw
      .withColumn("ts_us", graft.sources.Tables.tsToMicros(raw, "ts"))
      .localCheckpoint()

    def sides(keyExpr: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
      val clicks = e.filter($"event_type" === "click")
        .groupBy(keyExpr.as("k"), $"ts_us".as("rts"))
        .agg(max($"event_id").as("click_id"))
        .localCheckpoint()
      val purchases = e.filter($"event_type" === "purchase")
        .select(keyExpr.as("k"), $"event_id".as("purchase_id"), $"ts_us".as("lts"))
        .localCheckpoint()
      (purchases, clicks)
    }

    def naive(p: DataFrame, c: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      p.join(c.withColumnRenamed("k", "ck"), $"k" === $"ck" && $"rts" <= $"lts")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"k", $"purchase_id", $"lts").orderBy($"rts".desc)))
        .filter($"rn" === 1)
        .select($"k", $"purchase_id", $"lts", $"click_id", $"rts")
    }

    def timeIt(mk: () => DataFrame): Double = {
      mk().count() // warm
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }.min
    }

    for ((label, keyExpr) <- Seq(
        ("user_id keys (q110 shape)", $"user_id"),
        ("user_id % 16 (hot keys)  ", pmod($"user_id", lit(16)))) ) {
      val (p, c) = sides(keyExpr)
      val inter = p.join(c.withColumnRenamed("k", "ck"), $"k" === $"ck" && $"rts" <= $"lts").count()
      spark.conf.set(AsOfRewriteRule.ConfKey, "false")
      val tNaive = timeIt(() => naive(p, c))
      spark.conf.set(AsOfRewriteRule.ConfKey, "force")
      val tRewrite = timeIt(() => naive(p, c))
      // the DEFAULT path: density-gated auto — expect ~naive at sparse
      // keys (gate declines; stats cached after the first optimization)
      // and ~rewritten at hot keys (gate fires)
      spark.conf.unset(AsOfRewriteRule.ConfKey)
      val tAuto = timeIt(() => naive(p, c))
      spark.conf.set(AsOfRewriteRule.ConfKey, "false")
      val tDirect = timeIt(() =>
        AsOfJoin.backward(p, c, Seq("k"), "lts", "rts")
          .select($"k", $"purchase_id", $"lts", $"click_id", $"rts"))
      println(f"as-of    $label  naive-intermediate=$inter%10d  naive=$tNaive%6.2f s  rewritten=$tRewrite%6.2f s  auto=$tAuto%6.2f s  direct=$tDirect%6.2f s")
    }

    // interval rewrite: points-in-sessions at the same two key densities.
    // Intervals = per-(key, hour) activity spans; points = all events.
    for ((label, keyExpr) <- Seq(
        ("user_id keys            ", $"user_id"),
        ("user_id % 16 (hot keys)  ", pmod($"user_id", lit(16)))) ) {
      val pts = e.select(keyExpr.as("k"), $"event_id", $"ts_us").localCheckpoint()
      val iv = e.groupBy(keyExpr.as("ik"), floor($"ts_us" / (3600L * 1000000L)).as("hr"))
        .agg(min($"ts_us").as("s"), max($"ts_us").as("e"), count(lit(1)).as("n"))
        .drop("hr").localCheckpoint()
      def naiveIv() = pts.join(iv, $"k" === $"ik" && $"s" <= $"ts_us" && $"ts_us" <= $"e")
      val inter = withRuleOff(spark)(naiveIv().count())
      spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "false")
      val tNaive = timeIt(() => naiveIv())
      spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "force")
      val tRewrite = timeIt(() => naiveIv())
      spark.conf.unset(graft.plans.IntervalRewriteRule.ConfKey)
      val tAuto = timeIt(() => naiveIv())
      spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "false")
      println(f"interval $label  matches=$inter%10d  naive=$tNaive%6.2f s  rewritten=$tRewrite%6.2f s  auto=$tAuto%6.2f s")
    }
    spark.stop()
  }

  private def withRuleOff[T](spark: SparkSession)(body: => T): T = {
    spark.conf.set(graft.plans.IntervalRewriteRule.ConfKey, "false")
    body
  }
}
