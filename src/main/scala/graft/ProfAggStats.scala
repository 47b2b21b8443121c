package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.EnvelopeAggRule
import graft.sources.Layout

/** Scratch profiler (not part of the driver contract; safe to delete):
  * what does [[EnvelopeAggRule]] buy, and what does the DEFAULT-ON rule
  * cost everyone who does not benefit?
  *
  * The data cost of count/min/max over parquet scales with FILE COUNT
  * (an open + footer + column-chunk decode per file — column pruning
  * already makes bytes nearly free), while the index path scales with
  * INDEX ROWS (one per file, hundreds of bytes each). So the honest
  * scale proxy is file-count growth at fixed row count: the off-path
  * grows linearly, the on-path stays flat. At 100 TB / ~1M files the
  * off-path is a 1M-task listing+open storm; the on-path is a
  * sub-second metadata job.
  *
  * Also measured: optimization-only overhead per Aggregate on an
  * UNINDEXED table (one fs.exists — everyone pays this) and on an
  * indexed table (listing + cached analyzed-plan/meta reuse). */
object ProfAggStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    EnvelopeAggRule.ensure(spark)
    import spark.implicits._

    val n = 4000000L
    val base = java.nio.file.Files.createTempDirectory("prof-agg-stats").toString
    def mk(files: Int): String = {
      val dir = s"$base/t$files"
      spark.range(n).select(
        pmod(hash($"id" * 7L), lit(1024)).cast("long").as("x"),
        pmod(hash($"id" + 13L), lit(1 << 20)).cast("long").as("y"),
        ($"id" % 7).cast("int").as("g"))
        .repartition(files).write.parquet(dir)
      Layout.writeEnvelopes(spark, dir, Seq("x", "y", "g"))
      dir
    }

    def withRule[T](on: Boolean)(body: => T): T = {
      spark.conf.set(EnvelopeAggRule.ConfKey, on.toString)
      try body finally spark.conf.unset(EnvelopeAggRule.ConfKey)
    }
    def q(dir: String) = spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"y").as("mx"))
    def timeMs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }

    for (files <- Seq(160, 640, 2560)) {
      val dir = mk(files)
      for (on <- Seq(false, true)) withRule(on)(q(dir).collect()) // warm
      val off = (1 to 3).map(_ => withRule(false)(timeMs(q(dir).collect()))).min
      val on  = (1 to 3).map(_ => withRule(true)(timeMs(q(dir).collect()))).min
      println(f"files=$files%-5d exec off ${off}%8.1f ms  on ${on}%7.1f ms  (${off / on}%5.1fx)")
    }

    // optimization-only overhead per Aggregate node
    val N = 200
    spark.range(1000).toDF("v").coalesce(2).write.parquet(s"$base/plain")
    def optimizeN(dir: String): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < N) {
        spark.read.parquet(dir).agg(count(lit(1)).as("n")).queryExecution.optimizedPlan
        i += 1
      }
      (System.nanoTime() - t0) / 1e6 / N
    }
    for (dir <- Seq(s"$base/plain", s"$base/t640")) {
      val name = dir.split('/').last
      for (on <- Seq(false, true)) withRule(on)(optimizeN(dir)) // warm
      val off = (1 to 3).map(_ => withRule(false)(optimizeN(dir))).min
      val on  = (1 to 3).map(_ => withRule(true)(optimizeN(dir))).min
      println(f"$name%-8s optimize off ${off}%6.3f on ${on}%6.3f ms/q")
    }
  }
}
