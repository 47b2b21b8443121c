package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.EnvelopePruneRule
import graft.sources.Layout

/** Scratch profiler (not part of the driver contract; safe to delete):
  * what does the DEFAULT-ON [[EnvelopePruneRule]] cost everyone who
  * does NOT benefit? Times pure OPTIMIZATION (optimizedPlan forced on a
  * fresh query each time, the explain/AQE-re-plan path) and full
  * execution, rule on vs off, over (a) an unindexed table — the common
  * case, one fs.exists per optimization — and (b) an indexed table —
  * index-dir listing + cached skip set. Same-JVM A/B, min of runs, so
  * the cross-process bench noise is out of the picture. */
object ProfPruneOverhead {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    EnvelopePruneRule.ensure(spark)
    import spark.implicits._

    val rnd = new scala.util.Random(13)
    val df = (1 to 50000).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("prof-prune-ovh").toString
    df.repartition(16).write.parquet(s"$base/plain")
    Layout.clusterWrite(df, Seq("x", "y"), 16, s"$base/indexed")

    val N = 200
    def optimizeN(dir: String): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < N) {
        // fresh DataFrame each time: QueryExecution caches optimizedPlan
        spark.read.parquet(dir).filter($"x".between(100L, 163L) && $"y" > 50L)
          .queryExecution.optimizedPlan
        i += 1
      }
      (System.nanoTime() - t0) / 1e6 / N // ms per optimization
    }
    def execN(dir: String, n: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        spark.read.parquet(dir).filter($"x".between(100L, 163L) && $"y" > 50L)
          .agg(count(lit(1))).head()
        i += 1
      }
      (System.nanoTime() - t0) / 1e6 / n // ms per query
    }

    def withRule[T](on: Boolean)(body: => T): T = {
      spark.conf.set(EnvelopePruneRule.ConfKey, on.toString)
      try body finally spark.conf.unset(EnvelopePruneRule.ConfKey)
    }
    // warm both paths, then min-of-3 per cell
    for (dir <- Seq(s"$base/plain", s"$base/indexed"); on <- Seq(false, true))
      withRule(on) { optimizeN(dir); execN(dir, 10) }
    for (dir <- Seq(s"$base/plain", s"$base/indexed")) {
      val name = dir.split('/').last
      val offO = (1 to 3).map(_ => withRule(false)(optimizeN(dir))).min
      val onO  = (1 to 3).map(_ => withRule(true)(optimizeN(dir))).min
      val offE = (1 to 3).map(_ => withRule(false)(execN(dir, 20))).min
      val onE  = (1 to 3).map(_ => withRule(true)(execN(dir, 20))).min
      println(f"$name%-8s optimize off ${offO}%6.3f on ${onO}%6.3f ms/q  " +
        f"exec off ${offE}%6.2f on ${onE}%6.2f ms/q")
    }
  }
}
