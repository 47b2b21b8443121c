package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, HeavyHitters}

/** Scratch profiler for the round-9 relational operators (not part of the
  * driver contract; safe to delete): the hot-key claim behind
  * [[AsOfJoin.backwardChunked]] and the shuffle-volume claim behind
  * [[HeavyHitters.exact]], measured instead of assumed.
  */
object ProfRelOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Shuffle-volume accounting: local[32] timing hides what a cluster
    // pays for (network shuffle), so report bytes written to shuffle
    // alongside seconds.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def timeMin2(label: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 2).map { _ =>
        shuffleBytes.set(0L)
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain stage events
        (dt, shuffleBytes.get)
      }
      val best = runs.minBy(_._1)
      println(f"$label%-46s ${best._1}%7.2f s  shuffle ${best._2 / 1048576.0}%8.1f MB")
    }

    // ---- as-of: ONE hot key carrying 90% of 2M+2M rows -----------------
    val n = 2000000L
    def side(seed: Int, idCol: String) = spark.range(n)
      .select(
        when(pmod(col("id") + seed, lit(10)) < 9, lit("hot"))
          .otherwise(concat(lit("cold"), pmod(col("id") + seed, lit(10)))).as("k"),
        pmod(hash((col("id") + seed).cast("long")).cast("long"), lit(1000000000L)).as(s"${idCol}ts"),
        col("id").as(idCol))
    val l = side(1, "lid").localCheckpoint()
    val r = side(2, "rid").withColumnRenamed("lidts", "ridts").localCheckpoint()

    timeMin2("asof backward (hot key, one window task)") {
      AsOfJoin.backward(l, r, Seq("k"), "lidts", "ridts").count()
    }
    for (chunks <- Seq(32L, 256L)) {
      timeMin2(s"asof backwardChunked (width 1e9/$chunks)") {
        AsOfJoin.backwardChunked(l, r, Seq("k"), "lidts", "ridts",
          chunkWidth = 1000000000L / chunks).count()
      }
    }

    // ---- heavy hitters: sketch+verify vs full groupBy ------------------
    // 20M items, ~1M distinct, zipf-ish skew via hash-exponent bucketing.
    val items = spark.range(20000000L)
      .select(
        when(pmod(hash(col("id") * 31).cast("long"), lit(4)) < 3,
          concat(lit("hh"), pmod(hash(col("id")).cast("long"), lit(50L)))) // 75% mass in 50 items
          .otherwise(concat(lit("w"), pmod(hash(col("id")).cast("long"), lit(1000000L))))
          .as("item"))
      .localCheckpoint()

    timeMin2("heavy hitters: MG sketch + exact verify") {
      HeavyHitters.exact(items, col("item"), phiPpm = 2000L, k = 1023).count()
    }
    timeMin2("heavy hitters: full groupBy (oracle shape)") {
      val tot = items.count()
      items.groupBy("item").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 1000000L > lit(tot) * 2000L).count()
    }

    spark.stop()
  }
}
