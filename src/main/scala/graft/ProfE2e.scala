package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cometbft._

/** Scratch per-analytic profiler for the fixture e2e pipeline (not part
  * of the driver contract; safe to delete). Times each pipeline stage
  * and counts Spark jobs per stage — the e2e entry is fixed-overhead
  * dominated, so the lever is jobs × planning, not data volume. */
object ProfE2e {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })

    val logDir = java.nio.file.Files.createTempDirectory("prof-e2e-logs").toString
    Fixtures.writeScenario(logDir, heights = 5)

    // real-pipeline total (what BENCH times)
    def e2e(label: String): Unit = {
      val wh = java.nio.file.Files.createTempDirectory("prof-e2e-wh").toString
      val j0 = jobs.get
      val t0 = System.nanoTime()
      Pipeline.run(spark, logDir, wh)
      println(f"[$label] Pipeline.run ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get - j0}")
    }
    // per-analytic breakdown (replicates the pipeline loop with the same
    // observe-counted writes)
    def breakdown(label: String): Unit = {
      val wh = java.nio.file.Files.createTempDirectory("prof-e2e-wh").toString
      val t0 = System.nanoTime()
      val raw = LogIngest.read(spark, logDir)
      val events = Normalize.normalize(raw)
      val eventsPath = s"$wh/events"
      events.repartition(col("event_type")).sortWithinPartitions(col("ts_ns"))
        .observe("rows_events", count(lit(1)))
        .write.mode("overwrite").partitionBy("event_type").parquet(eventsPath)
      val stored = spark.read.parquet(eventsPath)
      val tIngest = (System.nanoTime() - t0) / 1e9
      println(f"[$label] ingest+normalize+events-write $tIngest%6.2f s  jobs=${jobs.get}")
      var written = Map.empty[String, DataFrame]
      Analytics.all.foreach { a =>
        val j0 = jobs.get
        val ta = System.nanoTime()
        val tracker = new FrameTracker
        a.runFrom(stored, written, tracker).foreach { case (table, df) =>
          val path = s"$wh/$table"
          df.observe(s"rows_$table", count(lit(1)))
            .write.mode("overwrite").parquet(path)
          written += table -> spark.read.parquet(path)
        }
        tracker.release()
        println(f"[$label]   ${a.name}%-26s ${(System.nanoTime() - ta) / 1e9}%6.2f s  jobs=${jobs.get - j0}")
      }
      println(f"[$label] TOTAL ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get}")
    }
    e2e("cold")
    jobs.set(0)
    e2e("warm")
    jobs.set(0)
    e2e("warm2")
    jobs.set(0)
    e2e("warm3")
    jobs.set(0)
    breakdown("warm4")

    // data-volume scaling: same 9-analytic pipeline over a 10x-height
    // fixture (50 heights). The warm 5-height run is fixed-overhead
    // dominated, so a healthy data-scaling ratio is far below 10x — and
    // anything ABOVE 10x would flag a superlinear stage.
    val logDir50 = java.nio.file.Files.createTempDirectory("prof-e2e-logs50").toString
    Fixtures.writeScenario(logDir50, heights = 50)
    def e2e50(label: String): Unit = {
      val wh = java.nio.file.Files.createTempDirectory("prof-e2e-wh50").toString
      val j0 = jobs.get
      val t0 = System.nanoTime()
      Pipeline.run(spark, logDir50, wh)
      println(f"[$label] Pipeline.run(h=50) ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get - j0}")
    }
    jobs.set(0)
    e2e50("h50-warm1")
    jobs.set(0)
    e2e50("h50-warm2")
    spark.stop()
  }
}
