package graft

import org.apache.spark.sql.SparkSession

import graft.plans.{AsOfRewriteRule, IntervalRewriteRule}

/** Scratch A/B for the default-on rewrite rules' OPTIMIZER-TIME cost on a
  * workload that never benefits from them (not part of the driver
  * contract; safe to delete): the CometBFT fixture pipeline, whose ~90
  * jobs contain equi-joins and windows but no naive as-of/interval shape.
  * Any auto-vs-off gap is pure matcher + density-gate overhead — the
  * price every non-matching query pays for the automatic rescue.
  */
object ProfE2eGate {
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
    AsOfRewriteRule.ensure(spark); IntervalRewriteRule.ensure(spark)

    val logDir = java.nio.file.Files.createTempDirectory("graft-e2egate-logs").toString
    graft.cometbft.Fixtures.writeScenario(logDir, heights = 5)

    def onceIn(mode: Option[String]): Double = {
      mode match {
        case Some(m) =>
          spark.conf.set(AsOfRewriteRule.ConfKey, m)
          spark.conf.set(IntervalRewriteRule.ConfKey, m)
        case None =>
          spark.conf.unset(AsOfRewriteRule.ConfKey)
          spark.conf.unset(IntervalRewriteRule.ConfKey)
      }
      val wh = java.nio.file.Files.createTempDirectory("graft-e2egate-wh").toString
      val t0 = System.nanoTime()
      graft.cometbft.Pipeline.run(spark, logDir, wh)
      (System.nanoTime() - t0) / 1e9
    }
    // warm once (codegen/JIT), then alternate modes twice each
    onceIn(Some("false"))
    for (label <- Seq("a", "b")) {
      val tOff  = onceIn(Some("false"))
      val tAuto = onceIn(None)
      println(f"e2e[$label]  rules-off=$tOff%6.2f s  rules-auto=$tAuto%6.2f s")
    }
    spark.stop()
  }
}
