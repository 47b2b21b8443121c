package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Print the formatted physical plan of selected queries (plan-review
  * tool, not part of the driver contract). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // mirror Bench's session config exactly (extensions, AQE, timestamp
    // handling) so the dumped plans are the plans the bench actually runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    args.foreach { name =>
      val text = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      outDir match {
        case Some(d) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, s"$name.txt"),
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $d/$name.txt")
        case None =>
          println(s"===== $name =====")
          println(text.take(6000))
      }
    }
    spark.stop()
  }
}
