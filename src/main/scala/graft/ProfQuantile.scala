package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Layout

/** Scratch profiler (not part of the driver contract; safe to delete):
  * quantile (rank) vs linear min/max cell scaling on a zipf-skewed
  * column — the degradation Layout's scaladoc names, measured. x is
  * log-uniform over [1, 1e6] (half the mass in the first 0.1% of the
  * linear range); the box x ∈ [1, 8] holds ~15% of rows. Prints the
  * skippable-file fraction and build cost per scaling. */
object ProfQuantile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = sys.env.getOrElse("SPARK_GRAFT_QN", "200000").toInt
    val files = sys.env.getOrElse("SPARK_GRAFT_QFILES", "64").toInt
    val rnd = new scala.util.Random(17)
    val df = (1 to n).map { _ =>
      (math.exp(rnd.nextDouble() * math.log(1e6)).toLong, rnd.nextInt(1024).toLong)
    }.toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("prof-quantile").toString
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tLin = timed(Layout.clusterWrite(df, Seq("x", "y"), files, s"$base/lin"))
    val tQnt = timed(Layout.clusterWrite(df, Seq("x", "y"), files, s"$base/qnt",
      scaling = "quantile"))
    for ((nm, d, t) <- Seq(("linear", s"$base/lin", tLin), ("quantile", s"$base/qnt", tQnt))) {
      val fx = Layout.skippableFileFraction(spark, d, Seq(("x", 1L, 8L)))
      val fy = Layout.skippableFileFraction(spark, d, Seq(("y", 100L, 163L)))
      val fbox = Layout.skippableFileFraction(spark, d,
        Seq(("x", 1L, 8L), ("y", 100L, 163L)))
      println(f"$nm%-9s build $t%5.2f s  skip[x 1..8] $fx%5.3f  " +
        f"skip[y 1/16] $fy%5.3f  skip[box] $fbox%5.3f")
    }
  }
}
