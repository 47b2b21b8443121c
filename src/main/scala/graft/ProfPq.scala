package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the ANN paths (not part of the driver contract;
  * safe to delete): brute-force vs PQ-ADC vs IVF-PQ at the bench SF —
  * the numbers behind the PLANS.md ADC-table note. */
object ProfPq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t1 = { val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n }
      val t2 = { val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n }
      println(f"$label%-28s ${math.min(t1._1, t2._1)}%8.3f s   rows=${t2._2}")
    }

    for (name <- Seq("q27_cosine_topk", "q94_pq_encode", "q95_pq_ann", "q97_ivfpq_ann", "q34_ivf_ann")) {
      time(name) { SparkEntry.queries(name)(spark, dir).count() }
    }
    spark.stop()
  }
}
