package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch comparison of the two connected-components formulations (not
  * part of the driver contract; safe to delete): label propagation with
  * pointer jumping ([[Dedup.connectedComponents]]) vs alternating
  * large-star/small-star ([[Dedup.connectedComponentsStars]]) on the two
  * shapes that matter at scale — a DEEP chain (diameter = n, the
  * propagation worst case) and a BROAD near-dup-shaped graph (many small
  * components, the shape LSH pair generation actually produces). Both
  * must return identical labels; the timing difference is the point.
  */
object ProfCCStars {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timeOnce(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    // deep chain: 100k vertices in one path
    val chain = spark.range(1, 100000L).select(($"id" + 1).as("a"), $"id".as("b"))
      .localCheckpoint()
    // broad: 100k vertices in 20k size-5 near-dup clusters, random intra-
    // cluster pairs (2 per cluster beyond the spanning chain)
    val broad = spark.range(0, 100000L)
      .select(($"id" / 5).cast("long").as("c"), $"id".as("v"))
      .groupBy($"c").agg(collect_list($"v").as("vs"))
      .select(explode(expr(
        "array(struct(vs[0] as a, vs[1] as b), struct(vs[1] as a, vs[2] as b)," +
        " struct(vs[2] as a, vs[3] as b), struct(vs[3] as a, vs[4] as b)," +
        " struct(vs[0] as a, vs[4] as b), struct(vs[1] as a, vs[3] as b))")).as("e"))
      .select($"e.a", $"e.b")
      .localCheckpoint()

    for ((label, g) <- Seq(("chain-100k", chain), ("broad-20k-comps", broad))) {
      val tProp  = timeOnce(() => Dedup.connectedComponents(g, "a", "b").count())
      val tStars = timeOnce(() => Dedup.connectedComponentsStars(g, "a", "b").count())
      // parity double-check while we're here (cheap at this size)
      val d = Dedup.connectedComponents(g, "a", "b")
        .except(Dedup.connectedComponentsStars(g, "a", "b")).count()
      println(f"cc $label  propagation=$tProp%7.2f s  stars=$tStars%7.2f s  label-diff=$d")
    }
    spark.stop()
  }
}
