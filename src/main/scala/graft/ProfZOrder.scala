package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Scratch profiler (not part of the driver contract; safe to delete):
  * the file-skipping claim behind [[graft.sources.Layout]] — for a
  * 2-D box predicate, a Z-ordered rewrite lets file-level min/max
  * envelopes prune on BOTH dimensions, a lexicographic sort only on its
  * leading one, and the natural (insertion-order) layout on neither.
  * Prints per-layout: build cost, skippable-file fraction per dimension
  * and for the box, and the box-scan wall clock.
  */
object ProfZOrder {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_ZO_SCALE=k replicates lineitem k-fold (same column
    // domains, so the box keeps its selectivity and skip fractions stay
    // comparable) — the 10x smoke proving build cost scales linearly and
    // the skipping property holds as data grows
    val scale = sys.env.getOrElse("SPARK_GRAFT_ZO_SCALE", "1").toInt
    val src0 = spark.read.parquet(s"$dir/lineitem.parquet")
    val src =
      if (scale == 1) src0
      else spark.range(scale).crossJoin(src0).drop("id").localCheckpoint()
    val base = java.nio.file.Files.createTempDirectory("prof-zorder").toString
    val files = 64 * scale // hold rows/file constant across scales

    // the q138 box at sf0.1 scale
    val pkLo = 20L; val pkHi = 150L
    val sdLo = 820454400000000L; val sdHi = 852076799999999L

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // three layouts, same rows
    val (_, tNat) = timed(src.repartition(files).write.parquet(s"$base/nat"))
    val (_, tLex) = timed(src.repartitionByRange(files, $"l_partkey", $"l_shipdate")
      .sortWithinPartitions("l_partkey", "l_shipdate").write.parquet(s"$base/lex"))
    val (_, tZ) = timed(Layout.clusterWrite(src, Seq("l_partkey", "l_shipdate"), files, s"$base/z"))

    def scanSec(d: String, pkToo: Boolean): Double = {
      def once(): Double = {
        val df = spark.read.parquet(d)
        val sd = Tables.tsToMicros(df, "l_shipdate")
        val pred = if (pkToo) $"l_partkey".between(pkLo, pkHi) && sd.between(sdLo, sdHi)
                   else sd.between(sdLo, sdHi)
        val t0 = System.nanoTime()
        df.filter(pred).agg(count(lit(1)), sum($"l_quantity")).head()
        (System.nanoTime() - t0) / 1e9
      }
      once(); (1 to 3).map(_ => once()).min
    }

    for ((name, d, bt) <- Seq(("natural", s"$base/nat", tNat),
                              ("lex(pk,sd)", s"$base/lex", tLex),
                              ("zorder", s"$base/z", tZ))) {
      val fx = Layout.skippableFileFraction(spark, d, Seq(("l_partkey", pkLo, pkHi)))
      // l_shipdate envelopes: compare as timestamps (same type as stored)
      val sdLoTs = new java.sql.Timestamp(sdLo / 1000)
      val sdHiTs = new java.sql.Timestamp(sdHi / 1000)
      val fy = Layout.skippableFileFraction(spark, d, Seq(("l_shipdate", sdLoTs, sdHiTs)))
      val fbox = Layout.skippableFileFraction(spark, d,
        Seq(("l_partkey", pkLo, pkHi), ("l_shipdate", sdLoTs, sdHiTs)))
      println(f"$name%-11s build $bt%5.2f s  skip[pk] $fx%5.3f  skip[sd] $fy%5.3f  " +
        f"skip[box] $fbox%5.3f  scan[box] ${scanSec(d, pkToo = true)}%6.3f s  " +
        f"scan[sd-only] ${scanSec(d, pkToo = false)}%6.3f s")
    }
  }
}
