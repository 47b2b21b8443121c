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

    // ----- pruned vs full read of the z table: wall clock AND bytes -----
    // Skip FRACTIONS (above) are the proxy; this is the direct claim at
    // 100 TB — "the index multiplies bytes read" — measured: same box
    // aggregation over (a) the plain parquet read (parquet footer
    // row-group pruning still applies — this is the honest baseline) and
    // (b) Layout.prunedRead through the .envelopes index.
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    val sdLoTs = new java.sql.Timestamp(sdLo / 1000)
    val sdHiTs = new java.sql.Timestamp(sdHi / 1000)
    def boxAgg(df: DataFrame): Unit = {
      val sd = Tables.tsToMicros(df, "l_shipdate")
      df.filter($"l_partkey".between(pkLo, pkHi) && sd.between(sdLo, sdHi))
        .agg(count(lit(1)), sum($"l_quantity")).head()
      ()
    }
    def measured(mk: => DataFrame): (Double, Double, Int) = {
      def once(): (Double, Double, Int) = {
        bytesRead.set(0L)
        val t0 = System.nanoTime()
        val df = mk
        boxAgg(df)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // drain the listener bus (scratch-profiler precision)
        (wall, bytesRead.get() / 1e6, df.inputFiles.length)
      }
      once(); Seq(once(), once(), once()).minBy(_._1)
    }
    val (fw, fb, ff) = measured(spark.read.parquet(s"$base/z"))
    val (pw, pb, pf) = measured(Layout.prunedRead(spark, s"$base/z",
      Seq(("l_partkey", pkLo, pkHi), ("l_shipdate", sdLoTs, sdHiTs))))
    println(f"full read    scan ${fw}%6.3f s  ${fb}%8.1f MB  $ff%4d files")
    println(f"pruned read  scan ${pw}%6.3f s  ${pb}%8.1f MB  $pf%4d files  " +
      f"(bytes x${fb / math.max(pb, 1e-9)}%4.1f, wall x${fw / math.max(pw, 1e-9)}%4.1f)")
  }
}
