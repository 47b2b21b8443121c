package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{Layout, Manifest}

/** Scratch profiler (not part of the driver contract; safe to delete):
  * what does the MANIFEST snapshot layer cost and bound?
  *  - commit cost: `Manifest.write` wall per maintenance cycle
  *  - read cost: `readSnapshot` resolution + query vs a plain listing
  *    read of the same table (same aggregate, min-of-N)
  *  - partition pruning on snapshots: files read for a one-partition
  *    filter vs total
  *  - retention bound: files under `.retired` + manifest count after
  *    many OPTIMIZE generations (must plateau at ~keep generations)
  */
object ProfSnapshot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(17)
    val df = (1 to 200000).map { i =>
      (i % 8, rnd.nextInt(100000).toLong, rnd.nextInt(1024).toLong)
    }.toDF("wk", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("prof-snapshot").toString
    val dir = s"$base/t"
    df.write.partitionBy("wk").parquet(dir)

    // maintenance generations: time the commit, watch the retention bound
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def countFiles(p: String): Int = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(path)) 0
      else {
        def walk(q: org.apache.hadoop.fs.Path): Int =
          fs.listStatus(q).map(s => if (s.isDirectory) walk(s.getPath) else 1).sum
        walk(path)
      }
    }
    (1 to 4).foreach { g =>
      val t0 = System.nanoTime()
      Layout.clusterPartitions(spark, dir, Seq("x", "y"), filesPerPartition = 2)
      val optimizeMs = (System.nanoTime() - t0) / 1e6
      // retention bound right after the OPTIMIZE commit: the previous
      // generation sits in .retired (referenced by the kept previous
      // manifest), older ones are vacuumed — ~1 generation forever
      val retiredNow = countFiles(Manifest.retiredPath(dir))
      val t1 = System.nanoTime()
      val seq = Manifest.write(spark, dir) // one extra commit to time it alone
      val commitMs = (System.nanoTime() - t1) / 1e6
      println(f"gen $g: OPTIMIZE ${optimizeMs}%8.1f ms, manifest commit ${commitMs}%6.1f ms, " +
        f"seq $seq, retired files after OPTIMIZE $retiredNow%3d, " +
        f"manifests ${countFiles(Manifest.manifestsPath(dir))}%2d")
    }

    def minOf(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.min
    // warm
    spark.read.parquet(dir).agg(count(lit(1))).head()
    Layout.readSnapshot(spark, dir).agg(count(lit(1))).head()
    val plainMs = minOf(5)(spark.read.parquet(dir).agg(count(lit(1))).head())
    val snapMs  = minOf(5)(Layout.readSnapshot(spark, dir).agg(count(lit(1))).head())
    println(f"full-table count: plain listing ${plainMs}%6.1f ms, snapshot ${snapMs}%6.1f ms")

    val snap = Layout.readSnapshot(spark, dir).filter($"wk" === 3)
    snap.collect()
    val physical = snap.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val read = physical.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }.sum
    println(s"snapshot partition prune: read $read of " +
      s"${Layout.readSnapshot(spark, dir).inputFiles.length} files for a 1-of-8 wk filter")

    // round 15: commit cost at 100k files — the walk is level-parallel
    // (16 listing threads) and the v3 body gzips, so the commit is
    // bounded by the parallel listing, not a serial million-round-trip
    // walk plus a 100 MB text write. Synthetic zero-byte .parquet files
    // (Manifest.write never opens data files when schemas are passed).
    {
      val big = java.nio.file.Paths.get(s"$base/bigtable")
      val nLeaves = 200; val perLeaf = 500
      val t0 = System.nanoTime()
      (0 until nLeaves).foreach { l =>
        val leaf = big.resolve(f"wk=$l%03d")
        java.nio.file.Files.createDirectories(leaf)
        (0 until perLeaf).foreach { f =>
          java.nio.file.Files.createFile(leaf.resolve(f"part-$f%05d.parquet")); ()
        }
      }
      println(f"synthesized ${nLeaves * perLeaf} files in ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      val schemas = Some((
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("wk", org.apache.spark.sql.types.StringType)))))
      val t1 = System.nanoTime()
      val seq = Manifest.write(spark, big.toString, keep = 2, schemas = schemas)
      val commitMs = (System.nanoTime() - t1) / 1e6
      val mPath = new org.apache.hadoop.fs.Path(
        Manifest.manifestsPath(big.toString), f"m$seq%020d")
      val mBytes = fs.getFileStatus(mPath).getLen
      val t2 = System.nanoTime()
      val parsed = Manifest.info(spark, big.toString).files.size
      val parseMs = (System.nanoTime() - t2) / 1e6
      println(f"100k-file commit: ${commitMs}%8.1f ms, manifest $mBytes%,d bytes gzipped, " +
        f"re-parse ${parseMs}%6.1f ms, $parsed files")
    }
    spark.stop()
  }
}
