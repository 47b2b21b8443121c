package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AnnIndex

/** Scratch profiler (not part of the driver contract; safe to delete):
  * the file-fragmentation claim behind [[AnnIndex.compactCodes]] —
  * repeated `add`s fragment the cell-partitioned `codes` table, serve
  * latency tracks the FILE count (listing + footer reads per probe),
  * and compaction restores the one-file-per-cell build layout.
  */
object ProfAnnCompact {
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

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .localCheckpoint()
    val q = emb.filter($"vec_id" < 50).localCheckpoint()

    def codeFiles(idx: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$idx/codes"))
    }
    def serveSec(idx: String): Double = {
      AnnIndex.topK(q, "vec_id", "embedding", idx, k = 5, nprobe = 2).count() // warm
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        AnnIndex.topK(q, "vec_id", "embedding", idx, k = 5, nprobe = 2).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val idx = java.nio.file.Files.createTempDirectory("prof-ann-compact").toString
    AnnIndex.build(emb, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    println(f"build only:        ${codeFiles(idx)}%5d files  serve ${serveSec(idx)}%5.2f s")

    // fragment: re-add the corpus under shifted ids (the 2k-vector table
    // stands in for a stream of new vectors; per-add file count is what
    // matters, not vector identity); measure at exponentially spaced
    // add counts
    var added = 0
    for (target <- Seq(8, 32, 128, 512)) {
      while (added < target) {
        added += 1
        AnnIndex.add(
          emb.select(($"vec_id" + added * 10000L).as("vec_id"), $"embedding"),
          "vec_id", "embedding", idx)
      }
      println(f"after ${target}%3d adds:   ${codeFiles(idx)}%5d files  serve ${serveSec(idx)}%5.2f s")
    }
    AnnIndex.compactCodes(spark, idx)
    println(f"after compaction:  ${codeFiles(idx)}%5d files  serve ${serveSec(idx)}%5.2f s")
    spark.stop()
  }
}
