package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static ANN serving ([[graft.operators.AnnIndex.probeStream]]):
  * a query stream probes the STORED IVF-PQ index. Closed-input parity
  * against the batch [[graft.operators.AnnIndex.topK]] — the emitted
  * top-k rows must be bit-identical — plus checkpoint-restart parity
  * (the per-query window aggregation must survive a mid-stream stop).
  *
  * Query vectors are serialized as exact doubles (Double.toString
  * round-trips), so the streaming quantization sees the same values as
  * the parquet-float batch path (`float.toDouble` is exact). A sentinel
  * query 10 minutes ahead advances the watermark so the real queries'
  * windows close under append mode (the session-window spec's z-event
  * pattern); the sentinel's own rows are excluded from comparison.
  */
class StreamingAnnSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val schema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("ts", TimestampType),
    StructField("embedding", ArrayType(DoubleType))))

  private val Sentinel = 9999L

  private lazy val index: String = {
    import spark.implicits._
    val idx = tmp("ann-stream-idx")
    graft.operators.AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    idx
  }

  /** The 20 query rows as (id, exact-double vector) — shared by the
    * stream fixture files and the batch-parity reference. */
  private lazy val queryRows: Seq[(Long, Seq[Double])] =
    embeddings.filter(col("vec_id") < 20)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1).toSeq

  private def writeBatch(dir: String, name: String, part: Seq[(Long, Seq[Double])],
                         tsIso: String, mtime: Long): Unit = {
    val lines = part.map { case (i, v) =>
      s"""{"query_id":$i,"ts":"$tsIso","embedding":[${v.mkString(",")}]}"""
    }
    val p = java.nio.file.Paths.get(s"$dir/$name")
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(mtime))
  }

  private def runStream(inDir: String, out: String, cp: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val q = graft.operators.AnnIndex.probeStream(stream, "query_id", "embedding",
        "ts", index, k = 5, nprobe = 2,
        watermark = "10 seconds", windowDur = "1 minute")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def result(out: String): Set[(Long, Long, Long, Int, Long)] =
    spark.read.parquet(out)
      .filter(col("query_id") =!= Sentinel)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .toSet

  private lazy val batchExpected: Set[(Long, Long, Long, Int, Long)] = {
    import spark.implicits._
    graft.operators.AnnIndex.topK(embeddings.filter($"vec_id" < 20),
        "vec_id", "embedding", index, k = 5, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .toSet
  }

  test("streaming probe of the stored index equals the batch topK on closed input") {
    val in = tmp("ann-stream-a"); val out = tmp("ann-stream-a-out")
    writeBatch(in, "f1.json", queryRows.take(10), "2025-01-01T00:00:05Z", 1700000000000L)
    writeBatch(in, "f2.json", queryRows.drop(10), "2025-01-01T00:00:40Z", 1700000001000L)
    writeBatch(in, "f3.json", Seq(Sentinel -> queryRows.head._2), "2025-01-01T00:10:00Z",
      1700000002000L)
    runStream(in, out, tmp("ann-stream-a-cp"))
    val got = result(out)
    assert(got.nonEmpty, "stream emitted nothing - watermark never closed the windows?")
    assert(got == batchExpected)
  }

  test("per-batch serve sink equals batch topK and replays idempotently") {
    val in = tmp("ann-serve-in"); val out = tmp("ann-serve") + "/topk"
    val cp = tmp("ann-serve-cp")
    writeBatch(in, "f1.json", queryRows.take(10), "2025-01-01T00:00:05Z", 1700000000000L)
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(in)
      val q = StreamingPipeline.annServeSink(stream, "query_id", "embedding",
        index, k = 5, outPath = out, checkpointLocation = cp, nprobe = 2)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    writeBatch(in, "f2.json", queryRows.drop(10), "2025-01-01T00:00:40Z", 1700000001000L)
    run() // restart from checkpoint: second file becomes its own batch
    def served(): Set[(Long, Long, Long, Int, Long)] =
      spark.read.parquet(out)
        .select(col("query_id"), col("cell"), col("cand_id"), col("rank"), col("adist2"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
        .toSet
    // no watermark semantics: every query's top-k is final per batch, and
    // the union over batches equals the batch topK over all queries
    assert(served() == batchExpected)
    // verbatim batch replay rewrites identical rows (no duplication)
    val lastBatch = spark.read.parquet(out)
      .agg(max(col("batch_id").cast("long"))).collect()(0).getLong(0)
    val batchDf = spark.read.schema(schema).json(s"$in/f2.json")
    val topk = graft.operators.AnnIndex
      .topK(batchDf, "query_id", "embedding", index, k = 5, nprobe = 2)
      .withColumn("batch_id", lit(lastBatch))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try topk.write.mode("overwrite").partitionBy("batch_id").parquet(out)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    assert(served() == batchExpected, "replayed batch must rewrite identical rows")
  }

  test("streaming probe restarted from checkpoint equals the uninterrupted run") {
    val in = tmp("ann-stream-b"); val out = tmp("ann-stream-b-out")
    val cp = tmp("ann-stream-b-cp")
    // stop after the first file, then resume from the SAME checkpoint
    writeBatch(in, "f1.json", queryRows.take(10), "2025-01-01T00:00:05Z", 1700000000000L)
    runStream(in, out, cp)
    writeBatch(in, "f2.json", queryRows.drop(10), "2025-01-01T00:00:40Z", 1700000001000L)
    writeBatch(in, "f3.json", Seq(Sentinel -> queryRows.head._2), "2025-01-01T00:10:00Z",
      1700000002000L)
    runStream(in, out, cp)
    assert(result(out) == batchExpected)
  }
}
