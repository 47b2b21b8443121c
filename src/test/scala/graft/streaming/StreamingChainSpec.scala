package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed dedup → curation streaming chain
  * ([[StreamingPipeline.curationChainStream]]): two chained stateful
  * operators in one query. Closed-input parity against the batch
  * decision table restricted to canonical rows (arrival order == id
  * order, so first-arrival dedup ⇔ the batch min-id canonical gate),
  * and checkpoint-restart parity across BOTH states.
  */
class StreamingChainSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // Deterministic fixture with real exact duplicates among the CORPUS
  // docs (never sharing text with a bench doc, so the stream — which
  // never sees bench docs — and the batch canonical window agree).
  // Strictly increasing ts in id order: no late data, and first arrival
  // is always the min id of its content group.
  private lazy val docs: Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(41)
    val filler = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val langs = Seq("en" -> Seq("the", "a", "of"), "de" -> Seq("der", "die", "und"))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    (0L until 60L).foreach { i =>
      if (i % 7 == 3 && i > 10 && out((i - 7).toInt)._1 % 10 != 0) {
        // exact duplicate of an earlier non-bench doc (same declared lang)
        val prev = out((i - 7).toInt)
        out += ((i, prev._2, prev._3))
      } else {
        val (lang, sw) = langs(rnd.nextInt(2))
        val label =
          if (rnd.nextInt(5) == 0) langs((langs.indexWhere(_._1 == lang) + 1) % 2)._1
          else lang
        val body =
          if (rnd.nextInt(10) == 0) s"11 22 33 44 55 66 u$i"
          else (sw ++ (0 until 4 + rnd.nextInt(5)).map(_ =>
            filler(rnd.nextInt(filler.size)))).mkString(" ") + s" u$i"
        out += ((i, body, label))
      }
    }
    out.toSeq
  }

  private lazy val all = {
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang")
  }
  private lazy val benchIndex = {
    import spark.implicits._
    StreamingPipeline.benchShingleIndex(all.filter($"doc_id" % 10 === 0), "text", n = 3)
  }
  private lazy val dfIdx = StreamingPipeline.bigramDfIndex(all, "doc_id", "text")
  private val minFam = 300000L

  private def tsIso(i: Long): String = f"2025-01-01T00:0${i / 60}%d:${i % 60}%02dZ"

  private lazy val corpus: Seq[(Long, String, String, String)] =
    docs.filter(_._1 % 10 != 0).map { case (i, t, l) => (i, tsIso(i), t, l) }

  private val pusher = Seq((999L, "2025-01-01T02:00:00Z", "watermark pusher", "en"))

  private def writeFile(dir: String, name: String,
                        part: Seq[(Long, String, String, String)], mtime: Long): Unit = {
    val lines = part.map { case (id, ts, t, l) =>
      s"""{"doc_id":$id,"ts":"$ts","text":"$t","lang":"$l"}"""
    }
    val p = java.nio.file.Paths.get(s"$dir/$name")
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(mtime))
  }

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))

  private def runStream(dir: String, out: String, cp: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
    // the watermark horizon must cover the fixture's full 60 s event
    // span: dropDuplicatesWithinWatermark only guarantees dedup WITHIN
    // the horizon, and the batch canonical gate is corpus-global
    val q = StreamingPipeline.curationChainStream(stream, benchIndex, dfIdx,
        "doc_id", "text", "ts", "lang", n = 3, watermark = "2 minutes",
        minFamiliarityPpm = minFam)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def result(out: String) =
    spark.read.parquet(out).filter(col("doc_id") =!= 999L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getLong(5), r.getBoolean(6), r.getString(7)))
      .sortBy(_._1).toSeq

  test("composed dedup->curation chain equals the batch canonical decision table") {
    import spark.implicits._
    val in = tmp("chain-a"); val out = tmp("chain-a-out")
    writeFile(in, "f1.json", corpus.take(20), 1700000000000L)
    writeFile(in, "f2.json", corpus.drop(20), 1700000001000L)
    writeFile(in, "f3.json", pusher, 1700000002000L)
    runStream(in, out, tmp("chain-a-cp"))
    val streamed = result(out)
    val batch = graft.operators.CorpusOps.curationDecisions(all, "doc_id", "text",
        declaredLang = $"lang", isBenchmark = $"doc_id" % 10 === 0,
        n = 3, minFamiliarityPpm = minFam)
      .filter($"doc_id" % 10 =!= 0 && $"canonical")
      .select($"doc_id", $"n_tokens", $"quality_ok", $"lang_ok",
        $"contaminated", $"familiarity_ppm", $"keep", $"reason")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getLong(5), r.getBoolean(6), r.getString(7)))
      .sortBy(_._1).toSeq
    val nDups = corpus.size - batch.size
    assert(nDups >= 3, s"fixture must contain real duplicates, found $nDups")
    assert(streamed.map(_._8).toSet.size >= 3,
      "fixture must exercise several distinct reasons")
    assert(streamed.size == batch.size,
      s"dedup stage must drop exactly the non-canonical docs: ${streamed.size} vs ${batch.size}")
    assert(streamed == batch)
  }

  test("composed chain restarted from checkpoint recovers BOTH stages' state") {
    val inA = tmp("chain-b-ref"); val outA = tmp("chain-b-ref-out")
    writeFile(inA, "f1.json", corpus.take(20), 1700000000000L)
    writeFile(inA, "f2.json", corpus.drop(20), 1700000001000L)
    writeFile(inA, "f3.json", pusher, 1700000002000L)
    runStream(inA, outA, tmp("chain-b-ref-cp"))

    // run B stops after the first file — duplicates of f1 docs arrive in
    // f2 AFTER the restart, so run B only matches run A if the dedup
    // stage's seen-hash state AND the aggregation state both recover
    val inB = tmp("chain-b"); val outB = tmp("chain-b-out")
    val cpB = tmp("chain-b-cp")
    writeFile(inB, "f1.json", corpus.take(20), 1700000000000L)
    runStream(inB, outB, cpB)
    writeFile(inB, "f2.json", corpus.drop(20), 1700000001000L)
    writeFile(inB, "f3.json", pusher, 1700000002000L)
    runStream(inB, outB, cpB)

    val a = result(outA)
    val b = result(outB)
    assert(a.nonEmpty)
    assert(b == a, s"restarted chain diverged: ${b.size} vs ${a.size} rows")
  }

  test("composed chain equals the batch canonical table for ANY batch slicing") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val batch = graft.operators.CorpusOps.curationDecisions(all, "doc_id", "text",
        declaredLang = $"lang", isBenchmark = $"doc_id" % 10 === 0,
        n = 3, minFamiliarityPpm = minFam)
      .filter($"doc_id" % 10 =!= 0 && $"canonical")
      .select($"doc_id", $"n_tokens", $"quality_ok", $"lang_ok",
        $"contaminated", $"familiarity_ppm", $"keep", $"reason")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getLong(5), r.getBoolean(6), r.getString(7)))
      .sortBy(_._1).toSeq
    for (seed <- Seq(61L, 62L, 63L)) {
      val rnd = new scala.util.Random(seed)
      val mem = MemoryStream[(Long, java.sql.Timestamp, String, String)]
      val out = StreamingPipeline.curationChainStream(
        mem.toDF().toDF("doc_id", "ts", "text", "lang"), benchIndex, dfIdx,
        "doc_id", "text", "ts", "lang", n = 3, watermark = "2 minutes",
        minFamiliarityPpm = minFam)
      val qn = s"chain_rand_$seed"
      val q = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
      try {
        val rows = corpus.map { case (i, _, t, l) =>
          (i, java.sql.Timestamp.valueOf(f"2025-01-01 00:0${i / 60}%d:${i % 60}%02d"), t, l)
        } :+ ((999L, java.sql.Timestamp.valueOf("2025-01-01 02:00:00"),
          "watermark pusher", "en"))
        val nChunks = 1 + rnd.nextInt(5)
        val size = math.max(1, (rows.size + nChunks - 1) / nChunks)
        rows.grouped(size).foreach { c => mem.addData(c); q.processAllAvailable() }
        val streamed = spark.sql(
          s"""select doc_id, n_tokens, quality_ok, lang_ok, contaminated,
             |familiarity_ppm, keep, reason from $qn where doc_id <> 999""".stripMargin)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
            r.getBoolean(4), r.getLong(5), r.getBoolean(6), r.getString(7)))
          .sortBy(_._1).toSeq
        assert(streamed == batch, s"seed $seed chunks $nChunks")
      } finally q.stop()
    }
  }
}
