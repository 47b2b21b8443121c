package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.cometbft.Fixtures

/** Fault tolerance of the stateful streaming machines: a query stopped and
  * restarted from its checkpoint mid-stream must produce EXACTLY the
  * output of an uninterrupted run — keyed state (the vote confirmation
  * machine's entries) survives the restart via the state store, and the
  * file sink's manifest makes delivery exactly-once (no replayed batch can
  * double-write). This is the property that lets the 100 TB deployment
  * treat executor/driver loss as a non-event.
  */
class StreamingRecoverySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Write each node's log into `dir` one file at a time via the callback
    * so the test controls which files exist at each phase. Modification
    * times are pinned strictly increasing per node index: the file source
    * orders same-batch files by mtime, and the pairing machines' arrival
    * semantics are order semantics — an mtime TIE would let runs A and B
    * process files in different orders and legitimately diverge (observed
    * flake on the network-latency machine under suite load). */
  private def writeNodeFiles(dir: String, nodes: Range, heights: Int): Unit =
    nodes.foreach { n =>
      val lines = Fixtures.nodeLog(n, heights)
      val p = java.nio.file.Paths.get(s"$dir/node$n.log")
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + n * 1000L))
    }

  test("vote machine restarted from checkpoint equals the uninterrupted run") {
    def runStream(logDir: String, out: String, cp: String): Unit = {
      val q = StreamingPipeline.voteLatencyStream(
          spark, StreamingPipeline.events(spark, logDir, maxFilesPerTrigger = Some(1)))
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def result(out: String) =
      spark.read.parquet(out)
        .select("height", "round", "valIdx", "sender", "receiver", "sentNs", "receivedNs")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]), r.getLong(6)))
        .sorted.toSeq

    // Run A: all four node logs processed in one uninterrupted query
    val dirA = tmp("graft-recovery-a"); val outA = tmp("graft-recovery-a-out")
    writeNodeFiles(dirA, 0 until 4, heights = 3)
    runStream(dirA, outA, tmp("graft-recovery-a-cp"))

    // Run B: two logs, stop, two more logs, restart from the SAME
    // checkpoint into the SAME sink - state must carry across the restart
    val dirB = tmp("graft-recovery-b"); val outB = tmp("graft-recovery-b-out")
    val cpB = tmp("graft-recovery-b-cp")
    writeNodeFiles(dirB, 0 until 2, heights = 3)
    runStream(dirB, outB, cpB)
    writeNodeFiles(dirB, 2 until 4, heights = 3)
    runStream(dirB, outB, cpB)

    val a = result(outA)
    val b = result(outB)
    assert(a.nonEmpty)
    // cross-node confirmations exist only once the second half arrived, so
    // a state-losing restart would drop or duplicate them
    assert(b == a, s"restarted run diverged: ${b.size} vs ${a.size} rows")
  }

  /** The q55-pattern restart harness shared by the J3/J4 machines: run A
    * uninterrupted over all four logs; run B processes two logs, stops,
    * and restarts from the SAME checkpoint for the other two. */
  private def restartParity(prefix: String,
      machine: (SparkSession, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.Dataset[_],
      resultCols: Seq[String]): Unit = {
    def runStream(logDir: String, out: String, cp: String): Unit = {
      val q = machine(spark, StreamingPipeline.events(spark, logDir, maxFilesPerTrigger = Some(1)))
        .toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def result(out: String): Seq[String] =
      spark.read.parquet(out)
        .select(resultCols.head, resultCols.tail: _*)
        .collect()
        .map(_.toSeq.map(String.valueOf).mkString("|"))
        .sorted.toSeq

    val dirA = tmp(s"$prefix-a"); val outA = tmp(s"$prefix-a-out")
    writeNodeFiles(dirA, 0 until 4, heights = 3)
    runStream(dirA, outA, tmp(s"$prefix-a-cp"))

    val dirB = tmp(s"$prefix-b"); val outB = tmp(s"$prefix-b-out")
    val cpB = tmp(s"$prefix-b-cp")
    writeNodeFiles(dirB, 0 until 2, heights = 3)
    runStream(dirB, outB, cpB)
    writeNodeFiles(dirB, 2 until 4, heights = 3)
    runStream(dirB, outB, cpB)

    val a = result(outA)
    val b = result(outB)
    assert(a.nonEmpty)
    assert(b == a, s"restarted run diverged: ${b.size} vs ${a.size} rows")
  }

  test("p2p machine restarted from checkpoint equals the uninterrupted run") {
    // all 8 families' entries are keyed state; the second half of the logs
    // carries the receives that confirm first-half sends
    restartParity("graft-recovery-p2p",
      (s, ev) => StreamingPipeline.p2pConfirmStream(s, ev),
      Seq("msgFamily", "sender", "receiver", "height", "sentNs", "receivedNs", "latencyMs"))
  }

  test("network-latency machine restarted from checkpoint equals the uninterrupted run") {
    // the epoch-buffered send queues + raw fallback pool are exactly the
    // state most at risk across a restart
    restartParity("graft-recovery-nl",
      (s, ev) => StreamingPipeline.networkLatencyStream(s, ev),
      Seq("rawHash", "sender", "receiver", "sentNs", "receivedNs", "matchType",
        "msgType", "latencyMs"))
  }

  test("streaming incremental dedup restarted from checkpoint equals the batch matcher") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a completely different sentence with nothing shared at all here",
      "pack my box with five dozen liquor jugs right now please")
    val docs = (0L until 40L).map { i =>
      val t = base(rnd.nextInt(3))
      (i, if (rnd.nextBoolean()) t else t + s" tail${rnd.nextInt(2)}")
    }
    val corpusDocs = docs.filter(_._1 % 5 != 0).toDF("doc_id", "text")
    val newDocs = docs.filter(_._1 % 5 == 0)
    val sigPath = tmp("inc-rec-sig") + "/sigs"
    graft.operators.Dedup.minhashSigTable(corpusDocs, "doc_id", "text", n = 3, k = 16)
      .write.mode("overwrite").parquet(sigPath)
    val storedSig = spark.read.parquet(sigPath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def writeBatch(dir: String, name: String, part: Seq[(Long, String)], mtime: Long): Unit = {
      val lines = part.map { case (i, t) =>
        s"""{"doc_id":$i,"ts":"2025-01-01T00:00:${"%02d".format(i % 60)}Z","text":"$t"}"""
      }
      val p = java.nio.file.Paths.get(s"$dir/$name")
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    def runStream(dir: String, out: String, cp: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(dir)
      val q = StreamingPipeline.incrementalDedupStream(stream, storedSig,
          "doc_id", "text", "ts", n = 3, k = 16, bandSize = 4,
          minJaccardPpm = 500000L, watermark = "10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def result(out: String) =
      spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

    val dirA = tmp("inc-rec-a"); val outA = tmp("inc-rec-a-out")
    writeBatch(dirA, "f1.json", newDocs.take(4), 1700000000000L)
    writeBatch(dirA, "f2.json", newDocs.drop(4), 1700000001000L)
    runStream(dirA, outA, tmp("inc-rec-a-cp"))

    val dirB = tmp("inc-rec-b"); val outB = tmp("inc-rec-b-out")
    val cpB = tmp("inc-rec-b-cp")
    writeBatch(dirB, "f1.json", newDocs.take(4), 1700000000000L)
    runStream(dirB, outB, cpB)
    writeBatch(dirB, "f2.json", newDocs.drop(4), 1700000001000L)
    runStream(dirB, outB, cpB)

    val a = result(outA)
    val b = result(outB)
    assert(a.nonEmpty, "fixture must produce matches")
    assert(b == a, s"restarted run diverged: ${b.size} vs ${a.size} rows")
    val batch = graft.operators.Dedup.minhashMatchesAgainst(
        graft.operators.Dedup.minhashSigTable(
          newDocs.toDF("doc_id", "text"), "doc_id", "text", n = 3, k = 16),
        storedSig, k = 16, bandSize = 4, minJaccardPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).sorted.toSeq
    assert(a == batch)
  }

  test("streaming curation restarted from checkpoint equals the uninterrupted run") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the one keyed aggregation behind the curation table must survive a
    // checkpoint restart: run A uninterrupted, run B stopped mid-corpus
    // and resumed from the same checkpoint, identical final tables
    val bench = Seq(
      (201L, "the quick brown fox jumps", "en")
    ).toDF("doc_id", "text", "lang")
    val index = StreamingPipeline.benchShingleIndex(bench, "text", n = 3)
    val corpusDocs = (1L to 24L).map { i =>
      val t =
        if (i % 4 == 0) "the quick brown fox jumps far"            // contaminated
        else if (i % 4 == 1) s"the a of clean document number${i} word" // keep-ish
        else if (i % 4 == 2) "11 22 33 44 55 66"                   // low_quality
        else s"the a of fine document number${i} word"
      val lang = if (i % 5 == 0) "de" else "en"                    // some mismatches
      (i, f"2025-01-01T00:00:${i % 60}%02dZ", t, lang)
    }
    val dfIdx = StreamingPipeline.bigramDfIndex(
      corpusDocs.map(d => (d._1, d._3)).toDF("doc_id", "text"), "doc_id", "text")
    val pusher = Seq((999L, "2025-01-01T02:00:00Z", "watermark pusher", "en"))
    def writeFile(dir: String, name: String, docs: Seq[(Long, String, String, String)], mtime: Long): Unit = {
      val lines = docs.map { case (id, ts, t, l) =>
        s"""{"doc_id":$id,"ts":"$ts","text":"$t","lang":"$l"}"""
      }
      val p = java.nio.file.Paths.get(s"$dir/$name")
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))
    def runStream(dir: String, out: String, cp: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(dir)
      val q = StreamingPipeline.curationStream(stream, index, dfIdx,
          "doc_id", "text", "ts", "lang", n = 3, watermark = "10 seconds",
          minFamiliarityPpm = 100000L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def result(out: String) =
      spark.read.parquet(out).filter(col("doc_id") =!= 999L)
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getLong(5), r.getBoolean(6), r.getString(7)))
        .sortBy(_._1).toSeq

    val dirA = tmp("graft-recovery-cur-a"); val outA = tmp("graft-recovery-cur-a-out")
    writeFile(dirA, "f1.json", corpusDocs.take(12), 1700000000000L)
    writeFile(dirA, "f2.json", corpusDocs.drop(12), 1700000001000L)
    writeFile(dirA, "f3.json", pusher, 1700000002000L)
    runStream(dirA, outA, tmp("graft-recovery-cur-a-cp"))

    val dirB = tmp("graft-recovery-cur-b"); val outB = tmp("graft-recovery-cur-b-out")
    val cpB = tmp("graft-recovery-cur-b-cp")
    writeFile(dirB, "f1.json", corpusDocs.take(12), 1700000000000L)
    runStream(dirB, outB, cpB)
    writeFile(dirB, "f2.json", corpusDocs.drop(12), 1700000001000L)
    writeFile(dirB, "f3.json", pusher, 1700000002000L)
    runStream(dirB, outB, cpB)

    val a = result(outA)
    val b = result(outB)
    assert(a.size == 24, s"append mode must finalize every corpus doc, saw ${a.size}")
    assert(a.map(_._7).toSet.size >= 3, "fixture must exercise several reasons")
    assert(b == a, s"restarted curation run diverged: ${b.size} vs ${a.size} rows")
  }

  test("streaming decontamination restarted from checkpoint equals batch on the same corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // bench set is STATIC; the corpus streams as json files; a far-future
    // "pusher" doc advances the watermark so append mode finalizes every
    // real doc's aggregation row
    val bench = Seq(
      (101L, "the quick brown fox jumps"),
      (102L, "pack my box with five dozen jugs")
    ).toDF("doc_id", "text")
    val index = StreamingPipeline.benchShingleIndex(bench, "text", n = 3)
    val corpusDocs = (1L to 30L).map { i =>
      val t = if (i % 3 == 0) "the quick brown fox jumps high today"
              else if (i % 3 == 1) s"clean document number $i with original words"
              else "" // zero-shingle docs must survive the stream too
      (i, f"2025-01-01T00:00:${i % 60}%02dZ", t)
    }
    val pusher = Seq((999L, "2025-01-01T02:00:00Z", "watermark pusher"))
    def writeFile(dir: String, name: String, docs: Seq[(Long, String, String)], mtime: Long): Unit = {
      val lines = docs.map { case (id, ts, t) =>
        s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""
      }
      val p = java.nio.file.Paths.get(s"$dir/$name")
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def runStream(dir: String, out: String, cp: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(dir)
      val q = StreamingPipeline.decontaminateStream(stream, index,
          "doc_id", "text", "ts", n = 3, watermark = "10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def result(out: String) =
      spark.read.parquet(out).filter(col("doc_id") =!= 999L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .sorted.toSeq

    // Run A: uninterrupted
    val dirA = tmp("graft-recovery-decon-a"); val outA = tmp("graft-recovery-decon-a-out")
    writeFile(dirA, "f1.json", corpusDocs.take(15), 1700000000000L)
    writeFile(dirA, "f2.json", corpusDocs.drop(15), 1700000001000L)
    writeFile(dirA, "f3.json", pusher, 1700000002000L)
    runStream(dirA, outA, tmp("graft-recovery-decon-a-cp"))

    // Run B: first half, stop, second half + pusher from the SAME checkpoint
    val dirB = tmp("graft-recovery-decon-b"); val outB = tmp("graft-recovery-decon-b-out")
    val cpB = tmp("graft-recovery-decon-b-cp")
    writeFile(dirB, "f1.json", corpusDocs.take(15), 1700000000000L)
    runStream(dirB, outB, cpB)
    writeFile(dirB, "f2.json", corpusDocs.drop(15), 1700000001000L)
    writeFile(dirB, "f3.json", pusher, 1700000002000L)
    runStream(dirB, outB, cpB)

    val a = result(outA)
    val b = result(outB)
    assert(a.size == 30, s"append mode must finalize every corpus doc, saw ${a.size}")
    assert(b == a, s"restarted run diverged: ${b.size} vs ${a.size} rows")
    // both equal the batch operator over the same bench + corpus split
    val batch = graft.operators.CorpusOps.decontaminate(
        bench.unionByName(corpusDocs.map(d => (d._1, d._3)).toDF("doc_id", "text")),
        "doc_id", "text", isBenchmark = col("doc_id") >= 100L, n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sorted.toSeq
    assert(a == batch)
  }
}
