package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed NEAR-dup → curation topology
  * ([[StreamingPipeline.selfMaintainingCurationSink]]): the
  * self-maintaining MinHash index's survivor stream feeds the curation
  * gates per batch inside one foreachBatch.
  *
  * Parity target (VERDICT r8 item 8): on bridge-free input with arrival
  * order == id order, the curation table must equal the batch
  * [[graft.operators.CorpusOps.curationDecisions]] (q99) restricted to
  * the near-dup canonical survivor ids — the gate columns are computed
  * by the same formulation, so equality is bit-for-bit. Plus
  * checkpoint-restart parity across the sketch + both decision tables,
  * and replayed-batch idempotency.
  *
  * Fixture notes: near-dup members are NON-exact (tail tokens), so the
  * q99 exact-canonical gate is true for every survivor; no two
  * `too_short` docs share text (identical unshingleable docs are the
  * one documented divergence — the near-dup index cannot see them).
  */
class StreamingCurationChainSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // letter-only 20-token cluster vocabularies (digits would trip the
  // quality gate for every doc and collapse reason diversity)
  private def clusterText(c: Char): String =
    "abcdefghijklmnopqrst".map(j => s"$c${j}x").mkString(" ")

  // Corpus (streamed; bench docs are NEVER in the stream):
  //  1: cluster-a canonical          -> survives, gates pass ("keep")
  //  2: near-dup of 1 (non-exact)    -> near-dup drop (batch_dup/stored_dup)
  //  3: cluster-b canonical, declared en but predicted unknown -> lang_mismatch
  //  4: near-dup of 3                -> near-dup drop
  //  5: digit-heavy                  -> low_quality
  //  6: shares a 3-gram with bench   -> contaminated
  //  7: unique letters, low bigram df -> unfamiliar
  //  8: too_short ("aq bq"), kept by dedup, fails quality in curation
  private val docs: Seq[(Long, String, String)] = Seq(
    (1L, clusterText('a'), "unknown"),
    (2L, clusterText('a') + " atail", "unknown"),
    (3L, clusterText('b'), "en"),
    (4L, clusterText('b') + " btail", "en"),
    (5L, "11 22 33 44 55 66 77", "unknown"),
    (6L, "foo bar baz " + clusterText('c'), "unknown"),
    (7L, "unua duo tri kvar kvin ses sep ok naux dek", "unknown"),
    (8L, "aq bq", "unknown"))

  private val bench: Seq[(Long, String, String)] = Seq(
    (1000L, "foo bar baz qux quux corge", "unknown"))

  private lazy val all = {
    import spark.implicits._
    (docs ++ bench).toDF("doc_id", "text", "lang")
  }
  private lazy val benchIndex = {
    import spark.implicits._
    StreamingPipeline.benchShingleIndex(all.filter($"doc_id" >= 1000L), "text", n = 3)
  }
  private lazy val dfIdx = StreamingPipeline.bigramDfIndex(all, "doc_id", "text")
  private val minFam = 150000L

  private def tsIso(i: Long): String = f"2025-01-01T00:00:${i % 60}%02dZ"

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))

  private def writeFile(dir: String, name: String, part: Seq[(Long, String, String)],
                        mtime: Long): Unit = {
    val lines = part.map { case (id, t, l) =>
      s"""{"doc_id":$id,"ts":"${tsIso(id)}","text":"$t","lang":"$l"}"""
    }
    val p = java.nio.file.Paths.get(s"$dir/$name")
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(mtime))
  }

  private def runStream(in: String, root: String, cp: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val q = StreamingPipeline.selfMaintainingCurationSink(stream, "doc_id", "text",
      "ts", "lang", n = 3, k = 16, bandSize = 4, minJaccardPpm = 600000L,
      benchIndex = benchIndex, bigramDf = dfIdx, curationN = 3,
      minFamiliarityPpm = minFam,
      sketchPath = s"$root/sketch", decisionsPath = s"$root/decisions",
      curationPath = s"$root/curation", checkpointLocation = cp)
    try q.processAllAvailable() finally q.stop()
  }

  private type Decision = (Long, Long, Boolean, Boolean, Boolean, Long, Boolean, String)

  private def curationRows(root: String): Seq[Decision] =
    spark.read.parquet(s"$root/curation")
      .select(col("doc_id"), col("n_tokens"), col("quality_ok"), col("lang_ok"),
        col("contaminated"), col("familiarity_ppm"), col("keep"), col("reason"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getLong(5), r.getBoolean(6), r.getString(7)))
      .sortBy(_._1).toSeq

  private lazy val batchOracle: Seq[Decision] = {
    import spark.implicits._
    // q99 on the full corpus, restricted to the near-dup survivor ids
    val pairs = graft.operators.Dedup.minhashLshPairs(
      all.filter($"doc_id" < 1000L), "doc_id", "text",
      n = 3, k = 16, bandSize = 4, minJaccardPpm = 600000L)
    val nonCanon = graft.operators.Dedup.connectedComponents(pairs, "d1", "d2")
      .filter(col("id") =!= col("comp")).collect().map(_.getLong(0)).toSet
    val survivorIds = docs.map(_._1).toSet -- nonCanon
    graft.operators.CorpusOps.curationDecisions(all, "doc_id", "text",
        declaredLang = $"lang", isBenchmark = $"doc_id" >= 1000L,
        n = 3, minFamiliarityPpm = minFam)
      .filter($"doc_id".isin(survivorIds.toSeq: _*))
      .select($"doc_id", $"n_tokens", $"quality_ok", $"lang_ok",
        $"contaminated", $"familiarity_ppm", $"keep", $"reason")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getLong(5), r.getBoolean(6), r.getString(7)))
      .sortBy(_._1).toSeq
  }

  test("near-dup survivor stream through curation equals batch q99 on canonical rows") {
    val in = tmp("ndc-in"); val root = tmp("ndc")
    writeFile(in, "f1.json", docs.take(3), 1700000000000L)
    writeFile(in, "f2.json", docs.slice(3, 6), 1700000001000L)
    writeFile(in, "f3.json", docs.drop(6), 1700000002000L)
    runStream(in, root, tmp("ndc-cp"))
    val got = curationRows(root)
    // the near-dup stage dropped exactly docs 2 and 4 (cross-batch and
    // within-corpus near-dups), before any curation gate ran
    assert(got.map(_._1) == Seq(1L, 3L, 5L, 6L, 7L, 8L))
    assert(got.map(d => d._1 -> d._8).toMap == Map(
      1L -> "keep", 3L -> "lang_mismatch", 5L -> "low_quality",
      6L -> "contaminated", 7L -> "unfamiliar", 8L -> "low_quality"))
    assert(got == batchOracle, "composed chain diverged from batch q99 on survivors")
  }

  test("restarted composed chain recovers sketch state and rewrites nothing") {
    val refIn = tmp("ndc-ref-in"); val refRoot = tmp("ndc-ref")
    writeFile(refIn, "f1.json", docs.take(3), 1700000000000L)
    writeFile(refIn, "f2.json", docs.slice(3, 6), 1700000001000L)
    writeFile(refIn, "f3.json", docs.drop(6), 1700000002000L)
    runStream(refIn, refRoot, tmp("ndc-ref-cp"))

    // run B stops after f1; doc 4 (near-dup of f1's doc 3) arrives after
    // the restart, so B only matches A if the sketch grown before the
    // stop still serves after it
    val in = tmp("ndc-b-in"); val root = tmp("ndc-b"); val cp = tmp("ndc-b-cp")
    writeFile(in, "f1.json", docs.take(3), 1700000000000L)
    runStream(in, root, cp)
    writeFile(in, "f2.json", docs.slice(3, 6), 1700000001000L)
    writeFile(in, "f3.json", docs.drop(6), 1700000002000L)
    runStream(in, root, cp)
    assert(curationRows(root) == curationRows(refRoot))

    // replay the last batch verbatim: identical tables, no sketch growth
    val lastBatch = spark.read.parquet(s"$root/decisions")
      .agg(max(col("batch_id").cast("long"))).collect()(0).getLong(0)
    val nSketch = spark.read.parquet(s"$root/sketch").count()
    val before = curationRows(root)
    StreamingPipeline.processCurationChainBatch(
      spark.createDataFrame(
        spark.sparkContext.parallelize(docs.drop(6).map { case (id, t, l) =>
          org.apache.spark.sql.Row(id, java.sql.Timestamp.from(
            java.time.Instant.parse(tsIso(id))), t, l)
        }), schema),
      lastBatch, "doc_id", "text", "ts", "lang",
      n = 3, k = 16, bandSize = 4, minJaccardPpm = 600000L,
      benchIndex = benchIndex, bigramDf = dfIdx, curationN = 3,
      minFamiliarityPpm = minFam,
      sketchPath = s"$root/sketch", decisionsPath = s"$root/decisions",
      curationPath = s"$root/curation")
    assert(spark.read.parquet(s"$root/sketch").count() == nSketch,
      "replayed batch must not grow the sketch")
    assert(curationRows(root) == before, "replayed curation rows must be identical")
  }

  test("composed survivor curation is slicing-invariant") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    for (seed <- Seq(71L, 72L)) {
      val rnd = new scala.util.Random(seed)
      val root = tmp(s"ndc-rand-$seed")
      val mem = MemoryStream[(Long, java.sql.Timestamp, String, String)]
      val q = StreamingPipeline.selfMaintainingCurationSink(
        mem.toDF().toDF("doc_id", "ts", "text", "lang"), "doc_id", "text",
        "ts", "lang", n = 3, k = 16, bandSize = 4, minJaccardPpm = 600000L,
        benchIndex = benchIndex, bigramDf = dfIdx, curationN = 3,
        minFamiliarityPpm = minFam,
        sketchPath = s"$root/sketch", decisionsPath = s"$root/decisions",
        curationPath = s"$root/curation", checkpointLocation = tmp(s"ndc-rand-cp-$seed"))
      try {
        val rows = docs.map { case (id, t, l) =>
          (id, java.sql.Timestamp.from(java.time.Instant.parse(tsIso(id))), t, l)
        }
        val nChunks = 1 + rnd.nextInt(4)
        val size = math.max(1, (rows.size + nChunks - 1) / nChunks)
        rows.grouped(size).foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      assert(curationRows(root) == batchOracle, s"seed $seed")
    }
  }
}
