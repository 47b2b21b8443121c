package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF-PQ index lifecycle: stored-vs-inline parity, the
  * incremental-add contract (frozen model ⇒ bit-identical codes), load
  * guards on mangled index dirs, and the trained-codebook build path.
  * The streaming probe is covered in
  * [[graft.streaming]] (StreamingAnnSpec). */
class AnnIndexSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .toSet

  test("stored index answers equal inline ivfPqTopK (nprobe=1 and 2)") {
    import spark.implicits._
    val idx = tmp("ann-idx-full")
    AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    for (np <- Seq(1, 2)) {
      val stored = collectTopK(AnnIndex.topK(
        embeddings.filter($"vec_id" < 20), "vec_id", "embedding", idx,
        k = 5, nprobe = np))
      val inline = collectTopK(Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = 8, dims = 64, k = 5, nprobe = np))
      assert(stored == inline, s"stored/inline diverged at nprobe=$np")
    }
  }

  test("incremental add against the frozen model equals the full build") {
    import spark.implicits._
    val full = tmp("ann-idx-full2"); val incr = tmp("ann-idx-incr")
    AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = full)
    AnnIndex.build(embeddings.filter($"vec_id" < 250), "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = incr)
    AnnIndex.add(embeddings.filter($"vec_id" >= 250), "vec_id", "embedding", incr)
    // the codes tables are row-for-row identical (order aside): encoding
    // depends only on the stored model, never on other corpus rows
    def codes(p: String) = spark.read.parquet(s"$p/codes").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(codes(incr) == codes(full))
    val a = collectTopK(AnnIndex.topK(embeddings.filter($"vec_id" < 20),
      "vec_id", "embedding", incr, k = 5, nprobe = 2))
    val b = collectTopK(AnnIndex.topK(embeddings.filter($"vec_id" < 20),
      "vec_id", "embedding", full, k = 5, nprobe = 2))
    assert(a == b)
  }

  test("trained-codebook build flows through the stored path") {
    import spark.implicits._
    val idx = tmp("ann-idx-trained")
    AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx, trainIters = 2)
    val stored = collectTopK(AnnIndex.topK(
      embeddings.filter($"vec_id" < 20), "vec_id", "embedding", idx,
      k = 5, nprobe = 2))
    val inline = collectTopK(Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = 8, dims = 64, k = 5, nprobe = 2, trainIters = 2))
    assert(stored == inline)
    // trained books genuinely differ from the designated-row ones
    val raw = tmp("ann-idx-raw")
    AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = raw)
    def books(p: String) = spark.read.parquet(s"$p/codebooks").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(books(idx) != books(raw))
  }

  test("serve plan prunes the cell-partitioned codes table to the probed cells") {
    import spark.implicits._
    val idx = tmp("ann-idx-pruned")
    AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    // a small query batch so the probed set is a strict subset of the
    // 8 cells (20 queries × nprobe=2 would touch every cell)
    val served = AnnIndex.topK(embeddings.filter($"vec_id" < 2),
      "vec_id", "embedding", idx, k = 5, nprobe = 1)
    // the codes scan must carry a PartitionFilter on `cell` (the literal
    // probed-cell IN list) — the nprobe/ncells file-pruning contract
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val partFilterLines = plan.linesIterator
      .filter(_.trim.startsWith("PartitionFilters:")).toSeq
    assert(partFilterLines.nonEmpty, s"no partitioned scan in plan:\n$plan")
    assert(partFilterLines.exists(l => l.contains("cell") && l.contains("IN")),
      s"codes scan not pruned by probed cells:\n${partFilterLines.mkString("\n")}")
    // and the pruned scan actually reads fewer partitions than exist
    // (descend through the AQE wrapper to reach the file scans)
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(fileScans) ++ other.subqueries.flatMap(fileScans)
    }
    val scans = fileScans(served.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    assert(scans.nonEmpty, "no FileSourceScanExec over the partitioned codes table")
    val totalCells = spark.read.parquet(s"$idx/codes").select("cell").distinct().count()
    val readCells  = scans.map(_.selectedPartitions.partitionCount).sum
    assert(readCells < totalCells,
      s"probe read $readCells of $totalCells cell partitions - no pruning")
    // correctness unchanged by pruning
    assert(collectTopK(served) == collectTopK(Similarity.ivfPqTopK(
      embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 2,
      m = 8, dims = 64, k = 5, nprobe = 1)))
  }

  test("stored-index recall equals inline recall and is monotone in nprobe") {
    import spark.implicits._
    // The PqSpec recall gate extended to the STORED path (VERDICT r8
    // item 7): codes are bit-identical to inline encoding, so recall@5
    // must be EQUAL (not just close), and probing more cells of the
    // stored index can only widen the candidate set.
    val idx = tmp("ann-idx-recall")
    AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    val rows = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1000000.0d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .sortBy(_._1)
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = rows.filter(_._1 < 20).map { case (qid, qv) =>
      qid -> rows.filter(_._1 != qid)
        .map { case (cid, cv) => (l2(qv, cv), cid) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("cand_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      exact.map { case (q, s) => got.getOrElse(q, Set.empty).count(s).toDouble / 5 }
        .sum / exact.size
    }
    val q20 = embeddings.filter($"vec_id" < 20)
    val storedByNp = Seq(1, 2).map { np =>
      val stored = recall(AnnIndex.topK(q20, "vec_id", "embedding", idx, k = 5, nprobe = np))
      val inline = recall(Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = 8, dims = 64, k = 5, nprobe = np))
      info(s"recall@5 nprobe=$np: stored=$stored inline=$inline")
      assert(stored == inline, s"stored recall $stored != inline recall $inline at nprobe=$np")
      stored
    }
    assert(storedByNp(1) >= storedByNp(0) - 1e-9,
      s"stored nprobe=2 recall (${storedByNp(1)}) lost to nprobe=1 (${storedByNp(0)})")
    assert(storedByNp(0) >= 0.08, s"stored-index recall collapsed: ${storedByNp(0)}")
  }

  test("compactCodes: fragmented adds rewrite to one file per cell, answers and layout preserved") {
    import spark.implicits._
    val idx = tmp("ann-idx-compact")
    AnnIndex.build(embeddings.filter($"vec_id" < 100), "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    // fragment: four incremental adds, each appending a file set per cell
    for (lo <- Seq(100, 200, 300, 400))
      AnnIndex.add(embeddings.filter($"vec_id" >= lo && $"vec_id" < lo + 100),
        "vec_id", "embedding", idx)
    def codeFiles(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$idx/codes"))
    }
    val q20 = embeddings.filter($"vec_id" < 20)
    val before = collectTopK(AnnIndex.topK(q20, "vec_id", "embedding", idx, k = 5, nprobe = 2))
    val cells = spark.read.parquet(s"$idx/codes").select("cell").distinct().count()
    val fragmented = codeFiles()
    assert(fragmented > cells, s"fixture must fragment: $fragmented files over $cells cells")
    AnnIndex.compactCodes(spark, idx)
    assert(codeFiles() == cells, s"expected one file per cell, saw ${codeFiles()} for $cells cells")
    // still cell-partitioned (the pruning contract) and answers identical
    assert(new java.io.File(s"$idx/codes").listFiles().exists(_.getName.startsWith("cell=")),
      "compaction must preserve the cell-partitioned layout")
    assert(collectTopK(AnnIndex.topK(q20, "vec_id", "embedding", idx, k = 5, nprobe = 2)) == before)
    // adds keep working after compaction, as does a subsequent compaction
    AnnIndex.add(embeddings.filter($"vec_id" >= 500 && $"vec_id" < 520), "vec_id", "embedding", idx)
    AnnIndex.compactCodes(spark, idx)
    assert(collectTopK(AnnIndex.topK(q20, "vec_id", "embedding", idx, k = 5, nprobe = 2)) == before)
  }

  test("auto-compaction: file count stays bounded across 128 adds") {
    import spark.implicits._
    val idx = tmp("ann-idx-auto")
    AnnIndex.build(embeddings.filter($"vec_id" < 120), "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    def codeFiles(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$idx/codes"))
    }
    val threshold = 24
    // one add appends at most one file per (task, touched cell); tiny
    // 3-row batches bound that at 3 files — so a bounded index proves the
    // trigger fires, and the ceiling is threshold + one add's appends
    var maxSeen = 0
    var compactions = 0
    for (i <- 0 until 128) {
      val lo = 120 + (i % 80) * 3
      AnnIndex.add(embeddings.filter($"vec_id" >= lo && $"vec_id" < lo + 3),
        "vec_id", "embedding", idx, compactAboveFiles = threshold)
      val n = codeFiles()
      maxSeen = math.max(maxSeen, n)
      val cells = new java.io.File(s"$idx/codes").listFiles()
        .count(_.getName.startsWith("cell="))
      if (n == cells) compactions += 1
    }
    assert(maxSeen <= threshold + 3,
      s"file count reached $maxSeen despite the $threshold-file auto-compaction trigger")
    assert(compactions > 0, "the trigger never fired across 128 fragmenting adds")
    // the maintained index still serves correctly (vs a frozen-model
    // truth: the same adds with compaction disabled)
    val plain = tmp("ann-idx-plain")
    AnnIndex.build(embeddings.filter($"vec_id" < 120), "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = plain)
    for (i <- 0 until 128) {
      val lo = 120 + (i % 80) * 3
      AnnIndex.add(embeddings.filter($"vec_id" >= lo && $"vec_id" < lo + 3),
        "vec_id", "embedding", plain, compactAboveFiles = 0)
    }
    val q20 = embeddings.filter($"vec_id" < 20)
    assert(
      collectTopK(AnnIndex.topK(q20, "vec_id", "embedding", idx, k = 5, nprobe = 2)) ==
        collectTopK(AnnIndex.topK(q20, "vec_id", "embedding", plain, k = 5, nprobe = 2)),
      "auto-compacted index diverged from the uncompacted same-adds index")
  }

  test("compactCodes crash states heal before the next read (add and serve paths)") {
    import spark.implicits._
    val idx = tmp("ann-idx-crash")
    AnnIndex.build(embeddings.filter($"vec_id" < 300), "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    val codes = s"$idx/codes"
    val q20 = embeddings.filter($"vec_id" < 20)
    val want = collectTopK(AnnIndex.topK(q20, "vec_id", "embedding", idx, k = 5, nprobe = 2))
    def copyDir(from: String, to: String): Unit =
      org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(from), new java.io.File(to))
    def assertServes(): Unit = {
      assert(collectTopK(AnnIndex.topK(q20, "vec_id", "embedding", idx, k = 5, nprobe = 2)) == want)
      assert(!new java.io.File(codes + ".compact-tmp").exists)
      assert(!new java.io.File(codes + ".compact-backup").exists)
    }
    // crash mid-tmp-write
    copyDir(codes, codes + ".compact-tmp")
    assertServes()
    // crash between the renames (live moved aside)
    copyDir(codes, codes + ".compact-tmp")
    assert(new java.io.File(codes).renameTo(new java.io.File(codes + ".compact-backup")))
    assertServes()
    // crash after promote (backup left behind)
    copyDir(codes, codes + ".compact-backup")
    assertServes()
  }

  test("load guards: mangled index dirs fail loudly") {
    import spark.implicits._
    val idx = tmp("ann-idx-mangled")
    AnnIndex.build(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, m = 8, dims = 64,
      indexDir = idx)
    // missing subspace: drop s=3 from the codebooks table
    val cb = spark.read.parquet(s"$idx/codebooks").filter($"s" =!= 3).collect()
    val cbDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cb.toIndexedSeq),
      spark.read.parquet(s"$idx/codebooks").schema)
    cbDf.write.mode("overwrite").parquet(s"$idx/codebooks2")
    // swap in the mangled table via a fresh dir assembled from parts
    val bad = tmp("ann-idx-bad")
    spark.read.parquet(s"$idx/centroids").write.parquet(s"$bad/centroids")
    cbDf.write.parquet(s"$bad/codebooks")
    spark.read.parquet(s"$idx/codes").write.parquet(s"$bad/codes")
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.topK(embeddings.filter($"vec_id" < 20), "vec_id", "embedding",
        bad, k = 5, nprobe = 2).collect()
    }
    assert(ex.getMessage.contains("missing subspaces"))
  }
}
