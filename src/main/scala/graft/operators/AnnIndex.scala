package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index lifecycle — the stored-sketch pattern
  * ([[graft.operators.Dedup]]'s q93 signature table) applied to ANN.
  *
  * A production vector index is not rebuilt per query: it is
  * materialized ONCE next to the corpus and then served. This object
  * stores the non-residual IVF-PQ layout ([[Similarity.ivfPqTopK]]) as
  * three warehouse tables under an index directory:
  *
  *   - `centroids` — (cid, cv, cn): the coarse quantizer (gated model
  *     state, k rows).
  *   - `codebooks` — (s, pos, cv, cn): the per-subspace PQ codebooks in
  *     position order (optionally k-means-trained at build time,
  *     [[Similarity.trainBooks]]).
  *   - `codes` — (cand_id, cell, code0..code{m-1}): the encoded corpus —
  *     the only table that scales with the data, m+2 longs per vector
  *     (the PQ memory win: 64 float dims → 8 byte-sized codes at
  *     production k=256).
  *
  * Lifecycle verbs: [[build]] (scan corpus once, write all three),
  * [[add]] (encode NEW vectors against the STORED model — no retrain,
  * no rewrite of existing codes — and append), [[topK]] (serve a query
  * batch from the stored tables), [[probeStream]] (serve a continuous
  * query stream — the stream-static serving shape). Batch-vs-stored
  * parity is oracle-checked: querying a stored full-corpus index equals
  * [[Similarity.ivfPqTopK]] inline (q103 vs q102's oracle), and a
  * build-then-add split equals the full build (q104) because encoding
  * depends only on the stored model, never on other corpus rows.
  *
  * Scale: model tables are tiny and collected driver-side at load (the
  * kmeans-seed pattern, loudly size-checked); `codes` is WRITTEN
  * PARTITIONED BY `cell`, and [[topK]] prunes it with the literal probed
  * cell set — a probe reads nprobe/ncells of the index files, not all of
  * them (the main serving-latency lever at 1e9 codes). Queries broadcast
  * (gated) exactly as in [[Similarity.ivfPqTopK]]; the stream side keeps
  * per-query state bounded at k entries by [[graft.agg.BoundedTopKAgg]].
  */
object AnnIndex {

  /** Hard ceiling when re-collecting stored model tables: a mangled
    * index directory (e.g. `codes` copied over `codebooks`) must fail
    * loudly at load, not OOM the driver. */
  private val MaxModelRows = 1 << 20

  /** Encode: cell by codegen'd cosine argmax, all m codes in one
    * codegen'd pass — identical arithmetic to [[Similarity.ivfPqTopK]]'s
    * candidate side (same expressions, so stored codes are
    * bit-identical to inline ones). */
  private def encoded(q: DataFrame, idCol: String,
                      cents: Seq[(Long, Seq[Long], Long)],
                      posBooks: IndexedSeq[Seq[(Long, Seq[Long], Long)]],
                      m: Int, sub: Int): DataFrame =
    q.withColumn("cell",
        graft.functions.VectorExprs.nearestCell(col("qvec"), col("qnorm2"), cents))
      .withColumn("ce", Similarity.pqCodesCol(posBooks, m, sub))
      .select(col(idCol).cast("long").as("cand_id") +: col("cell") +:
        (0 until m).map(s => element_at(col("ce"), s + 1).as(s"code$s")): _*)

  /** Build the index from a corpus scan: coarse centroids from
    * `isCentroid` rows, PQ codebooks from `isCode` rows (k-means-refined
    * for `trainIters` Lloyd rounds when > 0), then ONE narrow encode
    * pass over the corpus. Zero-norm vectors carry no cosine cell and
    * are excluded (the [[Similarity.ivfPqTopK]] rule). */
  def build(df: DataFrame, idCol: String, vecCol: String,
            isCentroid: Column, isCode: Column,
            m: Int, dims: Int, indexDir: String, trainIters: Int = 0,
            maxCentroids: Int = 4096, maxCodes: Int = 4096): Unit = {
    require(dims % m == 0, s"pq: dims=$dims not divisible by m=$m subspaces")
    val sub = dims / m
    val q = Similarity.quantized(df, vecCol).filter(col("qnorm2") > 0L)
    val books0 = Similarity.pqCodebooks(q.filter(isCode), idCol, m, dims, maxCodes)
    val posBooks = Similarity.toPosBooks(
      if (trainIters > 0) Similarity.trainBooks(q.select(col("qvec")), books0, m, sub, trainIters)
      else books0)
    val cents = Similarity.collectCents(q, idCol, isCentroid, maxCentroids, "AnnIndex.build")
    val spark = df.sparkSession
    import spark.implicits._
    cents.toDF("cid", "cv", "cn")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    posBooks.zipWithIndex
      .flatMap { case (book, s) => book.map { case (pos, cv, cn) => (s, pos, cv, cn) } }
      .toDF("s", "pos", "cv", "cn")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    encoded(q, idCol, cents, posBooks, m, sub)
      .write.partitionBy("cell").mode("overwrite").parquet(s"$indexDir/codes")
  }

  /** The stored `codes` table, read with `cell` pinned to LongType.
    * `cell` is a PARTITION column (directory-encoded), so Spark's
    * partition-value inference would narrow 0..4095 to IntegerType and
    * silently change the serve output schema; supplying the schema
    * (footer read only — no data scan) keeps it the LongType the encode
    * side wrote and keeps the join key cast-free (pruning-eligible). */
  private def codesTable(spark: SparkSession, indexDir: String): DataFrame = {
    val path = s"$indexDir/codes"
    // heal a crash mid-[[compactCodes]] before anything reads the table
    DirSwap.recover(spark, path)
    val inferred = spark.read.parquet(path).schema
    val pinned = org.apache.spark.sql.types.StructType(inferred.map(f =>
      if (f.name == "cell") f.copy(dataType = org.apache.spark.sql.types.LongType) else f))
    spark.read.schema(pinned).parquet(path)
  }

  /** Re-collect the stored model state driver-side: cid-ascending
    * centroids (the tie-break order every nearest-cell expression
    * assumes) and position-ordered codebooks. Returns
    * (cents, posBooks, m, sub). */
  private def loadModel(spark: SparkSession, indexDir: String)
  : (Seq[(Long, Seq[Long], Long)], IndexedSeq[Seq[(Long, Seq[Long], Long)]], Int, Int) = {
    val centRows = spark.read.parquet(s"$indexDir/centroids")
      .select(col("cid"), col("cv"), col("cn")).limit(MaxModelRows + 1).collect()
    require(centRows.nonEmpty && centRows.length <= MaxModelRows,
      s"AnnIndex: stored centroid table has ${centRows.length} rows - not a model table")
    val cents = centRows.map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val bookRows = spark.read.parquet(s"$indexDir/codebooks")
      .select(col("s"), col("pos"), col("cv"), col("cn")).limit(MaxModelRows + 1).collect()
    require(bookRows.nonEmpty && bookRows.length <= MaxModelRows,
      s"AnnIndex: stored codebook table has ${bookRows.length} rows - not a model table")
    val byS = bookRows.map(r => (r.getInt(0), r.getLong(1).toInt, r.getSeq[Long](2), r.getLong(3)))
      .groupBy(_._1)
    val m = byS.keys.max + 1
    require(byS.keySet == (0 until m).toSet,
      s"AnnIndex: stored codebooks missing subspaces (have ${byS.keySet.toSeq.sorted})")
    val posBooks = (0 until m).map { s =>
      val entries = byS(s).sortBy(_._2)
      require(entries.map(_._2).toSeq == entries.indices.toSeq,
        s"AnnIndex: stored codebook positions for subspace $s are not dense")
      entries.map { case (_, pos, cv, cn) => (pos.toLong, cv, cn) }.toSeq
    }
    (cents, posBooks, m, posBooks.head.head._2.length)
  }

  /** Incremental add: encode `df`'s vectors against the STORED model
    * (centroids + codebooks stay frozen — the FAISS `add` contract:
    * assignment and codes depend only on the model, so added codes are
    * bit-identical to what a full rebuild would produce) and append to
    * the `codes` table.
    *
    * Maintenance is AUTOMATED on the add cadence: when the append leaves
    * more than `compactAboveFiles` data files under `codes`,
    * [[compactCodes]] runs before returning — the streaming sketch's
    * `compactEveryBatches` policy, file-count-triggered because serve
    * latency tracks FILE count, not row count (measured: flat to ~1k
    * files, 1.6× recovery at 4k — PLANS.md round 10; hence the default).
    * `add` is the index's single maintenance owner by contract, so the
    * trigger lives here, not on the read paths. Pass `0` to disable and
    * schedule [[compactCodes]] externally. */
  def add(df: DataFrame, idCol: String, vecCol: String, indexDir: String,
          compactAboveFiles: Int = 1024): Unit = {
    DirSwap.recover(df.sparkSession, s"$indexDir/codes")
    val (cents, posBooks, m, sub) = loadModel(df.sparkSession, indexDir)
    val q = Similarity.quantized(df, vecCol).filter(col("qnorm2") > 0L)
    encoded(q, idCol, cents, posBooks, m, sub)
      .write.partitionBy("cell").mode("append").parquet(s"$indexDir/codes")
    if (compactAboveFiles > 0) maybeCompact(df.sparkSession, indexDir, compactAboveFiles)
  }

  /** File-count trigger for the add-cadence compaction: ONE recursive
    * listing of the codes directory (a single batched NameNode call on
    * HDFS), counting data files and stopping at the threshold — the
    * listing is cheap next to the add's own encode+write job. */
  private def maybeCompact(spark: SparkSession, indexDir: String,
                           compactAboveFiles: Int): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var n = 0
    val it = fs.listFiles(path, true)
    while (n <= compactAboveFiles && it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    if (n > compactAboveFiles) compactCodes(spark, indexDir)
  }

  /** Compact the `codes` table back to ONE file per cell: every [[add]]
    * appends a file set into each touched cell directory, so repeated
    * adds fragment the index exactly the way the streaming sketch table
    * fragmented before its online compactor — and serve latency tracks
    * file count, not row count (measured table in PLANS.md). Same
    * crash-safe swap ([[DirSwap]]): a kill at any point leaves a complete
    * copy, healed at the next [[add]]/[[topK]]/[[probeStream]] before the
    * table is read. Shuffling on `cell` co-locates each cell in one task,
    * so the writer emits one right-sized file per cell — the layout
    * [[build]] produces, restored. [[add]] runs it automatically past its
    * file-count threshold; call directly only when that trigger is
    * disabled. */
  def compactCodes(spark: SparkSession, indexDir: String): Unit =
    DirSwap.swapRewrite(spark, s"$indexDir/codes")(_.repartition(col("cell")))(
      (df, out) => df.write.partitionBy("cell").mode("overwrite").parquet(out))

  /** Serve a query batch from the stored index: probe the `nprobe`
    * nearest cells, score that cells' codes by precomputed-table ADC,
    * rank globally per query (adist2 ASC, cand_id ASC) — the
    * [[Similarity.ivfPqTopK]] semantics with the corpus side read from
    * the warehouse instead of re-encoded. */
  def topK(queries: DataFrame, idCol: String, vecCol: String, indexDir: String,
           k: Int, nprobe: Int = 1, maxQueries: Int = 10000): DataFrame = {
    val (cents, posBooks, m, sub) = loadModel(queries.sparkSession, indexDir)
    val q = Similarity.quantized(queries, vecCol).filter(col("qnorm2") > 0L)
    val queries0 = q
      .select(col(idCol).cast("long").as("query_id"), col("qvec").as("qv"),
        graft.functions.VectorExprs
          .nearestCells(col("qvec"), col("qnorm2"), cents, nprobe).as("probes"))
    val nQueries = queries0.limit(maxQueries + 1).count()
    require(nQueries <= maxQueries,
      s"AnnIndex.topK: query side exceeds maxQueries=$maxQueries rows - queries " +
        "are broadcast against the stored code table")
    // The probed cell set is KNOWN at query time (≤ nprobe × nQueries,
    // capped by the centroid count), so prune the cell-partitioned codes
    // table with a literal IN — static partition pruning, visible as
    // PartitionFilters in the scan, deterministic where DPP is heuristic.
    // A probe then reads nprobe/ncells of the index, not all of it.
    val probedCells: Array[Long] = queries0
      .select(explode(col("probes")).as("cell")).distinct()
      .collect().map(_.getLong(0))
    val codes = codesTable(queries.sparkSession, indexDir)
      .filter(col("cell").isin(probedCells.toIndexedSeq.map(Long.box): _*))
    val qdf = Similarity.withAdcTables(queries0, "qv", m, sub, posBooks)
      .drop("qv")
      .withColumn("cell", explode(col("probes")))
      .drop("probes")
    // bounded min-k aggregate, not a rank window: a probed cell's codes
    // never sort or shuffle — ≤ k entries per query cross the shuffle
    // (the same formulation probeStream uses, bit-identical ranking)
    broadcast(qdf)
      .join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adist2", Similarity.adcDistance(m))
      .groupBy(col("query_id"))
      .agg(graft.agg.NativeTopK
        .minK(k, col("adist2"), col("cand_id"), col("cell")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r0", "e")))
      .select(col("query_id"), col("e.cell").as("cell"), col("e.cand_id").as("cand_id"),
        (col("r0") + 1).cast("int").as("rank"), col("e.adist2").as("adist2"))
  }

  /** Serve a CONTINUOUS query stream from the stored index — the ANN
    * serving topology: per micro-batch, each query row probes its
    * `nprobe` nearest cells (model state is literal in the plan),
    * stream-static-joins the stored `codes` table on `cell` (Spark
    * re-plans the static side per batch), ADC-scores, and emits the
    * per-query top-k once the watermark closes the query's window.
    *
    * Top-k on a stream can't use a rank window; instead the candidates
    * aggregate per (window, query) through [[graft.agg.BoundedTopKAgg]],
    * whose `TopKEntry` ordering is exactly the batch rank order
    * (adist2 ASC, cand_id ASC), so emitted rows are bit-identical to
    * [[topK]] on the same closed input. State per (window, query) is the
    * aggregate's buffer — AT MOST k entries (eviction on insert), never
    * the full candidate list — and is dropped at the watermark. */
  def probeStream(queryStream: DataFrame, idCol: String, vecCol: String,
                  tsCol: String, indexDir: String, k: Int, nprobe: Int = 1,
                  watermark: String = "10 seconds",
                  windowDur: String = "1 minute"): DataFrame = {
    val spark = queryStream.sparkSession
    val (cents, posBooks, m, sub) = loadModel(spark, indexDir)
    // Stream side: the probed cells differ per micro-batch, so no static
    // IN-list is possible here; the cell-partitioned layout still lets the
    // per-batch re-planned static side skip non-probed cells via runtime
    // partition pruning when available (a production server would probe
    // per-batch inside foreachBatch with the topK path to get the same
    // literal pruning).
    val codes = codesTable(spark, indexDir)
    val q = Similarity.quantized(queryStream, vecCol).filter(col("qnorm2") > 0L)
    val queries0 = q
      .select(col(idCol).cast("long").as("query_id"), col(tsCol), col("qvec").as("qv"),
        graft.functions.VectorExprs
          .nearestCells(col("qvec"), col("qnorm2"), cents, nprobe).as("probes"))
    val qdf = Similarity.withAdcTables(queries0, "qv", m, sub, posBooks)
      .drop("qv")
      .withColumn("cell", explode(col("probes")))
      .drop("probes")
    qdf
      .join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adist2", Similarity.adcDistance(m))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col("query_id"))
      .agg(graft.agg.NativeTopK
        .minK(k, col("adist2"), col("cand_id"), col("cell")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r0", "e")))
      .select(col("query_id"), col("e.cell").as("cell"), col("e.cand_id").as("cand_id"),
        (col("r0") + 1).cast("int").as("rank"), col("e.adist2").as("adist2"))
  }
}
