package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{AnnIndex, Similarity}

/** Similarity-search queries over the `embeddings` table (64-dim float
  * vectors). Quantized-integer arithmetic (see [[Similarity]]) makes
  * the cosine scores — and thus rankings — bit-identical to the DuckDB
  * oracle.
  */
object VectorQueries {

  /** Embedding dimensionality of the `embeddings` table — the single
    * constant every vector oracle's `generate_series(1, Dims)` and every
    * Spark-side `dims =` parameter interpolate, so a dims change can't
    * silently desync the oracles from the operators. */
  private val Dims = 64

  /** PQ subspace count for q94/q95 — `Dims / PqM` dims per subspace; the
    * oracle SQL interpolates both so the split can't silently desync. */
  private val PqM = 8
  private val PqSub = Dims / PqM

  /** Shared quantization SQL for the oracles. */
  private val qvecSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"

  // ---------------------------------------------------------------- q27
  /** Brute-force exact cosine top-5 for the first 20 vectors as queries —
    * the ANN correctness baseline. */
  def q27CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.bruteForceTopK(
      Tables(spark, dir).embeddings, "vec_id", "embedding",
      isQuery = $"vec_id" < 20, k = 5)
  }

  // ---------------------------------------------------------------- q28
  /** Random-hyperplane LSH ANN (8 planes → 256 buckets): the 100 TB scale
    * path — candidates come from a signature equi-join, not a cross
    * product. */
  def q28LshAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.lshTopK(
      Tables(spark, dir).embeddings, "vec_id", "embedding",
      isQuery = $"vec_id" < 20, k = 5, nPlanes = 8, dims = Dims)
  }

  // ---------------------------------------------------------------- q29
  /** Per-label embedding statistics on exact quantized norms. */
  def q29EmbeddingStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.quantized(Tables(spark, dir).embeddings, "embedding")
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum($"qnorm2").as("sum_qnorm2"),
        min($"qnorm2").as("min_qnorm2"),
        max($"qnorm2").as("max_qnorm2")
      )
  }

  // ---------------------------------------------------------------- q33
  /** Embedding-cosine near-duplicate pairs: LSH-bucket candidates, kept at
    * quantized cosine >= 0.30 (this corpus has no planted near-dups, so the
    * threshold sits in the upper tail of the bucket-pair distribution —
    * ~14 pairs at sf0.01). */
  def q33EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupPairs(
      Tables(spark, dir).embeddings, "vec_id", "embedding",
      minCosPpm = 300000L, nPlanes = 8, dims = Dims)

  // ---------------------------------------------------------------- q34
  /** IVF-style ANN, nprobe=1: first 8 vectors act as the (stub-trained)
    * coarse centroids; every vector is assigned to its nearest centroid by
    * exact quantized cosine; queries scan only their own cell. */
  def q34IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.ivfTopK(
      Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isQuery = $"vec_id" < 20, k = 5)
  }

  // ---------------------------------------------------------------- q37
  /** Pure-SQL entry path: a SQL user's query over a temp view, using the
    * natively-injected `dot_q` expression (GraftExtensions) — exercises
    * the `spark.sql.extensions` registration plus SQL lambda transforms,
    * not just the DataFrame API. */
  def q37SqlApi(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).embeddings.createOrReplaceTempView("embeddings_v")
    spark.sql(
      """WITH q AS (SELECT vec_id,
        |  transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0D) AS BIGINT)) AS qvec
        |  FROM embeddings_v)
        |SELECT a.vec_id AS id1, b.vec_id AS id2, dot_q(a.qvec, b.qvec) AS dot
        |FROM q a JOIN q b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id < 50""".stripMargin)
  }

  // ---------------------------------------------------------------- q63
  /** IVF coarse-quantizer training: 2 Lloyd iterations of exact-integer
    * k-means (k = 8 seeds, truncating integer centroid means, quantized
    * cosine assignment) — the real training step behind q34's stub. */
  def q63KmeansTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.kmeansTrain(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isSeed = $"vec_id" < 8, iters = 2)
  }

  // ---------------------------------------------------------------- q64
  /** Int8 scalar quantization: per-dimension min/max code grid, exact
    * integer codes and reconstruction errors per vector. */
  def q64Int8Quant(spark: SparkSession, dir: String): DataFrame =
    Similarity.scalarQuantize(Tables(spark, dir).embeddings, "vec_id", "embedding")

  // ---------------------------------------------------------------- q81
  /** SemDeDup: 8-cell clustering (q34's stub centroids), within-cell
    * cosine >= 0.30 against lower-id members marks a vector dropped —
    * keep-the-first semantic dedup. */
  def q81SemDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.semDedup(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, minCosPpm = 300000L)
  }

  // ---------------------------------------------------------------- q94
  /** Product-quantization encode: 8 subspaces × 8 dims, codebooks from the
    * first 16 vectors (the q34 stub-centroid pattern; production trains
    * them per-subspace with q63's k-means). One row per (vector,
    * subspace): nearest code by exact int64 L2², ties to the lower code
    * id, plus the exact quantization error. */
  def q94PqEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.pqEncode(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCode = $"vec_id" < 16, m = PqM, dims = Dims)
  }

  // ---------------------------------------------------------------- q95
  /** PQ asymmetric-distance (ADC) top-5 for the first 20 vectors:
    * candidates carry only their 8 codes; distance is the sum of exact
    * per-subspace d² to the codebook entries. */
  def q95PqAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.pqTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = PqM, dims = Dims, k = 5)
  }

  // ---------------------------------------------------------------- q97
  /** IVF-PQ: the q34 coarse cells (first 8 vectors) combined with the
    * q94 codebooks (first 16) — each query scans only its own cell,
    * scored by asymmetric distance over the candidate's 8 codes. The
    * billion-scale ANN layout (cell equi-join × m-lookup scoring). */
  def q97IvfPqAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.ivfPqTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = PqM, dims = Dims, k = 5)
  }

  // ---------------------------------------------------------------- q98
  /** Residual IVF-PQ with 2-cell multiprobe — the FAISS layout: codes
    * quantize each vector's residual against its coarse cell; queries
    * probe their 2 nearest cells, rebuilding their ADC tables against
    * each probed centroid's residual. */
  def q98IvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.ivfPqResidualTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = PqM, dims = Dims, k = 5, nprobe = 2)
  }

  // --------------------------------------------------------------- q100
  /** PQ codebook TRAINING (Jégou §II-C): 2 Lloyd rounds of per-subspace
    * exact-integer k-means from the q94 init rows; output per surviving
    * (subspace, code): member count and total quantization error — the
    * inertia table that pins the trained books bit-for-bit. */
  def q100PqTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.pqTrain(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isInit = $"vec_id" < 16, m = PqM, dims = Dims, iters = 2)
  }

  // --------------------------------------------------------------- q101
  /** ADC top-5 over TRAINED codebooks — q95's machinery fed by q100's
    * 2-round k-means books instead of raw designated rows. */
  def q101PqAnnTrained(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.pqTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = PqM, dims = Dims, k = 5, trainIters = 2)
  }

  // --------------------------------------------------------------- q102
  /** Multiprobe on the NON-residual IVF-PQ layout: q97 with each query
    * scanning its 2 nearest cells — the recall/cost knob on both
    * layouts. Raw-vector ADC tables are probe-independent, so they are
    * built once per query (unlike q98's per-probe rebuild). */
  def q102IvfPqMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.ivfPqTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = PqM, dims = Dims, k = 5, nprobe = 2)
  }

  // --------------------------------------------------------------- q108
  /** ADC-then-exact refine (FAISS `IndexRefineFlat`): q102's multiprobe
    * chain widened to a top-25 candidate list, re-ranked by EXACT
    * quantized L2 over the candidates' full vectors, top-5 emitted —
    * the compressed-scan + flat-short-list production ANN shape. */
  def q108IvfPqRefine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.ivfPqRefineTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = PqM, dims = Dims, k = 5, refineR = 25, nprobe = 2)
  }

  // ------------------------------------------------------- stored index
  /** Per-JVM, per-dir materialized IVF-PQ index ([[graft.operators
    * .AnnIndex]]): the q25 signature-table pattern for ANN. Two
    * variants — `full` (one build over the whole table) and `incr`
    * (build on vec_id < 250, then [[AnnIndex.add]] the rest against the
    * stored model). Cache keys on the embeddings parquet fingerprint so
    * in-place regeneration invalidates; temp dirs are removed on JVM
    * exit (both per the round-7 ADVICE conventions). */
  private val idxLock = new Object
  private var idxCache: Map[String, String] = Map.empty

  private def embFingerprint(dir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    val h = java.security.MessageDigest.getInstance("MD5")
    walk(new java.io.File(dir, "embeddings.parquet")).foreach { f =>
      h.update(s"${f.getPath}:${f.length}:${f.lastModified}|".getBytes("UTF-8"))
    }
    h.digest().map("%02x".format(_)).mkString
  }

  private def materializedIndex(spark: SparkSession, dir: String,
                                variant: String): String = idxLock.synchronized {
    import spark.implicits._
    val key = s"$dir|$variant|${embFingerprint(dir)}"
    idxCache.getOrElse(key, {
      val out = TextQueries.newTempDir("graft-ann-index").resolve(variant).toString
      val emb = Tables(spark, dir).embeddings
      variant match {
        case "full" =>
          AnnIndex.build(emb, "vec_id", "embedding",
            isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16,
            m = PqM, dims = Dims, indexDir = out)
        case "incr" =>
          AnnIndex.build(emb.filter($"vec_id" < 250), "vec_id", "embedding",
            isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16,
            m = PqM, dims = Dims, indexDir = out)
          // threshold below the fresh-build file count so the ADD-CADENCE
          // auto-compaction genuinely runs inside the oracle-checked path
          // (results are compaction-invariant; the q104 oracle proves it)
          AnnIndex.add(emb.filter($"vec_id" >= 250), "vec_id", "embedding", out,
            compactAboveFiles = 8)
      }
      idxCache += key -> out
      out
    })
  }

  def buildAnnIndex(spark: SparkSession, dir: String): Unit = {
    materializedIndex(spark, dir, "full"); ()
  }
  def buildAnnIndexIncr(spark: SparkSession, dir: String): Unit = {
    materializedIndex(spark, dir, "incr"); ()
  }
  def invalidateAnnIndex(dir: String): Unit = idxLock.synchronized {
    idxCache = idxCache.filterNot(_._1.startsWith(s"$dir|"))
  }

  // --------------------------------------------------------------- q103
  /** Query the STORED full-corpus index: must equal q102's inline
    * multiprobe answer bit-for-bit (same oracle) — the stored-vs-inline
    * parity that makes the persisted lifecycle trustworthy. */
  def q103IvfPqStored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    AnnIndex.topK(Tables(spark, dir).embeddings.filter($"vec_id" < 20),
      "vec_id", "embedding", materializedIndex(spark, dir, "full"),
      k = 5, nprobe = 2)
  }

  // --------------------------------------------------------------- q104
  /** Query the INCREMENTALLY-built index (build on the first half, add
    * the rest against the frozen stored model): equals the full build —
    * encoding depends only on the model, never on other corpus rows —
    * so the same oracle pins the add path. */
  def q104IvfPqIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    AnnIndex.topK(Tables(spark, dir).embeddings.filter($"vec_id" < 20),
      "vec_id", "embedding", materializedIndex(spark, dir, "incr"),
      k = 5, nprobe = 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q100_pq_train"        -> q100PqTrain _,
    "q101_pq_ann_trained"  -> q101PqAnnTrained _,
    "q102_ivfpq_multiprobe" -> q102IvfPqMultiprobe _,
    "q108_ivfpq_refine"     -> q108IvfPqRefine _,
    "q103_ivfpq_stored"    -> q103IvfPqStored _,
    "q104_ivfpq_incremental" -> q104IvfPqIncremental _,
    "q81_semdedup"         -> q81SemDedup _,
    "q94_pq_encode"        -> q94PqEncode _,
    "q95_pq_ann"           -> q95PqAnn _,
    "q97_ivfpq_ann"        -> q97IvfPqAnn _,
    "q98_ivfpq_residual"   -> q98IvfPqResidual _,
    "q63_kmeans_train"     -> q63KmeansTrain _,
    "q64_int8_quant"       -> q64Int8Quant _,
    "q37_sql_api"          -> q37SqlApi _,
    "q27_cosine_topk"      -> q27CosineTopK _,
    "q28_lsh_ann"          -> q28LshAnn _,
    "q29_embedding_stats"  -> q29EmbeddingStats _,
    "q33_embedding_neardup" -> q33EmbeddingNearDup _,
    "q34_ivf_ann"          -> q34IvfAnn _
  )

  /** One k-means assignment round against centroid CTE `$c` (cell, cv, cn),
    * emitting (vec_id, qvec, qnorm2, cell[, cos]) of the best cell per
    * vector — cos DESC, cell ASC, matching the Spark struct-argmax. */
  private def asgSql(c: String, out: String, withCos: Boolean): String = {
    val cosExpr = "CAST(dot AS DOUBLE) / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE)))"
    s"""${out}_d AS (
       |  SELECT nv.vec_id, nv.qvec, nv.qnorm2, c.cell, c.cn,
       |    CAST(list_sum(list_transform(generate_series(1, $Dims), i -> nv.qvec[i] * c.cv[i])) AS BIGINT) AS dot
       |  FROM nv, $c c),
       |${out}_r AS (
       |  SELECT vec_id, qvec, qnorm2, cell${if (withCos) s", $cosExpr AS cos" else ""},
       |    row_number() OVER (PARTITION BY vec_id ORDER BY $cosExpr DESC, cell ASC) AS rk
       |  FROM ${out}_d),
       |$out AS (SELECT * FROM ${out}_r WHERE rk = 1)""".stripMargin
  }

  /** Truncating-integer-mean centroid update from assignment CTE `$g`. */
  private def updSql(g: String, out: String): String =
    s"""${out}_u AS (
       |  SELECT cell, d.i, CAST(SUM(qvec[d.i]) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS m
       |  FROM $g, (SELECT unnest(generate_series(1, $Dims)) AS i) d GROUP BY cell, d.i),
       |${out}_l AS (SELECT cell, list(m ORDER BY i) AS cv FROM ${out}_u GROUP BY cell),
       |$out AS (SELECT cell, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn
       |  FROM ${out}_l
       |  WHERE CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) > 0)""".stripMargin

  private lazy val q63Sql: String =
    s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
       |n AS (SELECT vec_id, qvec,
       |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM q),
       |nv AS (SELECT * FROM n WHERE qnorm2 > 0),
       |c0 AS (SELECT vec_id AS cell, qvec AS cv, qnorm2 AS cn FROM nv WHERE vec_id < 8),
       |${asgSql("c0", "g0", withCos = false)},
       |${updSql("g0", "c1")},
       |${asgSql("c1", "g1", withCos = false)},
       |${updSql("g1", "c2")},
       |${asgSql("c2", "g2", withCos = true)}
       |SELECT g2.cell, CAST(count(*) AS BIGINT) AS n_vectors,
       |  any_value(c2.cn) AS cent_norm2,
       |  CAST(SUM(CAST(floor(cos * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_cos_ppm
       |FROM g2 JOIN c2 ON g2.cell = c2.cell GROUP BY g2.cell""".stripMargin

  /** Shared PQ CTE prefix for the q94/q95 oracles: quantize, slice into
    * subspaces, codebooks from vec_id < 16, per-(vector, subspace)
    * nearest code by exact L2² (ties to the lower code id). */
  private lazy val pqCtes: String =
    s"""q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
       |ss AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS s),
       |cb AS (SELECT s, vec_id AS cid,
       |  list_slice(qvec, s*$PqSub+1, s*$PqSub+$PqSub) AS cv FROM q, ss WHERE vec_id < 16),
       |cbn AS (SELECT s, cid, cv,
       |  CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS cn FROM cb),
       |sub AS (SELECT vec_id, s, list_slice(qvec, s*$PqSub+1, s*$PqSub+$PqSub) AS qv FROM q, ss),
       |subn AS (SELECT vec_id, s, qv,
       |  CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn FROM sub),
       |d AS (SELECT sn.vec_id, sn.s, c.cid,
       |  sn.qn + c.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> sn.qv[i]*c.cv[i])) AS BIGINT) AS d2
       |  FROM subn sn JOIN cbn c ON sn.s = c.s),
       |r AS (SELECT vec_id, s, cid, d2,
       |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, cid ASC) AS rk FROM d)""".stripMargin

  /** One PQ-k-means assignment round against codebook CTE `$cb` (s, cid,
    * cv, cn): per (vector, subspace) the nearest entry by exact L2²
    * (d² = qn + cn − 2·dot), ties to the lower cid — matching the Spark
    * argmin's tie-to-lower-position over cid-sorted books. */
  private def pqTrainAsg(cb: String, out: String): String =
    s"""${out}_d AS (SELECT sn.vec_id, sn.s, c.cid,
       |  sn.qn + c.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> sn.qv[i]*c.cv[i])) AS BIGINT) AS d2
       |  FROM subn sn JOIN $cb c ON sn.s = c.s),
       |${out}_r AS (SELECT vec_id, s, cid, d2,
       |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, cid ASC) AS rk FROM ${out}_d),
       |$out AS (SELECT vec_id, s, cid, d2 FROM ${out}_r WHERE rk = 1)""".stripMargin

  /** Truncating-integer-mean codebook update from assignment CTE `$asg`:
    * per (subspace, code, dim) `sum // count` over the members' raw
    * sub-vectors — entries with no members drop out (no rows). */
  private def pqTrainUpd(asg: String, out: String): String =
    s"""${out}_u AS (SELECT a.s, a.cid, d.i,
       |  CAST(SUM(sb.qv[d.i]) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mn
       |  FROM $asg a JOIN sub sb ON sb.vec_id = a.vec_id AND sb.s = a.s,
       |    (SELECT unnest(generate_series(1, $PqSub)) AS i) d
       |  GROUP BY a.s, a.cid, d.i),
       |${out}_l AS (SELECT s, cid, list(mn ORDER BY i) AS cv FROM ${out}_u GROUP BY s, cid),
       |$out AS (SELECT s, cid, cv,
       |  CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS cn FROM ${out}_l)""".stripMargin

  /** Shared prefix for the trained-codebook oracles: quantize, slice,
    * init books from vec_id < 16, then 2 Lloyd rounds (assign → update)
    * and the final assignment `af` against the trained books `cb2`. */
  private lazy val pqTrainCtes: String =
    s"""q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
       |ss AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS s),
       |sub AS (SELECT vec_id, s, list_slice(qvec, s*$PqSub+1, s*$PqSub+$PqSub) AS qv FROM q, ss),
       |subn AS (SELECT vec_id, s, qv,
       |  CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn FROM sub),
       |cb0l AS (SELECT s, vec_id AS cid, qv AS cv FROM sub WHERE vec_id < 16),
       |cb0 AS (SELECT s, cid, cv,
       |  CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS cn FROM cb0l),
       |${pqTrainAsg("cb0", "a0")},
       |${pqTrainUpd("a0", "cb1")},
       |${pqTrainAsg("cb1", "a1")},
       |${pqTrainUpd("a1", "cb2")},
       |${pqTrainAsg("cb2", "af")}""".stripMargin

  /** Non-residual IVF-PQ oracle, parameterized on the probe count: cells
    * by exact quantized cosine (ties to lower centroid id), raw-vector
    * PQ codes, each query scoring the candidates of its `nprobe`
    * nearest cells by summed per-subspace ADC distance. nprobe=1 is the
    * q97 shape; nprobe=2 the q102 multiprobe variant; [[ivfPqRefineSql]]
    * re-ranks this chain's `pair` CTE by exact L2. */
  private def ivfPqAnnSql(nprobe: Int): String =
    s"""WITH ${ivfPqPairCtes(nprobe)},
       |rr AS (SELECT query_id, cell, cand_id, adist2,
       |  row_number() OVER (PARTITION BY query_id ORDER BY adist2 ASC, cand_id ASC) AS rank
       |  FROM pair)
       |SELECT query_id, cell, cand_id, rank, adist2 FROM rr WHERE rank <= 5""".stripMargin

  /** q108: the ADC candidate chain cut at `refineR` per query, re-ranked
    * by exact quantized L2 between the query's and candidate's FULL
    * vectors (the `n` CTE), top-`k` emitted. */
  private def ivfPqRefineSql(nprobe: Int, refineR: Int, k: Int): String =
    s"""WITH ${ivfPqPairCtes(nprobe)},
       |cand0 AS (SELECT query_id, cand_id, adist2,
       |  row_number() OVER (PARTITION BY query_id ORDER BY adist2 ASC, cand_id ASC) AS arank
       |  FROM pair),
       |ex AS (SELECT c0.query_id, c0.cand_id,
       |  nq.qnorm2 + nc.qnorm2 - 2 * CAST(list_sum(list_transform(generate_series(1, $Dims), i -> nq.qvec[i] * nc.qvec[i])) AS BIGINT) AS dist2
       |  FROM cand0 c0
       |  JOIN n nq ON nq.vec_id = c0.query_id
       |  JOIN n nc ON nc.vec_id = c0.cand_id
       |  WHERE c0.arank <= $refineR),
       |rr AS (SELECT query_id, cand_id, dist2,
       |  row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, cand_id ASC) AS rank
       |  FROM ex)
       |SELECT query_id, cand_id, rank, dist2 FROM rr WHERE rank <= $k""".stripMargin

  /** The shared IVF-PQ candidate chain ending at the `pair` CTE:
    * per-(query, probed cell, candidate) summed ADC distance. */
  private def ivfPqPairCtes(nprobe: Int): String =
    s"""qq AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
       |n0 AS (SELECT vec_id, qvec,
       |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM qq),
       |n AS (SELECT * FROM n0 WHERE qnorm2 > 0),
       |c AS (SELECT vec_id AS c_id, qvec AS centv, qnorm2 AS centn FROM n WHERE vec_id < 8),
       |a0 AS (SELECT n.vec_id, n.qvec, n.qnorm2, c.c_id, c.centn,
       |  CAST(list_sum(list_transform(generate_series(1, $Dims), i -> n.qvec[i] * c.centv[i])) AS BIGINT) AS cdot
       |  FROM n, c),
       |a1 AS (SELECT vec_id, c_id,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY
       |    CAST(cdot AS DOUBLE) / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(centn AS DOUBLE))) DESC,
       |    c_id ASC) AS arank
       |  FROM a0),
       |asg AS (SELECT vec_id, c_id AS cell FROM a1 WHERE arank = 1),
       |ss AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS s),
       |cb AS (SELECT s, vec_id AS cid,
       |  list_slice(qvec, s*$PqSub+1, s*$PqSub+$PqSub) AS cv FROM n, ss WHERE vec_id < 16),
       |cbn AS (SELECT s, cid, cv,
       |  CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS cn FROM cb),
       |sub AS (SELECT vec_id, s, list_slice(qvec, s*$PqSub+1, s*$PqSub+$PqSub) AS qv FROM n, ss),
       |subn AS (SELECT vec_id, s, qv,
       |  CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn FROM sub),
       |d AS (SELECT sn.vec_id, sn.s, c2.cid,
       |  sn.qn + c2.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> sn.qv[i]*c2.cv[i])) AS BIGINT) AS d2
       |  FROM subn sn JOIN cbn c2 ON sn.s = c2.s),
       |r AS (SELECT vec_id, s, cid, d2,
       |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, cid ASC) AS rk FROM d),
       |enc AS (SELECT vec_id AS cand_id, s, cid AS code FROM r WHERE rk = 1),
       |probe AS (SELECT vec_id AS query_id, c_id AS pcell FROM a1
       |  WHERE arank <= $nprobe AND vec_id < 20),
       |qs AS (SELECT p.query_id, p.pcell AS cell, sn.s, sn.qv, sn.qn
       |  FROM subn sn JOIN probe p ON p.query_id = sn.vec_id),
       |pair AS (SELECT qs.query_id, qs.cell, e.cand_id,
       |  CAST(SUM(qs.qn + c2.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> qs.qv[i]*c2.cv[i])) AS BIGINT)) AS BIGINT) AS adist2
       |  FROM qs JOIN enc e ON e.s = qs.s
       |  JOIN asg ca ON ca.vec_id = e.cand_id AND ca.cell = qs.cell
       |  JOIN cbn c2 ON c2.s = e.s AND c2.cid = e.code
       |  WHERE e.cand_id <> qs.query_id
       |  GROUP BY qs.query_id, qs.cell, e.cand_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q100_pq_train" ->
      s"""WITH $pqTrainCtes
         |SELECT s, cid AS code, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(SUM(d2) AS BIGINT) AS sum_err2
         |FROM af GROUP BY s, cid""".stripMargin,
    "q101_pq_ann_trained" ->
      s"""WITH $pqTrainCtes,
         |enc AS (SELECT vec_id AS cand_id, s, cid AS code FROM af),
         |qs AS (SELECT vec_id AS query_id, s, qv, qn FROM subn WHERE vec_id < 20),
         |pair AS (SELECT qs.query_id, e.cand_id,
         |  CAST(SUM(qs.qn + c.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> qs.qv[i]*c.cv[i])) AS BIGINT)) AS BIGINT) AS adist2
         |  FROM qs JOIN enc e ON qs.s = e.s JOIN cb2 c ON c.s = e.s AND c.cid = e.code
         |  WHERE qs.query_id <> e.cand_id
         |  GROUP BY qs.query_id, e.cand_id),
         |rr AS (SELECT query_id, cand_id, adist2,
         |  row_number() OVER (PARTITION BY query_id ORDER BY adist2 ASC, cand_id ASC) AS rank
         |  FROM pair)
         |SELECT query_id, cand_id, rank, adist2 FROM rr WHERE rank <= 5""".stripMargin,
    "q63_kmeans_train" -> q63Sql,
    "q94_pq_encode" ->
      s"""WITH $pqCtes
         |SELECT vec_id, CAST(s AS BIGINT) AS s, cid AS code, d2 AS err2
         |FROM r WHERE rk = 1""".stripMargin,
    "q95_pq_ann" ->
      s"""WITH $pqCtes,
         |enc AS (SELECT vec_id AS cand_id, s, cid AS code FROM r WHERE rk = 1),
         |qs AS (SELECT vec_id AS query_id, s, qv, qn FROM subn WHERE vec_id < 20),
         |pair AS (SELECT qs.query_id, e.cand_id,
         |  CAST(SUM(qs.qn + c.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> qs.qv[i]*c.cv[i])) AS BIGINT)) AS BIGINT) AS adist2
         |  FROM qs JOIN enc e ON qs.s = e.s JOIN cbn c ON c.s = e.s AND c.cid = e.code
         |  WHERE qs.query_id <> e.cand_id
         |  GROUP BY qs.query_id, e.cand_id),
         |rr AS (SELECT query_id, cand_id, adist2,
         |  row_number() OVER (PARTITION BY query_id ORDER BY adist2 ASC, cand_id ASC) AS rank
         |  FROM pair)
         |SELECT query_id, cand_id, rank, adist2 FROM rr WHERE rank <= 5""".stripMargin,
    "q97_ivfpq_ann" -> ivfPqAnnSql(nprobe = 1),
    "q102_ivfpq_multiprobe" -> ivfPqAnnSql(nprobe = 2),
    "q108_ivfpq_refine"     -> ivfPqRefineSql(nprobe = 2, refineR = 25, k = 5),
    // stored-index (q103) and incremental-add (q104) paths must equal the
    // inline multiprobe computation — same oracle, different machinery
    "q103_ivfpq_stored" -> ivfPqAnnSql(nprobe = 2),
    "q104_ivfpq_incremental" -> ivfPqAnnSql(nprobe = 2),
    "q98_ivfpq_residual" ->
      s"""WITH qq AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
         |n0 AS (SELECT vec_id, qvec,
         |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM qq),
         |n AS (SELECT * FROM n0 WHERE qnorm2 > 0),
         |c AS (SELECT vec_id AS c_id, qvec AS centv, qnorm2 AS centn FROM n WHERE vec_id < 8),
         |a0 AS (SELECT n.vec_id, n.qnorm2, c.c_id, c.centn,
         |  CAST(list_sum(list_transform(generate_series(1, $Dims), i -> n.qvec[i] * c.centv[i])) AS BIGINT) AS cdot
         |  FROM n, c),
         |a1 AS (SELECT vec_id, c_id,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY
         |    CAST(cdot AS DOUBLE) / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(centn AS DOUBLE))) DESC,
         |    c_id ASC) AS arank
         |  FROM a0),
         |asg AS (SELECT vec_id, c_id AS cell FROM a1 WHERE arank = 1),
         |cent AS (SELECT vec_id AS cell, qvec AS centv FROM n WHERE vec_id < 8),
         |res AS (SELECT n.vec_id,
         |  list_transform(generate_series(1, $Dims), i -> n.qvec[i] - ct.centv[i]) AS rv
         |  FROM n JOIN asg a ON a.vec_id = n.vec_id JOIN cent ct ON ct.cell = a.cell),
         |ss AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS s),
         |cb AS (SELECT s, vec_id AS cid,
         |  list_slice(rv, s*$PqSub+1, s*$PqSub+$PqSub) AS cv FROM res, ss WHERE vec_id < 16),
         |cbn AS (SELECT s, cid, cv,
         |  CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS cn FROM cb),
         |sub AS (SELECT vec_id, s, list_slice(rv, s*$PqSub+1, s*$PqSub+$PqSub) AS qv FROM res, ss),
         |subn AS (SELECT vec_id, s, qv,
         |  CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn FROM sub),
         |d AS (SELECT sn.vec_id, sn.s, c2.cid,
         |  sn.qn + c2.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> sn.qv[i]*c2.cv[i])) AS BIGINT) AS d2
         |  FROM subn sn JOIN cbn c2 ON sn.s = c2.s),
         |r AS (SELECT vec_id, s, cid, d2,
         |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, cid ASC) AS rk FROM d),
         |enc AS (SELECT vec_id AS cand_id, s, cid AS code FROM r WHERE rk = 1),
         |probe AS (SELECT vec_id AS query_id, c_id AS pcell FROM a1
         |  WHERE arank <= 2 AND vec_id < 20),
         |qres AS (SELECT p.query_id, p.pcell,
         |  list_transform(generate_series(1, $Dims), i -> n.qvec[i] - ct.centv[i]) AS rv
         |  FROM probe p JOIN n ON n.vec_id = p.query_id JOIN cent ct ON ct.cell = p.pcell),
         |qsub AS (SELECT query_id, pcell, s, list_slice(rv, s*$PqSub+1, s*$PqSub+$PqSub) AS qv
         |  FROM qres, ss),
         |qsubn AS (SELECT query_id, pcell, s, qv,
         |  CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn FROM qsub),
         |pair AS (SELECT qs.query_id, qs.pcell AS cell, e.cand_id,
         |  CAST(SUM(qs.qn + c2.cn - 2 * CAST(list_sum(list_transform(generate_series(1, $PqSub), i -> qs.qv[i]*c2.cv[i])) AS BIGINT)) AS BIGINT) AS adist2
         |  FROM qsubn qs JOIN enc e ON e.s = qs.s
         |  JOIN asg ca ON ca.vec_id = e.cand_id AND ca.cell = qs.pcell
         |  JOIN cbn c2 ON c2.s = e.s AND c2.cid = e.code
         |  WHERE e.cand_id <> qs.query_id
         |  GROUP BY qs.query_id, qs.pcell, e.cand_id),
         |rr AS (SELECT query_id, cell, cand_id, adist2,
         |  row_number() OVER (PARTITION BY query_id ORDER BY adist2 ASC, cand_id ASC) AS rank
         |  FROM pair)
         |SELECT query_id, cell, cand_id, rank, adist2 FROM rr WHERE rank <= 5""".stripMargin,
    "q64_int8_quant" ->
      s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
         |ex AS (SELECT vec_id, d.i, qvec[d.i] AS x
         |  FROM q, (SELECT unnest(generate_series(1, $Dims)) AS i) d),
         |st AS (SELECT i, min(x) AS qmin, max(x) AS qmax FROM ex GROUP BY i),
         |c AS (SELECT vec_id, x, qmin, qmax, qmax - qmin AS rng,
         |  CASE WHEN qmax = qmin THEN 0 ELSE ((x - qmin) * 255) // (qmax - qmin) END AS code
         |  FROM ex JOIN st USING (i)),
         |r AS (SELECT vec_id, code,
         |  abs(x - (qmin + CASE WHEN rng = 0 THEN 0 ELSE (code * rng) // 255 END)) AS err
         |  FROM c)
         |SELECT vec_id, CAST(SUM(code) AS BIGINT) AS sum_codes,
         |  CAST(SUM(err) AS BIGINT) AS sum_abs_err, CAST(MAX(err) AS BIGINT) AS max_abs_err
         |FROM r GROUP BY vec_id""".stripMargin,
    "q27_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
         |n AS (SELECT vec_id, qvec,
         |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM q),
         |pairs AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         |    CAST(list_sum(list_transform(generate_series(1, $Dims), i -> a.qvec[i] * b.qvec[i])) AS BIGINT) AS dot,
         |    a.qnorm2 AS qn, b.qnorm2 AS cn
         |  FROM n a, n b WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id),
         |scored AS (SELECT query_id, cand_id, dot,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
         |  FROM pairs),
         |r AS (SELECT query_id, cand_id, dot, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, cand_id, rank, dot, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
         |FROM r WHERE rank <= 5""".stripMargin,
    "q28_lsh_ann" ->
      s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
         |n AS (SELECT vec_id, qvec,
         |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM q),
         |sg AS (SELECT vec_id, qvec, qnorm2,
         |  CAST(list_sum(list_transform(generate_series(0, 7), p ->
         |    CASE WHEN CAST(list_sum(list_transform(generate_series(1, $Dims), i ->
         |           qvec[i] * (CAST(CAST(concat('0x', substr(md5(concat('plane', CAST(p AS VARCHAR), '_', CAST(i-1 AS VARCHAR))), 1, 15)) AS UBIGINT) % 2001 AS BIGINT) - 1000))) AS BIGINT) >= 0
         |         THEN CAST(1 AS BIGINT) << p ELSE 0 END)) AS BIGINT) AS sig
         |  FROM n),
         |pairs AS (
         |  SELECT a.vec_id AS query_id, a.sig AS sig, b.vec_id AS cand_id,
         |    CAST(list_sum(list_transform(generate_series(1, $Dims), i -> a.qvec[i] * b.qvec[i])) AS BIGINT) AS dot,
         |    a.qnorm2 AS qn, b.qnorm2 AS cn
         |  FROM sg a JOIN sg b ON a.sig = b.sig AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id < 20),
         |scored AS (SELECT query_id, sig, cand_id, dot,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
         |  FROM pairs),
         |r AS (SELECT query_id, sig, cand_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, sig, cand_id, rank, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
         |FROM r WHERE rank <= 5""".stripMargin,
    "q29_embedding_stats" ->
      s"""WITH q AS (SELECT label, $qvecSql AS qvec FROM embeddings),
         |n AS (SELECT label, CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM q)
         |SELECT label, count(*) AS n_vectors,
         |  CAST(sum(qnorm2) AS BIGINT) AS sum_qnorm2,
         |  min(qnorm2) AS min_qnorm2, max(qnorm2) AS max_qnorm2
         |FROM n GROUP BY label""".stripMargin,
    "q37_sql_api" ->
      s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings)
         |SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  CAST(list_sum(list_transform(generate_series(1, $Dims), i -> a.qvec[i] * b.qvec[i])) AS BIGINT) AS dot
         |FROM q a JOIN q b ON a.vec_id + 1 = b.vec_id
         |WHERE a.vec_id < 50""".stripMargin,
    "q33_embedding_neardup" ->
      s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
         |n AS (SELECT vec_id, qvec,
         |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM q),
         |sg AS (SELECT vec_id, qvec, qnorm2,
         |  CAST(list_sum(list_transform(generate_series(0, 7), p ->
         |    CASE WHEN CAST(list_sum(list_transform(generate_series(1, $Dims), i ->
         |           qvec[i] * (CAST(CAST(concat('0x', substr(md5(concat('plane', CAST(p AS VARCHAR), '_', CAST(i-1 AS VARCHAR))), 1, 15)) AS UBIGINT) % 2001 AS BIGINT) - 1000))) AS BIGINT) >= 0
         |         THEN CAST(1 AS BIGINT) << p ELSE 0 END)) AS BIGINT) AS sig
         |  FROM n),
         |pairs AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |    CAST(list_sum(list_transform(generate_series(1, $Dims), i -> a.qvec[i] * b.qvec[i])) AS BIGINT) AS dot,
         |    a.qnorm2 AS qn, b.qnorm2 AS cn
         |  FROM sg a JOIN sg b ON a.sig = b.sig AND a.vec_id < b.vec_id),
         |scored AS (SELECT id1, id2,
         |    CAST(floor(CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) * 1000000.0) AS BIGINT) AS cos_ppm
         |  FROM pairs)
         |SELECT id1, id2, cos_ppm FROM scored WHERE cos_ppm >= 300000""".stripMargin,
    "q81_semdedup" ->
      s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
         |n0 AS (SELECT vec_id, qvec,
         |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM q),
         |n AS (SELECT * FROM n0 WHERE qnorm2 > 0),
         |c AS (SELECT vec_id AS c_id, qvec AS centv, qnorm2 AS centn FROM n WHERE vec_id < 8),
         |asg0 AS (
         |  SELECT n.vec_id, n.qvec, n.qnorm2, c.c_id, c.centn,
         |    CAST(list_sum(list_transform(generate_series(1, $Dims), i -> n.qvec[i] * c.centv[i])) AS BIGINT) AS cdot
         |  FROM n, c),
         |asg1 AS (
         |  SELECT vec_id, qvec, qnorm2, c_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY
         |      CAST(cdot AS DOUBLE) / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(centn AS DOUBLE))) DESC,
         |      c_id ASC) AS arank
         |  FROM asg0),
         |asg AS (SELECT vec_id, qvec, qnorm2, c_id AS cell FROM asg1 WHERE arank = 1),
         |dups AS (
         |  SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_near
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND b.vec_id < a.vec_id
         |  WHERE CAST(floor(
         |      CAST(CAST(list_sum(list_transform(generate_series(1, $Dims), i -> a.qvec[i] * b.qvec[i])) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(a.qnorm2 AS DOUBLE)) * sqrt(CAST(b.qnorm2 AS DOUBLE)))
         |      * 1000000.0) AS BIGINT) >= 300000
         |  GROUP BY a.vec_id)
         |SELECT asg.vec_id, asg.cell,
         |  CAST(COALESCE(d.n_near, 0) AS BIGINT) AS n_near,
         |  (COALESCE(d.n_near, 0) = 0) AS kept
         |FROM asg LEFT JOIN dups d USING (vec_id)""".stripMargin,
    "q34_ivf_ann" ->
      s"""WITH q AS (SELECT vec_id, $qvecSql AS qvec FROM embeddings),
         |n AS (SELECT vec_id, qvec,
         |  CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm2 FROM q),
         |c AS (SELECT vec_id AS c_id, qvec AS centv, qnorm2 AS centn FROM n WHERE vec_id < 8),
         |asg0 AS (
         |  SELECT n.vec_id, n.qvec, n.qnorm2, c.c_id, c.centn,
         |    CAST(list_sum(list_transform(generate_series(1, $Dims), i -> n.qvec[i] * c.centv[i])) AS BIGINT) AS cdot
         |  FROM n, c),
         |asg1 AS (
         |  SELECT vec_id, qvec, qnorm2, c_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY
         |      CAST(cdot AS DOUBLE) / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(centn AS DOUBLE))) DESC,
         |      c_id ASC) AS arank
         |  FROM asg0),
         |asg AS (SELECT vec_id, qvec, qnorm2, c_id AS cell FROM asg1 WHERE arank = 1),
         |pairs AS (
         |  SELECT a.vec_id AS query_id, a.cell, b.vec_id AS cand_id,
         |    CAST(list_sum(list_transform(generate_series(1, $Dims), i -> a.qvec[i] * b.qvec[i])) AS BIGINT) AS dot,
         |    a.qnorm2 AS qn, b.qnorm2 AS cn
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id < 20),
         |scored AS (SELECT query_id, cell, cand_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
         |  FROM pairs),
         |r AS (SELECT query_id, cell, cand_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, cell, cand_id, rank, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_ppm
         |FROM r WHERE rank <= 5""".stripMargin
  )
}
