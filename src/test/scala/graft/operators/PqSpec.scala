package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization operator: hand-derived codes/errors on a tiny
  * 2-subspace corpus (including the tie-to-lower-code case), hand-derived
  * ADC rankings, the model-state gates, the narrow-encode plan shape, and
  * a full driver-side parity recompute on the real embeddings table.
  */
class PqSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  // 4 dims, 2 subspaces; ids 0 and 1 are the codebook.
  //   code 0: [1, 0 | 0, 1]   code 1: [0, 1 | 1, 0]
  private def tiny = {
    import spark.implicits._
    Seq(
      (0L, Seq(1f, 0f, 0f, 1f)),
      (1L, Seq(0f, 1f, 1f, 0f)),
      (2L, Seq(1f, 0f, 1f, 0f)),
      (3L, Seq(0.5f, 0.5f, 0.25f, 0f))
    ).toDF("vec_id", "embedding")
  }

  test("pqEncode: hand-derived codes and exact errors, ties to the lower code id") {
    import spark.implicits._
    val got = Similarity.pqEncode(tiny, "vec_id", "embedding",
        isCode = $"vec_id" < 2, m = 2, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // id 3 subspace 0 = [5e5, 5e5]: equidistant (d² = 5e11) from both codes
    // -> the tie goes to code 0; subspace 1 = [2.5e5, 0]: code 1 at
    // (2.5e5 - 1e6)² = 5.625e11
    val expected = Set(
      (0L, 0L, 0L, 0L), (0L, 1L, 0L, 0L),
      (1L, 0L, 1L, 0L), (1L, 1L, 1L, 0L),
      (2L, 0L, 0L, 0L), (2L, 1L, 1L, 0L),
      (3L, 0L, 0L, 500000000000L), (3L, 1L, 1L, 562500000000L))
    assert(got == expected)
  }

  test("pqTopK: hand-derived ADC distances and tie-broken ranking") {
    import spark.implicits._
    val got = Similarity.pqTopK(tiny, "vec_id", "embedding",
        isCode = $"vec_id" < 2, isQuery = $"vec_id" >= 2, m = 2, dims = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    // query 2 reconstructs exactly as candidate 3's codes (adist² = 0);
    // candidates 0 and 1 tie at 2e12 -> rank by cand_id. Query 3: cands 1
    // and 2 tie at 1.0625e12 -> cand 1 first.
    val expected = Set(
      (2L, 3L, 1, 0L), (2L, 0L, 2, 2000000000000L), (2L, 1L, 3, 2000000000000L),
      (3L, 1L, 1, 1062500000000L), (3L, 2L, 2, 1062500000000L),
      (3L, 0L, 3, 1562500000000L))
    assert(got == expected)
  }

  test("pq gates: oversized codebook, oversized query set, and bad split fail loudly") {
    import spark.implicits._
    val exCodes = intercept[IllegalArgumentException] {
      Similarity.pqEncode(embeddings, "vec_id", "embedding",
        isCode = lit(true), m = 8, dims = 64, maxCodes = 10)
    }
    assert(exCodes.getMessage.contains("maxCodes"))
    val exQueries = intercept[IllegalArgumentException] {
      Similarity.pqTopK(embeddings, "vec_id", "embedding",
        isCode = $"vec_id" < 16, isQuery = lit(true), m = 8, dims = 64, k = 5,
        maxQueries = 10)
    }
    assert(exQueries.getMessage.contains("maxQueries"))
    val exSplit = intercept[IllegalArgumentException] {
      Similarity.pqEncode(embeddings, "vec_id", "embedding",
        isCode = $"vec_id" < 16, m = 7, dims = 64)
    }
    assert(exSplit.getMessage.contains("not divisible"))
    val exEmpty = intercept[IllegalArgumentException] {
      Similarity.pqEncode(embeddings, "vec_id", "embedding",
        isCode = lit(false), m = 8, dims = 64)
    }
    assert(exEmpty.getMessage.contains("no codebook"))
  }

  test("pqEncode plan: narrow and shuffle-free - zero exchanges, no join") {
    import org.apache.spark.sql.execution.FormattedMode
    import spark.implicits._
    val p = Similarity.pqEncode(embeddings, "vec_id", "embedding",
        isCode = $"vec_id" < 16, m = 8, dims = 64)
      .queryExecution.explainString(FormattedMode)
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
    assert(exchanges == 0, s"expected a narrow encode, saw $exchanges exchanges:\n$p")
    assert(!p.contains("Join"), "encode must not join - codebooks are literal model state")
  }

  test("pqTopK plan: queries broadcast against the code table, corpus never shuffled pre-join") {
    import org.apache.spark.sql.execution.FormattedMode
    import spark.implicits._
    val p = Similarity.pqTopK(embeddings, "vec_id", "embedding",
        isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20, m = 8, dims = 64, k = 5)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the gated broadcast scan shape:\n$p")
    assert(!p.contains("SortMergeJoin"), "the code scan must not shuffle-join")
  }

  test("ivfPqTopK: hand-derived cells restrict candidates, ADC scores them") {
    import spark.implicits._
    // cells by quantized cosine against centroids 0/1: v2 ties (0.5 both
    // ways) -> lower centroid id -> cell 0 with v0; v3 is closer to c1 ->
    // cell 1 with v1. Each query sees ONLY its cell-mate.
    val got = Similarity.ivfPqTopK(tiny, "vec_id", "embedding",
        isCentroid = $"vec_id" < 2, isCode = $"vec_id" < 2, isQuery = $"vec_id" >= 2,
        m = 2, dims = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSet
    val expected = Set(
      (2L, 0L, 0L, 1, 2000000000000L),
      (3L, 1L, 1L, 1, 1062500000000L))
    assert(got == expected)
  }

  test("ivfPqTopK multiprobe: nprobe=2 reaches both cells, hand-derived ranking") {
    import spark.implicits._
    // cells: v0,v2 -> 0; v1,v3 -> 1. With nprobe=2 every query scans BOTH
    // cells, so the candidate set equals plain PQ's and the ADC distances
    // match the pqTopK tiny expectations; `cell` reports the probed cell
    // the candidate was found in. q2: v3 at 0, then v0/v1 tie at 2e12 ->
    // cand_id order. q3: v1/v2 tie at 1.0625e12 -> v1 first.
    val got = Similarity.ivfPqTopK(tiny, "vec_id", "embedding",
        isCentroid = $"vec_id" < 2, isCode = $"vec_id" < 2, isQuery = $"vec_id" >= 2,
        m = 2, dims = 4, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSet
    val expected = Set(
      (2L, 1L, 3L, 1, 0L),
      (2L, 0L, 0L, 2, 2000000000000L),
      (2L, 1L, 1L, 3, 2000000000000L),
      (3L, 1L, 1L, 1, 1062500000000L),
      (3L, 0L, 2L, 2, 1062500000000L),
      (3L, 0L, 0L, 3, 1562500000000L))
    assert(got == expected)
  }

  test("ivfPqTopK: cell join is an equi-join, never a cross product; centroid gate fires") {
    import org.apache.spark.sql.execution.FormattedMode
    import spark.implicits._
    val p = Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = 8, dims = 64, k = 5)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast EQUI-join on cell:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the IVF cell must bound candidates - no cross product")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
        isCentroid = lit(true), isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = 8, dims = 64, k = 5, maxCentroids = 10)
    }
    assert(ex.getMessage.contains("maxCentroids"))
  }

  test("ivfPq parity on sf0.01 embeddings: distributed == sequential recompute") {
    val m = 8; val dims = 64; val sub = dims / m
    val rows = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1000000.0d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .sortBy(_._1)
      .filter { case (_, v) => v.map(x => x * x).sum > 0L }
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cents = rows.filter(_._1 < 8)
    def cellOf(v: Seq[Long]): Long = {
      val n = v.map(x => x * x).sum
      cents.map { case (cid, cv) =>
        val cos = dot(v, cv).toDouble / (math.sqrt(n.toDouble) * math.sqrt(dot(cv, cv).toDouble))
        (cos, -cid)
      }.zip(cents.map(_._1)).maxBy(_._1)._2
    }
    val books = (0 until m).map { s =>
      rows.filter(_._1 < 16).map { case (cid, v) => cid -> v.slice(s * sub, (s + 1) * sub) }
    }
    def codesOf(v: Seq[Long]): Seq[Long] = (0 until m).map { s =>
      books(s).map { case (cid, cv) => (l2(v.slice(s * sub, (s + 1) * sub), cv), cid) }.min._2
    }
    val assigned = rows.map { case (id, v) => (id, v, cellOf(v), codesOf(v)) }
    val expected = assigned.filter(_._1 < 20).flatMap { case (qid, qv, qcell, _) =>
      assigned.filter(c => c._1 != qid && c._3 == qcell).map { case (cid, _, _, cs) =>
        val d = (0 until m).map { s =>
          l2(qv.slice(s * sub, (s + 1) * sub), books(s).find(_._1 == cs(s)).get._2)
        }.sum
        (cid, d)
      }.sortBy { case (cid, d) => (d, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, d), i) => (qid, qcell, cid, i + 1, d) }
    }.toSet
    import spark.implicits._
    val got = Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = m, dims = dims, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("pq native expressions actually compile - no silent interpreted fallback") {
    import spark.implicits._
    // the first PqCodesLongArray codegen referenced UnsafeArrayData under
    // catalyst.util (it lives in catalyst.expressions): Janino failed and
    // Spark silently fell back to interpreted eval — every value test
    // stayed green while the hot path ran uncompiled. fallback=false
    // turns a codegen compile error into a query failure.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(Similarity.pqEncode(embeddings, "vec_id", "embedding",
        isCode = $"vec_id" < 16, m = 8, dims = 64).count() > 0)
      assert(Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = 8, dims = 64, k = 5).count() > 0)
      assert(Similarity.ivfPqResidualTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = 8, dims = 64, k = 5, nprobe = 2).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("ivfPqResidualTopK: hand-derived residual codes, multiprobe reaches both cells") {
    import spark.implicits._
    // cells: v0,v2 -> 0; v1,v3 -> 1. Codebooks are the CODE rows'
    // residuals vs their own cells — v0 and v1 sit ON their centroids, so
    // both entries are zero vectors and every distance reduces to the
    // candidate-independent |query residual|² per probed cell (ties
    // everywhere -> cand_id order). v2 probes (0,1): all three candidates
    // land at 2e12. v3 probes (1,0): cell-1's v1 at 1.0625e12, then
    // cell-0's v0/v2 at 1.5625e12.
    val got = Similarity.ivfPqResidualTopK(tiny, "vec_id", "embedding",
        isCentroid = $"vec_id" < 2, isCode = $"vec_id" < 2, isQuery = $"vec_id" >= 2,
        m = 2, dims = 4, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSet
    val expected = Set(
      (2L, 0L, 0L, 1, 2000000000000L),
      (2L, 1L, 1L, 2, 2000000000000L),
      (2L, 1L, 3L, 3, 2000000000000L),
      (3L, 1L, 1L, 1, 1062500000000L),
      (3L, 0L, 0L, 2, 1562500000000L),
      (3L, 0L, 2L, 3, 1562500000000L))
    assert(got == expected)
  }

  test("ivfPqResidual parity on sf0.01 embeddings: distributed == sequential recompute") {
    val m = 8; val dims = 64; val sub = dims / m; val nprobe = 2
    val rows = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1000000.0d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .sortBy(_._1)
      .filter { case (_, v) => v.map(x => x * x).sum > 0L }
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cents = rows.filter(_._1 < 8)
    def probesOf(v: Seq[Long], p: Int): Seq[Long] = {
      val qs = math.sqrt(v.map(x => x * x).sum.toDouble)
      cents.map { case (cid, cv) =>
        (dot(v, cv).toDouble / (qs * math.sqrt(dot(cv, cv).toDouble)), cid)
      }.sortBy { case (cos, cid) => (-cos, cid) }.take(p).map(_._2).toSeq
    }
    def residual(v: Seq[Long], cell: Long): Seq[Long] = {
      val cv = cents.find(_._1 == cell).get._2
      v.zip(cv).map { case (x, c) => x - c }
    }
    val books = (0 until m).map { s =>
      rows.filter(_._1 < 16).map { case (cid, v) =>
        cid -> residual(v, probesOf(v, 1).head).slice(s * sub, (s + 1) * sub)
      }
    }
    def codesOf(rv: Seq[Long]): Seq[Long] = (0 until m).map { s =>
      books(s).zipWithIndex
        .map { case ((_, cv), p) => (l2(rv.slice(s * sub, (s + 1) * sub), cv), p.toLong) }
        .min._2
    }
    val assigned = rows.map { case (id, v) =>
      val cell = probesOf(v, 1).head
      (id, v, cell, codesOf(residual(v, cell)))
    }
    val expected = assigned.filter(_._1 < 20).flatMap { case (qid, qv, _, _) =>
      probesOf(qv, nprobe).flatMap { pcell =>
        val rq = residual(qv, pcell)
        assigned.filter(c => c._1 != qid && c._3 == pcell).map { case (cid, _, _, cs) =>
          val d = (0 until m).map { s =>
            l2(rq.slice(s * sub, (s + 1) * sub), books(s)(cs(s).toInt)._2)
          }.sum
          (pcell, cid, d)
        }
      }.sortBy { case (_, cid, d) => (d, cid) }
        .take(5).zipWithIndex
        .map { case ((pcell, cid, d), i) => (qid, pcell, cid, i + 1, d) }
    }.toSet
    import spark.implicits._
    val got = Similarity.ivfPqResidualTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = m, dims = dims, k = 5, nprobe = nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("ANN approximation quality: recall@5 vs exact L2 well above chance, residual beats raw PQ") {
    import spark.implicits._
    // quality gate, not correctness: with 16 stub codes on synthetic
    // embeddings, measured recall@5 is ~0.17 (PQ-ADC, IVF-PQ) and ~0.22
    // (residual IVF-PQ) against ~0.005 chance (5 of ~1000). Floors sit
    // at half the measured values so a broken ranking (which collapses
    // to chance) fails loudly while legitimate parameter tweaks pass;
    // the residual >= raw ordering is the FAISS claim reproduced.
    val rows = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1000000.0d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .sortBy(_._1)
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = rows.filter(_._1 < 20)
    val exact = queries.map { case (qid, qv) =>
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
    val pq = recall(Similarity.pqTopK(embeddings, "vec_id", "embedding",
      isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20, m = 8, dims = 64, k = 5))
    val ivfpq = recall(Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = 8, dims = 64, k = 5))
    val residual = recall(Similarity.ivfPqResidualTopK(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = 8, dims = 64, k = 5, nprobe = 2))
    val ivfpq2 = recall(Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = 8, dims = 64, k = 5, nprobe = 2))
    info(s"recall@5: pq=$pq ivfpq=$ivfpq ivfpq_nprobe2=$ivfpq2 residual=$residual")
    assert(pq >= 0.08, s"PQ-ADC recall@5 collapsed: $pq")
    assert(ivfpq >= 0.08, s"IVF-PQ recall@5 collapsed: $ivfpq")
    assert(ivfpq2 >= ivfpq - 1e-9,
      s"multiprobe nprobe=2 ($ivfpq2) should not lose to nprobe=1 ($ivfpq): " +
        "probing more cells can only widen the candidate set")
    assert(residual >= 0.10, s"residual IVF-PQ recall@5 collapsed: $residual")
    assert(residual >= pq - 1e-9,
      s"residual coding ($residual) should not lose to raw-vector PQ ($pq)")
  }

  test("trained codebooks beat designated-row codebooks on recall@5 (Jégou §II-C)") {
    import spark.implicits._
    // the VERDICT-r7 gate: 2 Lloyd rounds of per-subspace k-means must
    // IMPROVE recall over the raw designated-row init on the same fixture
    // — the reason codebook training exists. Floors set from measured
    // values (see assertion messages for the current numbers).
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
    val designated = recall(Similarity.pqTopK(embeddings, "vec_id", "embedding",
      isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20, m = 8, dims = 64, k = 5))
    val trained = recall(Similarity.pqTopK(embeddings, "vec_id", "embedding",
      isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20, m = 8, dims = 64, k = 5,
      trainIters = 2))
    info(s"recall@5: designated=$designated trained=$trained")
    // measured: designated ~0.17, trained ~0.29 (1.7x) — floor at half
    // the measured trained value (the suite's collapse-guard convention)
    assert(trained > designated,
      s"k-means training must improve recall@5: designated=$designated trained=$trained")
    assert(trained >= 0.14, s"trained-codebook recall@5 collapsed: $trained")
  }

  test("ADC-then-exact refine: driver-recomputed parity, recall not below raw IVF-PQ") {
    import spark.implicits._
    val rows = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1000000.0d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .sortBy(_._1)
    val vecOf = rows.toMap
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // PARITY: refine == exact-L2 re-rank of the ADC top-R candidate list
    // (recomputed driver-side from the audited ivfPqTopK output)
    val candTopR = Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
        m = 8, dims = 64, k = 25, nprobe = 2)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = candTopR.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      cands.toSeq.map { case (_, c) => (l2(vecOf(q), vecOf(c)), c) }
        .sorted.take(5).zipWithIndex
        .map { case ((d2, c), i) => (q, c, i + 1, d2) }
    }.toSet
    val refined = Similarity.ivfPqRefineTopK(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = 8, dims = 64, k = 5, refineR = 25, nprobe = 2)
    val got = refined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == expected)
    // RECALL: exact re-ranking of a 5x candidate list must not lose to
    // cutting the ADC ranking at k (the FAISS IndexRefineFlat claim)
    val exact = rows.filter(_._1 < 20).map { case (qid, qv) =>
      qid -> rows.filter(_._1 != qid)
        .map { case (cid, cv) => (l2(qv, cv), cid) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val g = df.select(col("query_id"), col("cand_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      exact.map { case (q, s) => g.getOrElse(q, Set.empty).count(s).toDouble / 5 }
        .sum / exact.size
    }
    val raw = recall(Similarity.ivfPqTopK(embeddings, "vec_id", "embedding",
      isCentroid = $"vec_id" < 8, isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20,
      m = 8, dims = 64, k = 5, nprobe = 2))
    val ref = recall(refined)
    info(s"recall@5: raw=$raw refined=$ref")
    assert(ref >= raw - 1e-9,
      s"exact re-ranking ($ref) must not lose to the raw ADC cut ($raw)")
  }

  /** Driver-side reference implementation over the real table: quantize
    * (HALF_UP like Spark's round), build the 16-entry codebooks, encode,
    * ADC-score, and rank — full parity with both operators. */
  test("pq parity on sf0.01 embeddings: distributed == sequential recompute") {
    val m = 8; val dims = 64; val sub = dims / m
    val rows = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1000000.0d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .sortBy(_._1)
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val books = (0 until m).map { s =>
      rows.filter(_._1 < 16).map { case (cid, v) =>
        cid -> v.slice(s * sub, (s + 1) * sub)
      }
    }
    def codesOf(v: Seq[Long]): Seq[(Long, Long)] = (0 until m).map { s =>
      books(s).map { case (cid, cv) => (l2(v.slice(s * sub, (s + 1) * sub), cv), cid) }
        .min match { case (d, cid) => (cid, d) }
    }
    val expectedEnc = rows.flatMap { case (id, v) =>
      codesOf(v).zipWithIndex.map { case ((cid, d), s) => (id, s.toLong, cid, d) }
    }.toSet
    import spark.implicits._
    val gotEnc = Similarity.pqEncode(embeddings, "vec_id", "embedding",
        isCode = $"vec_id" < 16, m = m, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotEnc == expectedEnc)

    val allCodes = rows.map { case (id, v) => id -> codesOf(v).map(_._1) }
    val expectedTopK = rows.filter(_._1 < 20).flatMap { case (qid, qv) =>
      allCodes.filter(_._1 != qid).map { case (cid, cs) =>
        val d = (0 until m).map { s =>
          val entry = books(s).find(_._1 == cs(s)).get._2
          l2(qv.slice(s * sub, (s + 1) * sub), entry)
        }.sum
        (cid, d)
      }.sortBy { case (cid, d) => (d, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, d), i) => (qid, cid, i + 1, d) }
    }.toSet
    val gotTopK = Similarity.pqTopK(embeddings, "vec_id", "embedding",
        isCode = $"vec_id" < 16, isQuery = $"vec_id" < 20, m = m, dims = dims, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(gotTopK == expectedTopK)
  }
}
