package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards on the operators that touch driver memory or broadcast state:
  * kmeansTrain's bounded seed collect and non-empty centroid invariants,
  * the equivalence of its two assignment paths (unrolled codegen vs the
  * large-k literal-matrix fold), and decontaminate's benchmark-side
  * broadcast gate + canonicalization toggle.
  */
class OperatorGuardSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")
  private def documents = spark.read.parquet(s"$dir/documents.parquet")

  test("kmeansTrain: all three assignment paths return exactly the same result") {
    import spark.implicits._
    // k = 100 seeds: far past any sane unroll (the literal path would emit
    // 100 inline dot+struct expressions); force all THREE paths over the
    // same seeds and compare full outputs — the default native codegen'd
    // argmax must match the fold and unrolled Column-DSL formulations
    val native = Similarity.kmeansTrain(embeddings, "vec_id", "embedding",
      isSeed = $"vec_id" < 100, iters = 1).collect().toSet
    val unrolled = Similarity.kmeansTrain(embeddings, "vec_id", "embedding",
      isSeed = $"vec_id" < 100, iters = 1, codegenMaxK = 1000,
      nativeAssign = false).collect().toSet
    val folded = Similarity.kmeansTrain(embeddings, "vec_id", "embedding",
      isSeed = $"vec_id" < 100, iters = 1, codegenMaxK = 0,
      nativeAssign = false).collect().toSet
    assert(native.nonEmpty)
    assert(folded == unrolled)
    assert(native == folded)
  }

  test("kmeansTrain: every assignment path stays narrow - exactly the one update shuffle") {
    import org.apache.spark.sql.execution.FormattedMode
    import spark.implicits._
    // whatever the path, the output plan is scan -> narrow argmax ->
    // partial agg -> ONE exchange -> final agg; a join or window sneaking
    // into the assignment would add exchanges
    for ((ck, native) <- Seq((0, true), (0, false), (1000, false))) {
      val p = Similarity.kmeansTrain(embeddings, "vec_id", "embedding",
        isSeed = $"vec_id" < 100, iters = 1, codegenMaxK = ck,
        nativeAssign = native)
        .queryExecution.explainString(FormattedMode)
      val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
      assert(exchanges == 1,
        s"codegenMaxK=$ck native=$native: expected 1 exchange, saw $exchanges:\n$p")
      assert(!p.contains("Join"), s"codegenMaxK=$ck native=$native: assignment must not join")
    }
  }

  test("kmeansTrain: seed sets over maxSeeds fail loudly, never a bulk collect") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Similarity.kmeansTrain(embeddings, "vec_id", "embedding",
        isSeed = lit(true), iters = 1, maxSeeds = 10)
    }
    assert(ex.getMessage.contains("maxSeeds"))
  }

  test("kmeansTrain: an empty / all-zero-norm seed set is an error, not a null plan") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Similarity.kmeansTrain(embeddings, "vec_id", "embedding",
        isSeed = lit(false), iters = 1)
    }
    assert(ex.getMessage.contains("no usable seeds"))
    // zero-norm seeds are dropped before they can poison the assignment
    val zeros = Seq((1L, Seq.fill(4)(0.0f)), (2L, Seq.fill(4)(0.0f)))
      .toDF("vec_id", "embedding")
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.kmeansTrain(zeros, "vec_id", "embedding",
        isSeed = lit(true), iters = 1)
    }
    assert(ex2.getMessage.contains("no usable seeds"))
  }

  test("kmeansTrain: non-long id columns are cast, not ClassCastException") {
    import spark.implicits._
    val ints = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 1.0f)), (3, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansTrain(ints, "vec_id", "embedding",
      isSeed = $"vec_id" <= 2, iters = 1).collect()
    assert(out.map(_.getLong(1)).sum == 3L) // all 3 vectors assigned
  }

  test("semDedup: keep-the-first within cells, cross-cell twins untouched") {
    import spark.implicits._
    // 2-dim vectors, centroids 0 -> (1,0) and 1 -> (0,1); threshold 0.95:
    // 10 duplicates centroid-member 0 exactly; 11/12 sit at cos 0.8 from
    // everything in their cells; 13 duplicates member 1
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),
      (10L, Seq(1.0f, 0.0f)),  // cell 0, twin of 0 -> dropped
      (11L, Seq(0.8f, 0.6f)),  // cell 0 (cos 0.8 vs c0), no >=0.95 neighbor
      (12L, Seq(0.6f, 0.8f)),  // cell 1, no >=0.95 neighbor
      (13L, Seq(0.0f, 1.0f))   // cell 1, twin of 1 -> dropped
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
      isCentroid = $"vec_id" < 2, minCosPpm = 950000L)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, true),
      (1L, 1L, 0L, true),
      (10L, 0L, 1L, false),  // one lower-id near neighbor (vec 0)
      (11L, 0L, 0L, true),
      (12L, 1L, 0L, true),
      (13L, 1L, 1L, false))) // vec 1 is a twin; vec 12 at 0.8 is not
  }

  test("semDedup: zero-norm vectors and centroids are excluded, not NaN-collapsed") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)),  // zero-norm centroid candidate - dropped
      (1L, Seq(1.0f, 0.0f)),  // real centroid
      (10L, Seq(0.0f, 0.0f)), // zero-norm corpus vector - dropped
      (11L, Seq(1.0f, 0.0f))  // twin of 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
        isCentroid = $"vec_id" < 2, minCosPpm = 950000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    // a NaN cosine from vec 0 would have swallowed everything into cell 0;
    // instead cell 1 survives and the zero-norm rows are absent
    assert(out == Set((1L, 1L, 0L, true), (11L, 1L, 1L, false)))
  }

  test("semDedup: centroid sets over maxCentroids fail loudly before broadcast") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Similarity.semDedup(embeddings, "vec_id", "embedding",
        isCentroid = lit(true), minCosPpm = 0L, maxCentroids = 10)
    }
    assert(ex.getMessage.contains("maxCentroids"))
  }

  test("semDedup: a corpus-swallowing cell fails loudly before the quadratic join") {
    import spark.implicits._
    // one real centroid -> every vector lands in its cell; with the skew
    // gate at 100 the within-cell self-join must never be attempted
    val ex = intercept[IllegalArgumentException] {
      Similarity.semDedup(embeddings, "vec_id", "embedding",
        isCentroid = $"vec_id" === 0L, minCosPpm = 0L, maxCellSize = 100L)
    }
    assert(ex.getMessage.contains("maxCellSize"))
  }

  test("decontaminate: benchmark sides over maxBenchDocs fail loudly before broadcast") {
    val ex = intercept[IllegalArgumentException] {
      CorpusOps.decontaminate(documents, "doc_id", "text",
        isBenchmark = lit(true), n = 3, maxBenchDocs = 10)
    }
    assert(ex.getMessage.contains("maxBenchDocs"))
  }

  test("decontaminate: normalization catches case/punctuation-disguised leaks") {
    import spark.implicits._
    val docs = Seq(
      (0L, "The Quick Brown Fox!"),   // benchmark doc
      (1L, "the quick brown fox"),    // leaked, cosmetically edited
      (2L, "an unrelated document entirely")
    ).toDF("doc_id", "text")
    val bench = $"doc_id" === 0L
    val raw = CorpusOps.decontaminate(docs, "doc_id", "text", bench, n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(raw == Map(1L -> false, 2L -> false)) // raw shingles miss the edit
    val norm = CorpusOps.decontaminate(docs, "doc_id", "text", bench, n = 3,
      normalize = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(norm == Map(1L -> true, 2L -> false))
  }
}
