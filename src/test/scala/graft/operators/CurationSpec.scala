package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation decision table (q99): hand-derived reason codes
  * in precedence order, the familiarity gate, and — the composition
  * guarantee — flag-by-flag agreement with the standalone component
  * queries on the real corpus.
  */
class CurationSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def documents = spark.read.parquet(s"$dir/documents.parquet")

  private def tiny = {
    import spark.implicits._
    Seq(
      (0L, "the keys of the castle gate", "en"),    // benchmark
      (1L, "a good clean document with the words", "en"), // keep
      (2L, "a good clean document with the words", "en"), // exact dup of 1
      (3L, "11 22 33 44 55 xx", "en"),              // digits -> low_quality
      (4L, "the cat sat on the mat today", "fr"),   // en text, fr label
      (5L, "big keys of the tower", "en")           // shares "keys of the" with d0
    ).toDF("doc_id", "text", "lang")
  }

  test("curationDecisions: every reason code fires in precedence order") {
    import spark.implicits._
    val out = CorpusOps.curationDecisions(tiny, "doc_id", "text",
        declaredLang = $"lang", isBenchmark = $"doc_id" === 0L,
        n = 3, minFamiliarityPpm = 0L)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(7), r.getString(8))).toMap
    assert(out(0L) == (false, "benchmark"))
    assert(out(1L) == (true, "keep"))
    assert(out(2L) == (false, "exact_dup"))
    assert(out(3L) == (false, "low_quality"))
    assert(out(4L) == (false, "lang_mismatch"))
    assert(out(5L) == (false, "contaminated"))
  }

  test("curationDecisions: the familiarity gate drops otherwise-clean documents") {
    import spark.implicits._
    // an impossible threshold: the only doc that survived every other
    // gate now fails the familiarity gate instead
    val out = CorpusOps.curationDecisions(tiny, "doc_id", "text",
        declaredLang = $"lang", isBenchmark = $"doc_id" === 0L,
        n = 3, minFamiliarityPpm = 2000000L)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(7), r.getString(8))).toMap
    assert(out(1L) == (false, "unfamiliar"))
    assert(out(2L) == (false, "exact_dup")) // earlier reasons still win
  }

  test("curationDecisions agrees flag-by-flag with the standalone component queries") {
    import spark.implicits._
    val got = CorpusOps.curationDecisions(documents, "doc_id", "text",
        declaredLang = $"lang", isBenchmark = $"doc_id" % 50 === 0,
        n = 3, minFamiliarityPpm = 100000L)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getLong(6), r.getString(8)))
      .toMap
    assert(got.nonEmpty)

    // q21 quality
    val q21 = graft.queries.TextQueries.q21QualityScore(spark, dir)
      .select(col("doc_id"), col("quality_ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.forall { case (id, f) => f._1 == q21(id) }, "quality_ok != q21")

    // q22 language agreement
    val q22 = graft.queries.TextQueries.q22LangId(spark, dir)
      .select(col("doc_id"), (col("pred_lang") === col("lang")).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.forall { case (id, f) => f._2 == q22(id) }, "lang_ok != q22")

    // q23 canonical copies
    val keepIds = Dedup.exact(documents, "doc_id", "text")
      .select(col("keep_id")).collect().map(_.getLong(0)).toSet
    assert(got.forall { case (id, f) => f._3 == keepIds.contains(id) }, "canonical != q23")

    // q62 contamination (non-benchmark docs; benchmark docs default false
    // and carry the 'benchmark' reason)
    val q62 = CorpusOps.decontaminate(documents, "doc_id", "text",
        isBenchmark = $"doc_id" % 50 === 0, n = 3)
      .select(col("doc_id"), col("contaminated"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.forall { case (id, f) =>
      if (id % 50 == 0) !f._4 && f._6 == "benchmark" else f._4 == q62(id)
    }, "contaminated != q62")

    // q96 familiarity
    val q96 = VocabOps.lmFamiliarity(documents, "doc_id", "text", 2)
      .select(col("doc_id"), col("familiarity_ppm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, f) => f._5 == q96(id) }, "familiarity_ppm != q96")
  }
}
