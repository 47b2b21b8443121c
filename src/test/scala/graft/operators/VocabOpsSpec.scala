package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked cases for the vocabulary operators: pair weighting by
  * word frequency, single-char word exclusion, rank tie-breaks, and the
  * integer tf-idf ordering. */
class VocabOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bpePairCounts: frequency-weighted pairs, 1-char words excluded, ties by pair") {
    import spark.implicits._
    // "ab" x3 (docs 1,1,2), "abc" x1, "a" x2 (never pairs)
    val docs = Seq((1L, "ab ab a"), (2L, "ab abc a")).toDF("doc_id", "text")
    val out = VocabOps.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sortBy(_._3)
    // pairs: ab: 3(from "ab") + 1(from "abc") = 4; bc: 1
    assert(out == Seq(("ab", 4L, 1), ("bc", 1L, 2)))
  }

  test("bpePairCounts: overlapping pairs inside one word all count") {
    import spark.implicits._
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = VocabOps.bpePairCounts(docs, "text", topK = 5).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("aa", 2L)))
  }

  test("bpeEncode: sequential rank-order application, zero-word docs preserved") {
    import spark.implicits._
    // merges: (a,b)->ab then (ab,c)->abc. "abc" -> [abc] (1), "abab" ->
    // [ab, ab] (2), "cab" -> [c, ab] (2), "x" -> [x] (1); doc 3 has no words
    val docs = Seq(
      (1L, "abc abab"),
      (2L, "cab x abc"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = VocabOps.bpeEncode(docs, "doc_id", "text",
        merges = Seq(("a", "b"), ("ab", "c")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, 1500000L),  // abc(1) + abab(2) over 2 words
      (2L, 3L, 4L, 1333333L),  // cab(2) + x(1) + abc(1) over 3 words
      (3L, 0L, 0L, 0L)))
  }

  test("bpeEncode: training-consistent - encoding equals the trained vocabulary's segmentation") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val words = Seq("aaa", "abab", "banana", "bb", "cabbage", "baa")
    val docs = (0 until 25).map { i =>
      (i.toLong, (0 until 10).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val merges = VocabOps.bpeTrainLocal(docs, "text", nMerges = 5)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = VocabOps.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // driver reference: apply the same merges to each doc's words
    def applyAll(w: String): Int = {
      var syms = w.map(_.toString).toArray
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
      syms.length
    }
    val want = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).map(applyAll(_).toLong).sum
    }.toMap
    assert(enc == want)
  }

  test("tfidfKeywords: rare tokens outrank frequent corpus-wide tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared shared rare1"),   // "shared" df=3; rare1 df=1
      (2L, "shared rare2 rare2"),
      (3L, "shared")
    ).toDF("doc_id", "text")
    val out = VocabOps.tfidfKeywords(docs, "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSeq.sortBy(_._1)
    // doc1: shared tf2/df3 = 666666 vs rare1 1e6 -> rare1 wins
    // doc2: rare2 tf2/df1 = 2e6 wins; doc3 only has shared (333333)
    assert(out == Seq((1L, "rare1", 1000000L), (2L, "rare2", 2000000L),
      (3L, "shared", 333333L)))
  }

  test("bpeTrainLocal: identical merge table to the distributed path") {
    import spark.implicits._
    // random-ish corpus with overlap-heavy words, ties, and 1-char words
    val rnd = new scala.util.Random(42)
    val words = Seq("aaa", "abab", "banana", "a", "bb", "cabbage", "baa", "abc")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val dist = VocabOps.bpeTrain(docs, "text", nMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val local = VocabOps.bpeTrainLocal(docs, "text", nMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(local == dist)
    assert(local.size == 6)
  }

  test("bpeTrain: per-round checkpoint blocks are freed, not accumulated") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab abc"), (2L, "banana band")).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    VocabOps.bpeTrain(docs, "text", nMerges = 4).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"bpeTrain leaked checkpoint RDDs: ${(after -- before).mkString(",")}")
  }

  test("bpeTrainLocal: vocabularies over maxVocabWords fail loudly, never a bulk collect") {
    import spark.implicits._
    val docs = (0 until 30).map(i => (i.toLong, s"w$i x$i y$i")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      VocabOps.bpeTrainLocal(docs, "text", nMerges = 1, maxVocabWords = 10)
    }
    assert(ex.getMessage.contains("maxVocabWords"))
  }

  test("oovRate: top-V cut with total-order ties, empty docs preserved") {
    import spark.implicits._
    // frequencies: aa 4, bb 3, cc 2, dd 2, ee 1 -> V=3 keeps {aa, bb, cc}
    // (cc beats dd on the tie by word asc)
    val docs = Seq(
      (1L, "aa aa bb cc"),
      (2L, "aa bb dd dd"),
      (3L, "aa bb cc ee"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = VocabOps.oovRate(docs, "doc_id", "text", vocabSize = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 0L, 0L),
      (2L, 4L, 2L, 500000L),  // dd dd are OOV
      (3L, 4L, 1L, 250000L),  // ee is OOV
      (4L, 0L, 0L, 0L)))
  }

  test("tfidfKeywords: score ties break on the token string") {
    import spark.implicits._
    val docs = Seq((1L, "bbb aaa"), (2L, "bbb aaa")).toDF("doc_id", "text")
    // both tokens: tf=1, df=2 -> same score; "aaa" < "bbb"
    val out = VocabOps.tfidfKeywords(docs, "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(out == Seq((1L, "aaa"), (2L, "aaa")))
  }

  test("lmFamiliarity: hand-derived bigram df-ppm means, short docs report zeros") {
    import spark.implicits._
    // 3 docs: "a b" appears in docs 1 and 2 (df_ppm = 2e6 // 3 = 666666);
    // "b c" and "b d" in one doc each (333333). Doc 3 has no bigram.
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x")).toDF("doc_id", "text")
    val out = VocabOps.lmFamiliarity(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 499999L, 333333L, 666666L), // (666666 + 333333) // 2
      (2L, 2L, 499999L, 333333L, 666666L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("lmFamiliarity: repeated instances weight the mean (multiset, not set)") {
    import spark.implicits._
    // doc 1 repeats "a b" 3x and has "b z" once: df("a b") covers both
    // docs (1e6 ppm with 2 docs... 2//2), df("b z") = 1 of 2 (500000).
    val docs = Seq((1L, "a b a b a b z"), (2L, "a b")).toDF("doc_id", "text")
    // doc1 bigrams: "a b","b a","a b","b a","a b","b z" -> 6 instances
    // df_ppm: "a b" = 2*1e6//2 = 1000000; "b a" = 500000; "b z" = 500000
    // mean = (1000000*3 + 500000*2 + 500000) // 6 = 4500000 // 6 = 750000
    val out = VocabOps.lmFamiliarity(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 6L, 750000L, 500000L, 1000000L),
      (2L, 1L, 1000000L, 1000000L, 1000000L)))
  }
}
