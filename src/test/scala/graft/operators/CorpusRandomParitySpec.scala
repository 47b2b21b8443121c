package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import org.scalatest.funsuite.AnyFunSuite

/** Random-corpus parity for the LLM-pipeline operators: each distributed
  * formulation is replayed against a direct sequential Scala computation
  * on seeded random documents — the same simulator-parity rigor the
  * cometbft pairing machines get from NetworkLatencySimSpec. A window,
  * join, or shuffle reformulation that quietly changes semantics fails
  * here on inputs nobody hand-picked.
  */
class CorpusRandomParitySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "x", "yy")

  /** Seeded random docs: ~120 docs of 0..20 tokens from a tiny vocabulary
    * (small enough to force shingle collisions and score ties). */
  private def randomDocs(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until 120L).map { i =>
      val n = rnd.nextInt(21)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  private def toks(s: String): Seq[String] =
    s.trim.split("[ \t\n\r\f]+").toSeq.filter(_.nonEmpty)

  private def shingles(s: String, n: Int): Set[String] = {
    val t = toks(s)
    if (t.size < n) Set.empty else t.sliding(n).map(_.mkString(" ")).toSet
  }

  test("decontaminate == per-doc set intersection against the benchmark shingle union") {
    import spark.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = randomDocs(seed)
      val df = docs.toDF("doc_id", "text")
      val bench = docs.filter(_._1 % 10 == 0).flatMap(d => shingles(d._2, 3)).toSet
      val expected = docs.filterNot(_._1 % 10 == 0).map { case (id, text) =>
        val sh = shingles(text, 3)
        val cont = sh.count(bench.contains).toLong
        val ppm = if (sh.isEmpty) 0L else cont * 1000000L / sh.size
        (id, sh.size.toLong, cont, ppm, cont > 0)
      }.toSet
      val got = CorpusOps.decontaminate(df, "doc_id", "text",
          isBenchmark = $"doc_id" % 10 === 0, n = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("packSequences == sequential per-shard fold") {
    import spark.implicits._
    for (seed <- Seq(4L, 5L)) {
      val docs = randomDocs(seed)
      val df = docs.toDF("doc_id", "text")
      val budget = 16L
      val counts = docs.map { case (id, t) => id -> toks(t).size.toLong }
      val expected = counts.groupBy(_._1 % 4).flatMap { case (shard, ds) =>
        var off = 0L
        ds.sortBy(_._1).map { case (id, n) =>
          val start = off; off += n
          val first = start / budget
          val last  = math.max(start + n - 1, start) / budget
          (id, shard, n, start, first, last, last > first)
        }
      }.toSet
      val got = CorpusOps.packSequences(df, "doc_id",
          size(tokens($"text")).cast("long"), budget, nShards = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6)))
        .toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("repetitionScore == direct n-gram counting") {
    import spark.implicits._
    val docs = randomDocs(6L)
    val expected = docs.map { case (id, t) =>
      val tk = toks(t)
      val grams = if (tk.size < 3) Seq.empty else tk.sliding(3).map(_.mkString(" ")).toSeq
      val n = grams.size.toLong; val d = grams.distinct.size.toLong
      val ppm = if (n == 0) 0L else (n - d) * 1000000L / n
      (id, n, d, ppm)
    }.toSet
    val got = CorpusOps.repetitionScore(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("bpePairCounts == direct frequency-weighted pair map") {
    import spark.implicits._
    val docs = randomDocs(7L)
    val wordCounts = docs.flatMap(d => toks(d._2)).groupBy(identity).view.mapValues(_.size.toLong)
    val pairCounts = wordCounts.toSeq.flatMap { case (w, c) =>
      if (w.length < 2) Seq.empty else w.sliding(2).map(_ -> c).toSeq
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }.take(10)
      .zipWithIndex.map { case ((p, c), i) => (p, c, i + 1) }.toSet
    val got = VocabOps.bpePairCounts(docs.toDF("doc_id", "text"), "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("tfidfKeywords == direct tf*1e6//df ranking") {
    import spark.implicits._
    val docs = randomDocs(8L)
    val tf = docs.flatMap { case (id, t) => toks(t).map(id -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfreq = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = tf.toSeq
      .map { case ((id, tok), f) => (id, tok, f, dfreq(tok), f * 1000000L / dfreq(tok)) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, tok, _, _, s) => (-s, tok) }.take(3)
          .zipWithIndex.map { case ((id, tok, f, d, s), i) => (id, tok, f, d, s, i + 1) }
      }.toSet
    val got = VocabOps.tfidfKeywords(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toSet
    assert(got == expected)
  }

  test("trainOrder: reproducible, dense per-shard positions, salt-sensitive") {
    import spark.implicits._
    val df = randomDocs(9L).toDF("doc_id", "text")
    def run(salt: String) = CorpusOps.trainOrder(df, "doc_id", salt, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run("s1")
    assert(a == run("s1"))           // pure function of (salt, id)
    assert(a != run("s2"))           // salt reshuffles
    // positions are a dense 1..n per shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq)
    }
  }
}
