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

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def gramsOf(s: String, n: Int): Seq[String] = {
    val t = toks(s)
    if (t.size < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("boilerplateNgrams == direct multiset count + distinct doc freq, tie-broken top-k") {
    import spark.implicits._
    for (seed <- Seq(10L, 11L)) {
      val docs = randomDocs(seed)
      val all = docs.flatMap { case (id, t) => gramsOf(t, 2).map(g => (g, id)) }
      val expected = all.groupBy(_._1)
        .map { case (g, rows) => (g, rows.size.toLong, rows.map(_._2).distinct.size.toLong) }
        .toSeq.sortBy { case (g, c, _) => (-c, g) }.take(15).toSet
      val got = CorpusOps.boilerplateNgrams(docs.toDF("doc_id", "text"), "doc_id", "text",
          n = 2, k = 15)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("repeatedSpanCoverage == direct corpus-wide multiset membership") {
    import spark.implicits._
    for (seed <- Seq(12L, 13L)) {
      val docs = randomDocs(seed)
      val counts = docs.flatMap(d => gramsOf(d._2, 2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = docs.map { case (id, t) =>
        val g = gramsOf(t, 2)
        val rep = g.count(counts(_) > 1).toLong
        val ppm = if (g.isEmpty) 0L else rep * 1000000L / g.size
        (id, g.size.toLong, rep, ppm)
      }.toSet
      val got = CorpusOps.repeatedSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("importanceWeights == direct smoothed-ratio scoring (same IEEE op order)") {
    import spark.implicits._
    for (seed <- Seq(14L, 15L)) {
      val docs = randomDocs(seed)
      val B = 1 << 18
      val featOf = (t: String) => hash60(t) % B
      val isTgt = (id: Long) => id % 7 == 0
      val tokFeats = docs.flatMap { case (id, t) => toks(t).map(tok => (id, featOf(tok))) }
      val tgtCnt = tokFeats.filter(r => isTgt(r._1)).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val rawCnt = tokFeats.filterNot(r => isTgt(r._1)).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val tgtTotal = tokFeats.count(r => isTgt(r._1)).toLong
      val rawTotal = tokFeats.size.toLong - tgtTotal
      def affinity(f: Long): Long =
        math.min(1000000000000L,
          math.floor(1000000.0d *
            ((tgtCnt.getOrElse(f, 0L) + 1L).toDouble / (tgtTotal + B).toDouble) /
            ((rawCnt.getOrElse(f, 0L) + 1L).toDouble / (rawTotal + B).toDouble)).toLong)
      val expected = tokFeats.filterNot(r => isTgt(r._1)).groupBy(_._1).map { case (id, fs) =>
        (id, fs.size.toLong, fs.map(r => affinity(r._2)).sum / fs.size)
      }.toSet
      val got = CorpusOps.importanceWeights(docs.toDF("doc_id", "text"), "doc_id", "text",
          isTarget = $"doc_id" % 7 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("sourceOverlap == direct per-source distinct set intersections") {
    import spark.implicits._
    for (seed <- Seq(16L, 17L)) {
      val docs = randomDocs(seed)
      val srcOf = (id: Long) => s"s${id % 5}"
      val sets = docs.groupBy(d => srcOf(d._1)).view
        .mapValues(_.flatMap(d => gramsOf(d._2, 2)).toSet).toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        shared = (sets(a) intersect sets(b)).size.toLong if shared > 0
      } yield {
        val na = sets(a).size.toLong; val nb = sets(b).size.toLong
        (a, b, shared, na, nb, shared * 1000000L / (na + nb - shared))
      }).toSet
      // both pair-counting paths must agree with the direct computation:
      // the bitmask rollup (default; 5 sources fit a long) and the
      // per-shingle self-join fallback (forced via maxMaskSources = 0)
      for (maxMask <- Seq(64, 0)) {
        val got = CorpusOps.sourceOverlap(docs.toDF("doc_id", "text"), "doc_id", "text",
            source = concat(lit("s"), pmod($"doc_id", lit(5L))), n = 2,
            maxMaskSources = maxMask)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSet
        assert(got == expected, s"seed $seed maxMaskSources=$maxMask")
      }
    }
  }

  test("spanDecontaminate == direct covered-position SET size (independent of the lag formula)") {
    import spark.implicits._
    for (seed <- Seq(18L, 19L)) {
      val docs = randomDocs(seed)
      val n = 2
      val bench = docs.filter(_._1 % 10 == 0).flatMap(d => gramsOf(d._2, n)).toSet
      val expected = docs.filterNot(_._1 % 10 == 0).map { case (id, t) =>
        val g = gramsOf(t, n)
        // union of covered token indices, materialized as an actual set —
        // a different computation than the operator's single lag window
        val covered = g.zipWithIndex.collect { case (gr, i) if bench.contains(gr) =>
          i until (i + n)
        }.flatten.toSet.size.toLong
        val nTok = toks(t).size.toLong
        val ppm = if (nTok == 0) 0L else covered * 1000000L / nTok
        (id, nTok, covered, ppm)
      }.toSet
      val got = CorpusOps.spanDecontaminate(docs.toDF("doc_id", "text"), "doc_id", "text",
          isBenchmark = $"doc_id" % 10 === 0, n = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("semDedup == direct argmax assignment + within-cell pairwise check") {
    import spark.implicits._
    val rnd = new scala.util.Random(20L)
    val dims = 6
    val vecs: Seq[(Long, Seq[Float])] = (0L until 60L).map { i =>
      i -> Seq.fill(dims)((rnd.nextInt(2001) - 1000) / 1000.0f)
    }
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.round(x.toDouble * 1000000.0d)))
    }
    def dot(a: Seq[Long], b: Seq[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Seq[Long], b: Seq[Long]): Double =
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    val cents = q.filter(_._1 < 4)
    val assigned = q.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cos(v, cv), cid) }
        .min(Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long]))
      (id, best._2, v)
    }
    val minCosPpm = 300000L
    val expected = assigned.map { case (id, cell, v) =>
      val nNear = assigned.count { case (id2, cell2, v2) =>
        cell2 == cell && id2 < id &&
          math.floor(cos(v, v2) * 1000000.0d).toLong >= minCosPpm
      }.toLong
      (id, cell, nNear, nNear == 0L)
    }.toSet
    val got = Similarity.semDedup(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        isCentroid = $"vec_id" < 4, minCosPpm = minCosPpm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == expected)
  }

  test("bpeTrain == direct sequential merge training (leftmost non-overlapping)") {
    import spark.implicits._
    def mergeLeftmost(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.result()
    }
    for (seed <- Seq(21L, 22L)) {
      val docs = randomDocs(seed)
      var ws: Seq[(Vector[String], Long)] = docs.flatMap(d => toks(d._2))
        .filterNot(_.contains("|"))
        .groupBy(identity).toSeq
        .map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
      val expected = (1 to 3).map { r =>
        val pairCounts = ws.flatMap { case (s, c) =>
          s.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> c)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        val ((a, b), total) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        ws = ws.map { case (s, c) => (mergeLeftmost(s, a, b), c) }
        (r, a, b, a + b, total)
      }
      val got = VocabOps.bpeTrain(docs.toDF("doc_id", "text"), "text", nMerges = 3)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      assert(got == expected, s"seed $seed")
    }
  }

  test("chunkWindows == direct sliding-window slicing") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L); (w, s) <- Seq((8, 4), (5, 5), (6, 1))) {
      val docs = randomDocs(seed)
      val expected = docs.flatMap { case (id, text) =>
        val t = toks(text)
        if (t.isEmpty) Seq.empty
        else {
          val nChunks = 1 + math.ceil(math.max(t.size - w, 0).toDouble / s).toInt
          (0 until nChunks).map { k =>
            val start = k * s
            val len = math.min(w, t.size - start)
            (id, k.toLong, start.toLong, len.toLong, t.slice(start, start + len).mkString(" "))
          }
        }
      }.toSet
      val got = CorpusOps.chunkWindows(docs.toDF("doc_id", "text"), "doc_id", "text",
          window = w, stride = s)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      assert(got == expected, s"seed $seed window $w stride $s")
    }
  }

  test("oovRate == direct top-V frequency cut") {
    import spark.implicits._
    for (seed <- Seq(21L, 22L); v <- Seq(3, 5)) {
      val docs = randomDocs(seed)
      val freq = docs.flatMap(d => toks(d._2)).groupBy(identity).view.mapValues(_.size).toMap
      val vocab = freq.toSeq.sortBy { case (w, c) => (-c, w) }.take(v).map(_._1).toSet
      val expected = docs.map { case (id, text) =>
        val t = toks(text)
        val oov = t.count(!vocab.contains(_)).toLong
        val ppm = if (t.isEmpty) 0L else oov * 1000000L / t.size
        (id, t.size.toLong, oov, ppm)
      }.toSet
      val got = VocabOps.oovRate(docs.toDF("doc_id", "text"), "doc_id", "text", vocabSize = v)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"seed $seed V=$v")
    }
  }

  test("lmFamiliarity == direct bigram document-frequency scoring") {
    import spark.implicits._
    for (seed <- Seq(41L, 42L)) {
      val docs = randomDocs(seed)
      val nDocs = docs.size.toLong
      def bigrams(t: String): Seq[String] = {
        val tk = toks(t)
        if (tk.size < 2) Seq.empty else tk.sliding(2).map(_.mkString(" ")).toSeq
      }
      val dfPpm = docs.flatMap { case (id, t) => bigrams(t).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size * 1000000L / nDocs }
      val expected = docs.map { case (id, t) =>
        val ps = bigrams(t).map(dfPpm)
        if (ps.isEmpty) (id, 0L, 0L, 0L, 0L)
        else (id, ps.size.toLong, ps.sum / ps.size, ps.min, ps.max)
      }.toSet
      val got = VocabOps.lmFamiliarity(docs.toDF("doc_id", "text"), "doc_id", "text", n = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("bpeEncode == direct rank-order merge application over random merge tables") {
    import spark.implicits._
    for (seed <- Seq(31L, 32L)) {
      val docs = randomDocs(seed)
      // random but valid merge tables: successive merges may chain (ab + c)
      val rnd = new scala.util.Random(seed)
      val chars = "abgdezxy".map(_.toString)
      var symbols = chars.toVector
      val merges = (1 to 5).map { _ =>
        val a = symbols(rnd.nextInt(symbols.size))
        val b = symbols(rnd.nextInt(symbols.size))
        symbols :+= (a + b)
        (a, b)
      }
      def encode(word: String): Int = {
        var syms = word.map(_.toString).toArray
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
      val expected = docs.map { case (id, text) =>
        val t = toks(text).filterNot(_.contains("|"))
        val subs = t.map(encode(_).toLong).sum
        val ppm = if (t.isEmpty) 0L else subs * 1000000L / t.size
        (id, t.size.toLong, subs, ppm)
      }.toSet
      val got = VocabOps.bpeEncode(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"seed $seed merges $merges")
    }
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

  test("importanceResample == direct BigInt scale + md5-bucket decisions") {
    import spark.implicits._
    for (seed <- Seq(20L, 21L)) {
      val docs = randomDocs(seed)
      val B = 1 << 18
      val isTgt = (id: Long) => id % 7 == 0
      val tokFeats = docs.flatMap { case (id, t) => toks(t).map(tok => (id, hash60(tok) % B)) }
      val tgtCnt = tokFeats.filter(r => isTgt(r._1)).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val rawCnt = tokFeats.filterNot(r => isTgt(r._1)).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val tgtTotal = tokFeats.count(r => isTgt(r._1)).toLong
      val rawTotal = tokFeats.size.toLong - tgtTotal
      def affinity(f: Long): Long =
        math.min(1000000000000L,
          math.floor(1000000.0d *
            ((tgtCnt.getOrElse(f, 0L) + 1L).toDouble / (tgtTotal + B).toDouble) /
            ((rawCnt.getOrElse(f, 0L) + 1L).toDouble / (rawTotal + B).toDouble)).toLong)
      val weights = tokFeats.filterNot(r => isTgt(r._1)).groupBy(_._1).map { case (id, fs) =>
        (id, fs.size.toLong, fs.map(r => affinity(r._2)).sum / fs.size)
      }.toSeq
      val budget = 60L
      val mass = weights.map(w => BigInt(w._2) * BigInt(w._3)).sum
      val scale =
        if (mass == 0 || BigInt(budget) >= mass) 1000000000000000000L
        else (BigInt(budget) * BigInt("1000000000000000000") / mass).toLong
      val expected = weights.map { case (id, nTok, score) =>
        val keep = math.min(1000000L, (BigInt(score) * BigInt(scale) / BigInt(1000000000000L)).toLong)
        (id, nTok, score, keep, hash60(s"s:$id") % 1000000L < keep)
      }.toSet
      val got = CorpusOps.importanceResample(docs.toDF("doc_id", "text"), "doc_id", "text",
          isTarget = $"doc_id" % 7 === 0, budgetTokens = budget, salt = "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("mixPlan == direct per-domain BigInt rates + md5-bucket sampling") {
    import spark.implicits._
    for (seed <- Seq(22L, 23L)) {
      val docs = randomDocs(seed)
      val srcOf = (id: Long) => s"s${id % 5}"
      val shares = Map("s0" -> 400000L, "s1" -> 300000L, "s2" -> 200000L) // s3/s4 dropped
      val budget = 100L
      val byDom = docs.groupBy(d => srcOf(d._1))
      val expected = byDom.map { case (dom, ds) =>
        val nTokens = ds.map(d => toks(d._2).size.toLong).sum
        val share = shares.getOrElse(dom, 0L)
        val keep =
          if (nTokens == 0L) 0L
          else math.min(1000000L, (BigInt(budget) * BigInt(share) / BigInt(nTokens)).toLong)
        val sampled = ds.filter(d => hash60(s"m:${d._1}") % 1000000L < keep)
        (dom, ds.size.toLong, nTokens, share, keep,
          sampled.size.toLong, sampled.map(d => toks(d._2).size.toLong).sum)
      }.toSet
      val got = CorpusOps.mixPlan(docs.toDF("doc_id", "text"), "doc_id", "text",
          domain = concat(lit("s"), pmod($"doc_id", lit(5L))),
          targetSharesPpm = shares.toSeq, budgetTokens = budget, salt = "m")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("cutRepeatedSpans == direct df-count + interval union + token rebuild") {
    import spark.implicits._
    for (seed <- Seq(24L, 25L)) {
      val docs = randomDocs(seed)
      val n = 2
      val withPos = docs.map { case (id, t) =>
        val tk = toks(t)
        (id, tk, if (tk.size < n) Seq.empty[(Int, String)]
          else tk.sliding(n).zipWithIndex.map { case (g, i) => (i, g.mkString(" ")) }.toSeq)
      }
      val df = withPos.flatMap { case (id, _, gs) => gs.map(g => (g._2, id)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val expected = withPos.map { case (id, tk, gs) =>
        val covered = gs.filter(g => df(g._2) >= 2)
          .flatMap(g => g._1 until g._1 + n).toSet
        val rebuilt = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }.mkString(" ")
        val nTok = tk.size.toLong
        (id, nTok, covered.size.toLong,
          if (nTok == 0L) 0L else covered.size.toLong * 1000000L / nTok, rebuilt)
      }.toSet
      val got = CorpusOps.cutRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          n = n, minDocs = 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("gopherSignals == direct per-doc line/ngram counting (incl. the packed tie-break)") {
    import spark.implicits._
    for (seed <- Seq(31L, 32L, 33L)) {
      val rnd = new scala.util.Random(seed)
      // multi-line docs from a tiny vocabulary: duplicate lines, bullets,
      // and ellipses occur naturally and n-gram counts tie often
      val docs = (0L until 80L).map { i =>
        val nLines = rnd.nextInt(6)
        val lines = Seq.fill(nLines) {
          val prefix = rnd.nextInt(10) match {
            case 0 => "- "; case 1 => "* "; case _ => ""
          }
          val suffix = if (rnd.nextInt(10) == 0) "..." else ""
          val body = Seq.fill(rnd.nextInt(6))(vocab(rnd.nextInt(4))).mkString(" ")
          s"$prefix$body$suffix"
        }
        i -> lines.mkString("\n")
      }
      def expectedOf(id: Long, text: String) = {
        val nb = text.split("\n", -1).toSeq.filter(_.trim.nonEmpty)
        val byContent = nb.groupBy(identity).view.mapValues(_.size).toMap
        val nl = nb.size.toLong
        val dl = nb.count(l => byContent(l) >= 2).toLong
        val lc = nb.map(_.length.toLong).sum
        val dc = nb.filter(l => byContent(l) >= 2).map(_.length.toLong).sum
        val bl = nb.count(l => Seq("-", "*", "•").exists(l.trim.startsWith)).toLong
        val el = nb.count(l => Seq("...", "…").exists(l.trim.endsWith)).toLong
        def cov(n: Int): Long = {
          val t = toks(text)
          if (t.size < n) 0L
          else {
            val counts = t.sliding(n).map(_.mkString(" ")).toSeq
              .groupBy(identity).view.mapValues(_.size.toLong).toMap
            counts.map { case (g, c) => c * 1000000000000L + c * g.length }
              .max % 1000000000000L
          }
        }
        def frac(a: Long, b: Long) = if (b == 0L) 0.0 else a.toDouble / b.toDouble
        (id, nl, frac(dl, nl), frac(dc, lc), frac(bl, nl), frac(el, nl),
          frac(cov(2), text.length.toLong), frac(cov(3), text.length.toLong))
      }
      val expected = docs.map { case (id, t) => expectedOf(id, t) }.toSet
      val got = CorpusOps.gopherSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSet
      assert(got == expected, s"seed $seed")
    }
  }
}
