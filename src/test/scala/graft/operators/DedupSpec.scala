package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operator semantics: connected-component clustering and the
  * lossless-ness of the AllPairs prefix filter. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("connectedComponents labels every vertex with its component min id") {
    import spark.implicits._
    // two chains and an isolated pair: {1,2,3,4} via 1-2,2-3,3-4; {7,9}
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (9L, 7L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(pairs, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nV = 30 + trial * 10
      val pairs = Seq.fill(40)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.connectedComponents(pairs.toDF("d1", "d2"), "d1", "d2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val roots = verts.map(v => v -> find(v)).toMap
      val minOfRoot = verts.groupBy(roots).map { case (r, vs) => r -> vs.min }
      val want = verts.map(v => v -> minOfRoot(roots(v))).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("connectedComponents runs ONE job per round - convergence rides the checkpoint") {
    import spark.implicits._
    // single edge: round 1 propagates (metric unread by design), round 2
    // observes zero changes and converges -> exactly 2 setup jobs (edges +
    // initial labels checkpoints) + 2 round jobs. A separate convergence
    // count job per round (the pre-observe() design) would make it >= 6.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBjt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // 1 action = 1 job
    // broadcast builds run as their own jobs and would pollute the count
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.addSparkListener(listener)
    try {
      val labels = Dedup.connectedComponents(Seq((2L, 1L)).toDF("d1", "d2"), "d1", "d2")
      // listener events are posted asynchronously: poll until the count
      // is quiet (all CC jobs have already finished at this point)
      var last = -1
      var waited = 0
      while (jobs.get != last && waited < 5000) {
        last = jobs.get; Thread.sleep(200); waited += 200
      }
      val during = jobs.get
      assert(during == 4, s"expected 4 jobs (2 setup + 2 rounds), saw $during")
      assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 1L, 2L -> 1L))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBjt)
    }
  }

  test("connectedComponentsStars: parity with label propagation across graph shapes") {
    import spark.implicits._
    // deep chain (worst case for naive propagation), star, two blobs,
    // self-loops, and an isolated pair - plus random graphs below
    val chain = (1L until 40L).map(i => (i + 1, i))
    val star = (101L to 110L).map(i => (i, 100L))
    val fixed = chain ++ star ++ Seq((200L, 201L), (201L, 202L), (202L, 200L),
      (300L, 300L), (301L, 302L))
    val want = Dedup.connectedComponents(fixed.toDF("d1", "d2"), "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.connectedComponentsStars(fixed.toDF("d1", "d2"), "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)

    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nV = 40 + trial * 20
      val pairs = Seq.fill(60)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val wantR = Dedup.connectedComponents(pairs.toDF("d1", "d2"), "d1", "d2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotR = Dedup.connectedComponentsStars(pairs.toDF("d1", "d2"), "d1", "d2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotR == wantR, s"trial $trial")
    }
  }

  test("connectedComponentsStars: exhausting maxIter fails loudly, never partial labels") {
    import spark.implicits._
    val chain = (1L until 200L).map(i => (i + 1, i))
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponentsStars(chain.toDF("d1", "d2"), "d1", "d2", maxIter = 1)
        .collect()
    }
    assert(e.getMessage.contains("no convergence"))
  }

  test("minhashLshPairs over a parquet-round-tripped sketch equals the direct path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "a completely different sentence with nothing shared at all here"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "some other text that shares the quick brown fox only briefly")
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val direct = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, k = 16, bandSize = 4, minJaccardPpm = 500000L).collect().map(key).toSet
    val out = java.nio.file.Files.createTempDirectory("dedup-sig-rt").resolve("sigs").toString
    Dedup.minhashSigTable(docs, "doc_id", "text", n = 3, k = 16)
      .write.mode("overwrite").parquet(out)
    val fromSig = Dedup.minhashLshPairsFromSig(spark.read.parquet(out),
      k = 16, bandSize = 4, minJaccardPpm = 500000L).collect().map(key).toSet
    assert(direct.nonEmpty)
    assert(fromSig == direct)
  }

  test("incremental matching == the cross-set slice of full-corpus pairing") {
    import spark.implicits._
    // batch ∪ corpus pairing decomposes exactly: full pairs = within-batch
    // pairs + within-corpus pairs + cross matches; the incremental
    // operator must produce precisely the cross slice
    val rnd = new scala.util.Random(5)
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a completely different sentence with nothing shared at all here",
      "pack my box with five dozen liquor jugs right now please")
    val docs = (0L until 40L).map { i =>
      val t = base(rnd.nextInt(3))
      (i, if (rnd.nextBoolean()) t else t + s" tail${rnd.nextInt(2)}")
    }.toDF("doc_id", "text")
    val sig = Dedup.minhashSigTable(docs, "doc_id", "text", n = 3, k = 16)
      .localCheckpoint()
    val newSig = sig.filter($"doc" % 5 === 0)
    val oldSig = sig.filter($"doc" % 5 =!= 0)
    val got = Dedup.minhashMatchesAgainst(newSig, oldSig,
        k = 16, bandSize = 4, minJaccardPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val full = Dedup.minhashLshPairsFromSig(sig, k = 16, bandSize = 4,
        minJaccardPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = full.flatMap { case (d1, d2, nb, sh, j) =>
      // orient each cross pair as (new, old) regardless of id order
      if (d1 % 5 == 0 && d2 % 5 != 0) Some((d1, d2, nb, sh, j))
      else if (d2 % 5 == 0 && d1 % 5 != 0) Some((d2, d1, nb, sh, j))
      else None
    }.toSet
    assert(want.nonEmpty, "fixture must produce cross-set near-dups")
    assert(got == want)
  }

  test("prefix-filtered jaccard equals brute-force jaccard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "a completely different sentence with nothing shared at all here"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "some other text that shares the quick brown fox only briefly")
    ).toDF("doc_id", "text")

    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccardPpm = 500000L)
      .select("d1", "d2", "jaccard_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute force over all pairs
    import graft.functions.TextFunctions._
    def shingles(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val m = docs.collect().map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val want = (for {
      a <- m.keys; b <- m.keys if a < b
      inter = (m(a) & m(b)).size
      j = inter.toLong * 1000000L / (m(a).size + m(b).size - inter)
      if j >= 500000L
    } yield (a, b, j)).toSet
    assert(got == want)
    assert(want.nonEmpty) // the fixture must actually exercise the path
  }
}
