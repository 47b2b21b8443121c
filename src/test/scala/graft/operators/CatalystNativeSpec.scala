package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExprs

/** Cross-checks for the Catalyst-native fast paths: they must produce
  * exactly the results of the built-ins-only formulations they replace. */
class CatalystNativeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ppmExact survives corpus-scale numerators where int64 ppm wraps, equal in-range") {
    import spark.implicits._
    import graft.functions.TextFunctions.{ppm, ppmExact}
    // 9e12 shared shingles of 1.2e13: num*1e6 = 9e18 < Long.Max barely;
    // push to 9.3e12 where it wraps. Expected values via BigInt.
    val rows = Seq(
      (9300000000000L, 12400000000000L),  // wraps the int64 path
      (5000000000000L, 18000000000000L),  // wraps
      (123456L, 789012L),                 // in-range: both paths equal
      (0L, 5L), (5L, 0L))                 // zero num / zero den
    val df = rows.toDF("num", "den")
    val got = df.select($"num", $"den", ppmExact($"num", $"den").as("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (n, d) =>
      val want = if (d == 0) 0L else (BigInt(n) * 1000000 / BigInt(d)).toLong
      assert(got((n, d)) == want, s"ppmExact($n, $d)")
    }
    // parity with the int64 path across random in-range values
    val rnd = new scala.util.Random(11)
    val inRange = (1 to 200).map(_ => (math.abs(rnd.nextLong()) % 9000000000000L,
      1L + math.abs(rnd.nextLong()) % 9000000000000L)).toDF("num", "den")
    assert(inRange.filter(ppm($"num", $"den") =!= ppmExact($"num", $"den")).count() == 0L)
  }

  test("DotLongArrays == zip_with/aggregate formulation (codegen + interpreted)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextLong() % 1000000L), Seq.fill(64)(rnd.nextLong() % 1000000L))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      VectorExprs.dotQ($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("ref"))
    assert(both.filter($"fast" =!= $"ref").count() == 0L)
  }

  test("DotLongArrays handles nulls and length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L))),
      (None, Some(Seq(1L)))
    ).toDF("a", "b")
    val r = df.select(VectorExprs.dotQ($"a", $"b").as("d")).collect()
    assert(r(0).getLong(0) == 1L * 4 + 2L * 5)
    assert(r(1).isNullAt(0))
  }

  test("ExactIntHistogramAgg == collect_list formulation on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 0 until 13
      _ <- 0 until (5 + rnd.nextInt(400))
    } yield (s"g$g", rnd.nextInt(500).toLong)
    val df = rows.toDF("g", "v")
    val fast = ExactPercentiles.histogram(df, Seq("g"), $"v")
    val ref  = ExactPercentiles.histogramViaCollect(df, Seq("g"), $"v")
    val cols = fast.columns.sorted
    assert(ref.columns.sorted.toSeq == cols.toSeq)
    val f = fast.select(cols.map(col): _*).orderBy("g").collect().map(_.toSeq)
    val r = ref.select(cols.map(col): _*).orderBy("g").collect().map(_.toSeq)
    assert(f.toSeq == r.toSeq)
  }

  test("dot_q is available from SQL via GraftExtensions") {
    // getOrCreate reuses the suite session (built without extensions), so
    // force a fresh SparkSession over the shared SparkContext.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect().head
      assert(r.getLong(0) == 32L)
    } finally {
      prior.foreach { s => SparkSession.setDefaultSession(s); SparkSession.setActiveSession(s) }
    }
  }

  test("relational simhash == column-expression simhash48") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val relational = Dedup.simhashTable(docs, "doc_id", "text")
    val columnar = docs.select($"doc_id".as("doc"), Dedup.simhash48(tokens($"text")).as("sig2"))
    assert(relational.join(columnar, "doc").filter($"sig" =!= $"sig2").count() == 0L)
  }

  test("relational minhash mins == column-expression withMinhashSignature") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val sh = Dedup.withShingles(docs, "text", 3)
      .select($"doc_id".as("doc"), $"shingles").filter(size($"shingles") > 0)
    val columnar = Dedup.withMinhashSignature(sh, 8)
      .select($"doc", $"minhash")
    val ex = Dedup.shingleTable(docs, "doc_id", "text", 3)
      .withColumn("h31", Dedup.hash31($"s"))
    val relational = ex.groupBy($"doc").agg(
      array((0 until 8).map(i =>
        min((lit(Dedup.minhashA(i)) * $"h31" + lit(Dedup.minhashB(i))) % Dedup.MinhashP)): _*).as("mh"))
    assert(columnar.join(relational, "doc").filter($"minhash" =!= $"mh").count() == 0L)
  }

  test("embeddingNearDupPairs finds planted near-duplicate vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Seq[Float] = Seq.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 50).map(i => (i.toLong, vec()))
    // plant near-dups: ids 100+i are tiny perturbations of ids 0..4
    val dups = (0 until 5).map { i =>
      (100L + i, base(i)._2.map(x => x + 0.001f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(df, "vec_id", "embedding",
      minCosPpm = 990000L, nPlanes = 6, dims = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // near-identical vectors land in the same LSH bucket and pass the
    // cosine threshold
    assert((0 until 5).forall(i => pairs.contains((i.toLong, 100L + i))), s"got $pairs")
    assert(pairs.forall { case (a, b) => b - a == 100L })
  }

  test("plane coefficients match the SQL md5 derivation") {
    import spark.implicits._
    val sqlCoefs = spark.range(1).select(
      (0 until 4).flatMap(p => (0 until 4).map(i =>
        (conv(substring(md5(lit(s"plane${p}_$i")), 1, 15), 16, 10).cast("long") % 2001L - 1000L)
          .as(s"c_${p}_$i"))): _*).collect().head
    var k = 0
    for (p <- 0 until 4; i <- 0 until 4) {
      assert(sqlCoefs.getLong(k) == Similarity.planeCoefValue(p, i), s"plane $p dim $i")
      k += 1
    }
  }

  test("log-bucket sketch quantiles bound relative error vs exact") {
    import spark.implicits._
    import graft.agg.{ExactIntHistogramAgg, LogBucketHistogramAgg}
    val rnd = new scala.util.Random(11)
    // skewed latency-like distribution over 5 groups
    val rows = (1 to 20000).map { _ =>
      val g = rnd.nextInt(5)
      val v = math.max(0L, (math.exp(rnd.nextGaussian() * 1.5 + 4)).toLong)
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val exact  = df.groupBy($"g").agg(ExactIntHistogramAgg.column($"v").as("h"))
      .select($"g", $"h.cnt", $"h.mean_v", $"h.median_v", $"h.p95_v").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val approx = df.groupBy($"g").agg(LogBucketHistogramAgg.column($"v").as("h"))
      .select($"g", $"h.cnt", $"h.mean_v", $"h.p50_est", $"h.p95_est").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    exact.foreach { case (g, (n, mean, med, p95)) =>
      val (an, amean, ap50, ap95) = approx(g)
      assert(an == n && amean == mean, s"group $g count/mean must be exact")
      // log2 half-octave buckets: estimate within ~50% relative error
      def close(est: Long, ex: Long) = ex == 0 || (est.toDouble / ex > 0.5 && est.toDouble / ex < 2.0)
      assert(close(ap50, med), s"g=$g p50 est $ap50 vs exact $med")
      assert(close(ap95, p95), s"g=$g p95 est $ap95 vs exact $p95")
    }
  }
}
