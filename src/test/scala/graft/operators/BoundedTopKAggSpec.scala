package graft.operators

import graft.agg.{BoundedTopKAgg, BoundedTopKCosAgg, CosEntry, TopKEntry}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** The streaming-state contract of [[graft.agg.BoundedTopKAgg]]
  * (VERDICT r8 item 2): the buffer NEVER exceeds k entries at any point
  * in reduce/merge — so per-(window, query) streaming state is O(k), not
  * O(candidates) — while the finished ranking is exactly
  * sort-everything-take-k in (adist2, cand_id, cell) order. Exercised
  * directly on the Aggregator (no Spark session needed). */
class BoundedTopKAggSpec extends AnyFunSuite {

  private val ord: Ordering[TopKEntry] = Ordering.by(e => (e.adist2, e.cand_id, e.cell))

  private def entries(n: Int, seed: Long): Seq[TopKEntry] = {
    val rnd = new Random(seed)
    // small adist2 domain → plenty of ties, exercising the cand_id tie-break
    Seq.fill(n)(TopKEntry(rnd.nextInt(50).toLong, rnd.nextLong().abs % 100000, rnd.nextInt(8).toLong))
  }

  test("buffer never exceeds k entries at any step of reduce") {
    val k = 7
    val agg = BoundedTopKAgg(k)
    var buf = agg.zero
    for (e <- entries(5000, seed = 1)) {
      buf = agg.reduce(buf, e)
      assert(buf.length <= k, s"buffer grew to ${buf.length} > k=$k")
    }
    assert(buf.length == k)
  }

  test("finish equals sort-everything-take-k, including ties") {
    for (seed <- 1L to 5L; k <- Seq(1, 3, 10, 100)) {
      val in  = entries(1200, seed)
      val agg = BoundedTopKAgg(k)
      val got = agg.finish(in.foldLeft(agg.zero)(agg.reduce)).rows
      val expected = in.sorted(ord).take(k)
      assert(got == expected, s"seed=$seed k=$k")
    }
  }

  test("merge of partial buffers is exact and stays bounded") {
    val k = 9
    val agg = BoundedTopKAgg(k)
    val in  = entries(3000, seed = 42)
    // simulate map-side partials: reduce disjoint slices, then merge pairwise
    val partials = in.grouped(250).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    partials.foreach(p => assert(p.length <= k))
    val merged = partials.reduce { (a, b) =>
      val m = agg.merge(a, b)
      assert(m.length <= k, s"merged buffer ${m.length} > k=$k")
      m
    }
    assert(agg.finish(merged).rows == in.sorted(ord).take(k))
  }

  test("fewer than k inputs returns all of them, sorted") {
    val agg = BoundedTopKAgg(10)
    val in  = entries(4, seed = 7)
    assert(agg.finish(in.foldLeft(agg.zero)(agg.reduce)).rows == in.sorted(ord))
    assert(agg.finish(agg.zero).rows.isEmpty)
  }

  // ------------------------------------------------- cosine (max-k) form

  private def cosEntries(n: Int, seed: Long): Seq[CosEntry] = {
    val rnd = new Random(seed)
    Seq.fill(n)(CosEntry(
      (rnd.nextInt(21) - 10) / 10.0, // coarse grid → ties
      rnd.nextLong().abs % 100000, rnd.nextLong() % 1000))
  }

  /** The window formulation's comparator: cos DESC with NaN FIRST (Spark
    * orders NaN as largest), then cand_id ASC, then dot (the totality
    * tie-break; never decisive when cand_id is unique per group). */
  private val cosOrd: Ordering[CosEntry] = new Ordering[CosEntry] {
    def compare(x: CosEntry, y: CosEntry): Int = {
      val c = java.lang.Double.compare(y.cos, x.cos)
      if (c != 0) c else {
        val c2 = java.lang.Long.compare(x.cand_id, y.cand_id)
        if (c2 != 0) c2 else java.lang.Long.compare(x.dot, y.dot)
      }
    }
  }

  test("cos aggregate: bounded buffer, sort-take-k parity incl. ties") {
    for (seed <- 1L to 4L; k <- Seq(1, 5, 64)) {
      val in  = cosEntries(800, seed)
      val agg = BoundedTopKCosAgg(k)
      var buf = agg.zero
      for (e <- in) {
        buf = agg.reduce(buf, e)
        assert(buf.length <= k)
      }
      assert(agg.finish(buf).rows == in.sorted(cosOrd).take(k), s"seed=$seed k=$k")
    }
  }

  test("cos aggregate: NaN cosine ranks FIRST, like the desc rank window") {
    val agg = BoundedTopKCosAgg(3)
    val in = Seq(
      CosEntry(0.9, 1L, 10L), CosEntry(Double.NaN, 2L, 0L),
      CosEntry(-0.5, 3L, -5L), CosEntry(Double.NaN, 4L, 0L), CosEntry(1.0, 5L, 20L))
    val got = agg.finish(in.foldLeft(agg.zero)(agg.reduce)).rows
    // NaN entries first (tie-broken by cand_id), then 1.0, and 0.9 is cut
    // (compare by field: NaN != NaN under case-class ==)
    assert(got.map(_.cand_id) == Seq(2L, 4L, 5L))
    assert(got(0).cos.isNaN && got(1).cos.isNaN && got(2).cos == 1.0)
  }

  test("cos aggregate: partial merges stay bounded and exact") {
    val k = 7
    val agg = BoundedTopKCosAgg(k)
    val in  = cosEntries(2000, seed = 9)
    val partials = in.grouped(111).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = partials.reduce { (a, b) =>
      val m = agg.merge(a, b); assert(m.length <= k); m
    }
    assert(agg.finish(merged).rows == in.sorted(cosOrd).take(k))
  }

  // ------------------------------------ native (hot-path) implementation

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("NativeTopK.minK == reference BoundedTopKAgg on random grouped data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(21)
    // many groups, heavy ties, several partitions → partial-merge path
    val rows = Seq.fill(20000)((rnd.nextInt(40).toLong,
      rnd.nextInt(30).toLong, rnd.nextLong().abs % 5000, rnd.nextInt(8).toLong))
    val df = rows.toDF("g", "adist2", "cand_id", "cell").repartition(7)
    for (k <- Seq(1, 4, 50)) {
      val native = df.groupBy($"g")
        .agg(graft.agg.NativeTopK.minK(k, $"adist2", $"cand_id", $"cell").as("topk"))
        .select($"g", posexplode($"topk").as(Seq("r0", "e")))
        .select($"g", $"r0", $"e.adist2", $"e.cand_id", $"e.cell")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val reference = df.groupBy($"g")
        .agg(BoundedTopKAgg.column(k, $"adist2", $"cand_id", $"cell").as("topk"))
        .select($"g", posexplode($"topk.rows").as(Seq("r0", "e")))
        .select($"g", $"r0", $"e.adist2", $"e.cand_id", $"e.cell")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(native == reference, s"k=$k")
    }
  }

  test("NativeTopK.maxCosK == reference BoundedTopKCosAgg, NaN included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(22)
    val rows = Seq.fill(8000)((rnd.nextInt(20).toLong,
      if (rnd.nextInt(50) == 0) Double.NaN else (rnd.nextInt(41) - 20) / 20.0,
      rnd.nextLong().abs % 3000, rnd.nextLong() % 100))
    val df = rows.toDF("g", "cos", "cand_id", "dot").repartition(5)
    def collectSet(out: org.apache.spark.sql.DataFrame) =
      out.collect().map { r =>
        // NaN-safe comparison: carry cos as ordered bits
        (r.getLong(0), r.getInt(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3), r.getLong(4))
      }.toSet
    for (k <- Seq(1, 6)) {
      val native = collectSet(df.groupBy($"g")
        .agg(graft.agg.NativeTopK.maxCosK(k, $"cos", $"cand_id", $"dot").as("topk"))
        .select($"g", posexplode($"topk").as(Seq("r0", "e")))
        .select($"g", $"r0", $"e.cos", $"e.cand_id", $"e.dot"))
      val reference = collectSet(df.groupBy($"g")
        .agg(BoundedTopKCosAgg.column(k, $"cos", $"cand_id", $"dot").as("topk"))
        .select($"g", posexplode($"topk.rows").as(Seq("r0", "e")))
        .select($"g", $"r0", $"e.cos", $"e.cand_id", $"e.dot"))
      assert(native == reference, s"k=$k")
    }
  }
}
