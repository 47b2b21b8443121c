package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Constant-memory approximate quantile sketch — the extreme-scale
  * companion to [[ExactIntHistogramAgg]] (SURVEY.md §7.4-4: at 100 TB,
  * keep exact value→count maps only while their domain is small, and a
  * bounded sketch otherwise).
  *
  * Buffer = 128 fixed log2-scale buckets (2 sub-buckets per octave over
  * [0, 2^63)): each nonnegative value lands in a bucket whose bounds are
  * within ~41% of the value, so any quantile estimate (bucket midpoint)
  * carries bounded relative error regardless of row count or distinct
  * count. Merge is element-wise array addition — associative, map-side
  * combinable, and a fixed 1 KB per group no matter what the data does.
  * Deterministic (no sampling), unlike t-digest's ordering-sensitive
  * centroids — same input multiset, same sketch, on any cluster.
  */
final case class ApproxHistResult(
    cnt: Long, min_v: Long, max_v: Long, mean_v: Long,
    p50_est: Long, p95_est: Long, p99_est: Long)

object LogBucketHistogramAgg
    extends Aggregator[Long, Array[Long], ApproxHistResult] {

  val NumBuckets = 128

  /** Bucket index: 2 sub-buckets per power of two; values < 1 in bucket 0. */
  def bucketOf(v: Long): Int = {
    if (v <= 0) return 0
    val octave = 63 - java.lang.Long.numberOfLeadingZeros(v) // floor(log2 v)
    val half   = if (octave >= 1 && (v >> (octave - 1) & 1L) == 1L) 1 else 0
    math.min(NumBuckets - 1, 1 + octave * 2 + half)
  }

  /** Midpoint of a bucket's value range (estimate returned for quantiles).
    * Index 127 saturates to bucket 126's midpoint: `bucketOf` never emits
    * 127 for a positive long (max octave 62 → index 126), and computing
    * its literal midpoint would need `1L << 63`, which overflows to
    * Long.MinValue — saturation keeps every reachable and fallback path
    * (the NumBuckets-1 references in bucketOf/quantileEst) positive. */
  def bucketMid(rawIdx: Int): Long = {
    val idx = math.min(rawIdx, NumBuckets - 2)
    if (idx == 0) return 0L
    val octave = (idx - 1) / 2
    val half   = (idx - 1) % 2
    val lo     = (1L << octave) + (if (half == 1) (1L << octave) / 2 else 0L)
    val width  = math.max(1L, (1L << octave) / 2)
    lo + width / 2
  }

  // slots: [0..NumBuckets) counts, then cnt, sum, min, max
  private val Cnt = NumBuckets
  private val Sum = NumBuckets + 1
  private val Min = NumBuckets + 2
  private val Max = NumBuckets + 3

  override def zero: Array[Long] = {
    val a = new Array[Long](NumBuckets + 4)
    a(Min) = Long.MaxValue
    a(Max) = Long.MinValue
    a
  }

  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    b(bucketOf(v)) += 1
    b(Cnt) += 1
    b(Sum) += v
    if (v < b(Min)) b(Min) = v
    if (v > b(Max)) b(Max) = v
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumBuckets) { a(i) += b(i); i += 1 }
    a(Cnt) += b(Cnt)
    a(Sum) += b(Sum)
    if (b(Min) < a(Min)) a(Min) = b(Min)
    if (b(Max) > a(Max)) a(Max) = b(Max)
    a
  }

  override def finish(b: Array[Long]): ApproxHistResult = {
    val n = b(Cnt)
    if (n == 0) return ApproxHistResult(0, 0, 0, 0, 0, 0, 0)
    def quantileEst(idx0: Long): Long = {
      var cum = 0L
      var i   = 0
      while (i < NumBuckets) {
        cum += b(i)
        if (idx0 < cum) return bucketMid(i)
        i += 1
      }
      bucketMid(NumBuckets - 1)
    }
    ApproxHistResult(
      cnt = n, min_v = b(Min), max_v = b(Max), mean_v = b(Sum) / n,
      p50_est = quantileEst(n / 2),
      p95_est = quantileEst((n.toDouble * 0.95).toLong),
      p99_est = quantileEst((n.toDouble * 0.99).toLong))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[ApproxHistResult] = Encoders.product[ApproxHistResult]

  def column(c: Column): Column = udaf(this).apply(c)
}
