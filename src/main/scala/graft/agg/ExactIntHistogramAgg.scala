package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** Single-pass exact-percentile histogram aggregate — the 100 TB-safe
  * replacement for `sort_array(collect_list(...))` (SURVEY.md §2.10, §4).
  *
  * Buffer = value → count map: memory is bounded by DISTINCT values per
  * group (latencies in ms are small integers), not by row count, so a
  * group with billions of rows costs a few KB. Partial maps merge
  * associatively (map-side combine works). The finish step reproduces the
  * reference's exact formulas (`network-latency/processor.go:499-556`)
  * from the sorted (value, count) runs:
  *   mean = sum/count (trunc), median with even-count averaging,
  *   p95/p99 at `int(n * 0.95)` (IEEE-double truncated index),
  *   strict-< bucket counts against the histogram's own percentiles.
  */
final case class HistResult(
    cnt: Long, min_v: Long, max_v: Long, mean_v: Long, median_v: Long,
    p95_v: Long, p99_v: Long, below_p50: Long, p50_to_p95: Long,
    p95_to_p99: Long, above_p99: Long)

object ExactIntHistogramAgg
    extends Aggregator[Long, mutable.HashMap[Long, Long], HistResult] {

  override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[Long, Long], v: Long): mutable.HashMap[Long, Long] = {
    b.update(v, b.getOrElse(v, 0L) + 1L)
    b
  }

  override def merge(a: mutable.HashMap[Long, Long], b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (v, c) => big.update(v, big.getOrElse(v, 0L) + c) }
    big
  }

  override def finish(m: mutable.HashMap[Long, Long]): HistResult = {
    if (m.isEmpty) return HistResult(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val runs = m.toArray.sortBy(_._1) // (value, count) ascending
    val n    = runs.map(_._2).sum
    val sum  = runs.map { case (v, c) => v * c }.sum

    // value at 0-based sorted index
    def at(idx0: Long): Long = {
      var cum = 0L
      var i   = 0
      while (i < runs.length) {
        cum += runs(i)._2
        if (idx0 < cum) return runs(i)._1
        i += 1
      }
      runs.last._1
    }
    // count of values strictly below x / strictly below-or-equal
    def countLt(x: Long): Long = runs.iterator.takeWhile(_._1 < x).map(_._2).sum

    val median =
      if (n % 2 == 0) (at(n / 2 - 1) + at(n / 2)) / 2
      else at(n / 2)
    val p95 = at(math.floor(n.toDouble * 0.95d).toLong)
    val p99 = at(math.floor(n.toDouble * 0.99d).toLong)

    val belowP50 = countLt(median)
    val belowP95 = countLt(p95)
    val belowP99 = countLt(p99)
    HistResult(
      cnt = n, min_v = runs.head._1, max_v = runs.last._1,
      mean_v = sum / n, median_v = median, p95_v = p95, p99_v = p99,
      below_p50 = belowP50,
      p50_to_p95 = belowP95 - belowP50,
      p95_to_p99 = belowP99 - belowP95,
      above_p99 = n - belowP99)
  }

  override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] =
    Encoders.kryo[mutable.HashMap[Long, Long]]
  override def outputEncoder: Encoder[HistResult] = Encoders.product[HistResult]

  /** Column form: groupBy(...).agg(ExactIntHistogramAgg.column(col)). */
  def column(c: Column): Column = udaf(ExactIntHistogramAgg, Encoders.scalaLong).apply(c)
}
