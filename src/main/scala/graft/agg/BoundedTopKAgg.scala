package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** One ANN candidate in ADC-distance rank order: sorting `TopKEntry`s
  * ascending is exactly sorting `struct(adist2, cand_id, cell)` ascending
  * (lexicographic on fields), the [[graft.operators.Similarity]] ranking
  * contract (adist2 ASC, cand_id ASC; cand_id is unique per query so the
  * cell field never actually breaks a tie). */
final case class TopKEntry(adist2: Long, cand_id: Long, cell: Long)

/** Wrapper row so the aggregate's output has a public-API encoder; the
  * ranked list is `col("...").getField("rows")`. */
final case class TopKRows(rows: Seq[TopKEntry])

/** Bounded min-k aggregate — the state-safe replacement for
  * `slice(sort_array(collect_list(struct(...))), 1, k)` in streaming
  * top-k ([[graft.operators.AnnIndex.probeStream]]).
  *
  * `collect_list` keeps EVERY candidate in the aggregation buffer until
  * the window closes — per (window, query) that is O(candidates in the
  * probed cells), ~244k structs per query at 1e9 vectors / 4096 cells.
  * This buffer holds AT MOST k entries at every point in its lifecycle
  * (insert evicts the current maximum first when full), so streaming
  * state is O(k) per (window, query) regardless of cell size, and
  * partial buffers merge associatively (map-side combine works).
  *
  * The buffer is kept sorted ascending; insertion is O(k) per row —
  * k is single-digit-to-hundreds in ANN serving, so this beats heap
  * constant factors and makes `finish` a no-op copy. Emitted order is
  * identical to the sort-the-full-list formulation on the same input.
  */
final case class BoundedTopKAgg(k: Int)
    extends Aggregator[TopKEntry, mutable.ArrayBuffer[TopKEntry], TopKRows] {
  require(k > 0, s"BoundedTopKAgg: k must be positive, got $k")

  private val ord: Ordering[TopKEntry] =
    Ordering.by(e => (e.adist2, e.cand_id, e.cell))

  override def zero: mutable.ArrayBuffer[TopKEntry] = mutable.ArrayBuffer.empty

  override def reduce(b: mutable.ArrayBuffer[TopKEntry], v: TopKEntry): mutable.ArrayBuffer[TopKEntry] = {
    if (b.length < k || ord.lt(v, b.last)) {
      // insertion point: first index with an element strictly greater
      var i = b.length
      while (i > 0 && ord.gt(b(i - 1), v)) i -= 1
      b.insert(i, v)
      if (b.length > k) b.remove(b.length - 1)
    }
    b
  }

  override def merge(a: mutable.ArrayBuffer[TopKEntry], b: mutable.ArrayBuffer[TopKEntry]): mutable.ArrayBuffer[TopKEntry] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    small.foldLeft(big)(reduce)
  }

  override def finish(b: mutable.ArrayBuffer[TopKEntry]): TopKRows = TopKRows(b.toSeq)

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[TopKEntry]] =
    Encoders.kryo[mutable.ArrayBuffer[TopKEntry]]
  override def outputEncoder: Encoder[TopKRows] = Encoders.product[TopKRows]
}

object BoundedTopKAgg {
  /** Column form: `groupBy(...).agg(BoundedTopKAgg.column(k, adist2, candId, cell))`;
    * the ranked ascending list is the result's `rows` field. */
  def column(k: Int, adist2: Column, candId: Column, cell: Column): Column =
    udaf(BoundedTopKAgg(k), Encoders.product[TopKEntry]).apply(adist2, candId, cell)
}

/** One cosine-ranked candidate ([[BoundedTopKCosAgg]]): ranking is cos
  * DESC (NaN first — `java.lang.Double.compare` treats NaN as largest,
  * exactly Spark's `orderBy(desc)` window semantics, so a zero-norm
  * vector's NaN cosine ranks identically in both formulations), then
  * cand_id ASC. `dot` rides along for the output projection. */
final case class CosEntry(cos: Double, cand_id: Long, dot: Long)
final case class CosRows(rows: Seq[CosEntry])

/** [[BoundedTopKAgg]]'s ordering flipped for similarity search: bounded
  * max-k by cosine. Replaces the rank-window formulation of exact
  * brute-force KNN ([[graft.operators.Similarity.bruteForceTopK]]): the
  * window shuffles and SORTS all |Q|·|C| scored rows to rank them; this
  * aggregate combines map-side (each partition ships at most k entries
  * per query), so shuffle traffic is |Q|·k·partitions and nothing is
  * ever globally sorted — the difference between exact KNN being a
  * baseline and being runnable over the full corpus. */
final case class BoundedTopKCosAgg(k: Int)
    extends Aggregator[CosEntry, mutable.ArrayBuffer[CosEntry], CosRows] {
  require(k > 0, s"BoundedTopKCosAgg: k must be positive, got $k")

  private val ord: Ordering[CosEntry] = new Ordering[CosEntry] {
    def compare(x: CosEntry, y: CosEntry): Int = {
      // cos DESC with NaN largest-first, then cand_id ASC, then dot —
      // the final field makes the ordering total over full entries
      // (cand_id is unique per group in real rankings, so dot never
      // actually decides; it keeps tie behavior deterministic)
      val c = java.lang.Double.compare(y.cos, x.cos)
      if (c != 0) c else {
        val c2 = java.lang.Long.compare(x.cand_id, y.cand_id)
        if (c2 != 0) c2 else java.lang.Long.compare(x.dot, y.dot)
      }
    }
  }

  override def zero: mutable.ArrayBuffer[CosEntry] = mutable.ArrayBuffer.empty

  override def reduce(b: mutable.ArrayBuffer[CosEntry], v: CosEntry): mutable.ArrayBuffer[CosEntry] = {
    if (b.length < k || ord.lt(v, b.last)) {
      var i = b.length
      while (i > 0 && ord.gt(b(i - 1), v)) i -= 1
      b.insert(i, v)
      if (b.length > k) b.remove(b.length - 1)
    }
    b
  }

  override def merge(a: mutable.ArrayBuffer[CosEntry], b: mutable.ArrayBuffer[CosEntry]): mutable.ArrayBuffer[CosEntry] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    small.foldLeft(big)(reduce)
  }

  override def finish(b: mutable.ArrayBuffer[CosEntry]): CosRows = CosRows(b.toSeq)

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[CosEntry]] =
    Encoders.kryo[mutable.ArrayBuffer[CosEntry]]
  override def outputEncoder: Encoder[CosRows] = Encoders.product[CosRows]
}

object BoundedTopKCosAgg {
  /** Column form; the rank-ordered (cos DESC, cand_id ASC) list is the
    * result's `rows` field. */
  def column(k: Int, cos: Column, candId: Column, dot: Column): Column =
    udaf(BoundedTopKCosAgg(k), Encoders.product[CosEntry]).apply(cos, candId, dot)
}
