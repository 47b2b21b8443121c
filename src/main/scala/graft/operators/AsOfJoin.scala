package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** General as-of join: attach to each left row the single nearest right row
  * at-or-before (backward) / at-or-after (forward) its event time, per key —
  * the generalization of the reference's "look up the step start for this
  * timeout" machines (`ossplugins/timeout-analysis/processor.go:141-160`,
  * re-expressed for J6 in [[graft.cometbft.Analytics]]) into a reusable
  * relational operator.
  *
  * == Spark-first plan ==
  * Spark has no ASOF JOIN; the naive encoding (`l JOIN r ON l.k = r.k AND
  * r.ts <= l.ts` + max-per-left) is an equi-join whose inequality conjunct
  * only FILTERS, so each left row pairs with EVERY earlier right row of its
  * key before the argmax — O(|L|·|R|/keys) intermediate. This operator
  * instead UNIONS the two sides, tagged, and resolves each left row with one
  * per-key sorted window (`last(right_payload, ignoreNulls)` over the rows
  * up to the current one): one shuffle on the keys shared by both sides, one
  * sort, ZERO join — the same shape DuckDB/Pandas(`merge_asof`) use, and the
  * shape that survives 100 TB because the intermediate never exceeds
  * |L| + |R| rows.
  *
  * Scale notes: the keys shuffle co-partitions both sides in a single
  * exchange; per-key data is streamed by the sort, never buffered whole
  * (window frame is running `last`, not unbounded collect). A key hot enough
  * to bottleneck one task is the same skew the pairing machines document —
  * windows can't be salted without breaking cross-row visibility, so extreme
  * skew calls for splitting the left by time range instead.
  *
  * == Determinism ==
  * Ties among right rows at the same (key, ts) are resolved by `tiebreak`
  * columns (greatest wins); callers wanting oracle-stable output should make
  * the right side unique per (key, ts) or pass a total-order tiebreak.
  */
object AsOfJoin {

  /** Backward as-of: nearest right row with `rightTs <= leftTs`
    * (strict: `<`). See [[asof]]. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      strict: Boolean = false,
      tolerance: Option[Long] = None,
      joinType: String = "inner",
      tiebreak: Seq[String] = Nil
  ): DataFrame = asof(left, right, keys, leftTs, rightTs, forward = false, strict, tolerance, joinType, tiebreak)

  /** Forward as-of: nearest right row with `rightTs >= leftTs`
    * (strict: `>`). See [[asof]]. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      strict: Boolean = false,
      tolerance: Option[Long] = None,
      joinType: String = "inner",
      tiebreak: Seq[String] = Nil
  ): DataFrame = asof(left, right, keys, leftTs, rightTs, forward = true, strict, tolerance, joinType, tiebreak)

  /** @param keys      equi-join key columns present on both sides
    * @param leftTs    left event-time column (numeric or timestamp; same
    *                  type as `rightTs`)
    * @param rightTs   right event-time column; emitted in the output under
    *                  its own name
    * @param forward   false = nearest earlier right row; true = nearest later
    * @param strict    exclude right rows at exactly the left timestamp
    * @param tolerance max |leftTs - rightTs| (same unit as the ts columns);
    *                  farther matches are treated as no-match
    * @param joinType  "inner" drops unmatched left rows; "left" keeps them
    *                  with null right columns
    * @param tiebreak  right-side columns ordering equal-ts right rows;
    *                  the greatest tuple wins
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      forward: Boolean,
      strict: Boolean,
      tolerance: Option[Long],
      joinType: String,
      tiebreak: Seq[String]
  ): DataFrame = {
    IntervalJoin.requireNoReserved(left, "left"); IntervalJoin.requireNoReserved(right, "right")
    asofUnchecked(left, right, keys, leftTs, rightTs, forward, strict, tolerance, joinType, tiebreak)
  }

  /** [[asof]] body without the reserved-prefix validation — the chunked
    * variants re-enter here with their own (validated-at-entry) frames
    * that legitimately carry `__chunk` working columns. */
  private def asofUnchecked(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      forward: Boolean,
      strict: Boolean,
      tolerance: Option[Long],
      joinType: String,
      tiebreak: Seq[String]
  ): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"joinType must be inner|left, got $joinType")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val overlap     = left.columns.filterNot(keys.contains).toSet.intersect(payloadCols.toSet)
    require(overlap.isEmpty, s"non-key columns must be disjoint, both sides have: ${overlap.mkString(",")}")
    require(tiebreak.forall(payloadCols.contains), "tiebreak columns must be right-side payload columns")

    // Inclusive: rights at the left's exact ts must be visible to it → right
    // sorts before left within a ts group. Strict: after.
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)

    // Null right timestamps would sort first under asc (Spark nulls-first)
    // and masquerade as "earliest" matches — an as-of against an unknown
    // time is meaningless, so they are dropped up front. Null LEFT
    // timestamps match nothing (kept, with null rights, under "left").
    val r = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(rightOrd).as("__side"),
        struct(payloadCols.map(col): _*).as("__r")
      ) ++ tiebreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*
    )
    val rStructType = r.schema("__r").dataType
    val l = left.select(
      left.columns.toSeq.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(leftOrd).as("__side"),
        lit(null).cast(rStructType).as("__r")
      ) ++ tiebreak.indices.map(i => lit(null).cast(r.schema(s"__tb$i").dataType).as(s"__tb$i")): _*
    )

    val tsOrd  = if (forward) col("__ts").desc else col("__ts").asc
    // Tiebreak ascending → the LAST equal-ts right row in frame order is the
    // greatest tuple, in both directions.
    val ord    = Seq(tsOrd, col("__side").asc) ++ tiebreak.indices.map(i => col(s"__tb$i").asc)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = l.unionByName(r.select(
      keys.map(col) ++ Seq(col("__ts"), col("__side"), col("__r")) ++
        tiebreak.indices.map(i => col(s"__tb$i")) ++
        left.columns.filterNot(c => keys.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*))
      .withColumn("__m", when(col("__ts").isNotNull, last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__side") === leftOrd)

    val withTol = tolerance match {
      case Some(tol) =>
        val dist = if (forward) col("__m")(rightTs) - col("__ts") else col("__ts") - col("__m")(rightTs)
        matchedRaw.withColumn("__m", when(dist <= tol, col("__m")))
      case None => matchedRaw
    }
    val unpacked = withTol.select(
      left.columns.toSeq.map(col) ++ payloadCols.map(c => col("__m")(c).as(c)): _*
    )
    if (joinType == "inner") unpacked.filter(col(rightTs).isNotNull) else unpacked
  }

  /** Hot-key-proof backward as-of: identical results to [[backward]], but
    * the per-key window is split into fixed-width TIME CHUNKS so even a
    * single key parallelizes across tasks — the mitigation the plain
    * operator's scaladoc prescribes for keys too hot for one sort task.
    *
    * Three-stage plan, all narrow or chunk-granular:
    *  1. per-(key, chunk) LAST right row — a plain aggregate (`max_by`),
    *     map-side combined; because chunks partition time, the chunk's own
    *     max IS the key's snapshot at chunk end;
    *  2. each left chunk seeds from the latest EARLIER-chunk snapshot —
    *     a recursive [[asof]] at CHUNK granularity (strict, so in-chunk
    *     rights aren't double-counted), over ≤ |keys×chunks| rows;
    *  3. the per-(key, CHUNK) window resolves in-chunk: seeds enter as
    *     right rows (their true ts is below every in-chunk ts by
    *     construction), then the same running-`last` as [[backward]].
    *
    * Every stage partitions on (key, chunk) except the chunk-level seed
    * as-of, whose per-key volume is #chunks, not #events. Pick
    * `chunkWidth` so a chunk of the hottest key fits one task
    * comfortably; results are width-invariant (spec-pinned). */
  def backwardChunked(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      chunkWidth: Long,
      strict: Boolean = false,
      tolerance: Option[Long] = None,
      joinType: String = "inner",
      tiebreak: Seq[String] = Nil
  ): DataFrame = {
    IntervalJoin.requireWidth(chunkWidth, "chunkWidth")
    require(Seq("inner", "left").contains(joinType), s"joinType must be inner|left, got $joinType")
    IntervalJoin.requireNoReserved(left, "left"); IntervalJoin.requireNoReserved(right, "right")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val overlap     = left.columns.filterNot(keys.contains).toSet.intersect(payloadCols.toSet)
    require(overlap.isEmpty, s"non-key columns must be disjoint, both sides have: ${overlap.mkString(",")}")
    require(tiebreak.forall(payloadCols.contains), "tiebreak columns must be right-side payload columns")

    val rc = right.filter(col(rightTs).isNotNull)
      .withColumn("__chunk", IntervalJoin.floorDiv(rightTs, chunkWidth))
    // 1. Snapshot at end of each right chunk: the chunk's max-(ts, tiebreak)
    //    row. Deterministic under the same contract as the window ordering.
    val ordStruct = struct((col(rightTs) +: tiebreak.map(col)): _*)
    val chunkLast = rc.groupBy((keys.map(col) :+ col("__chunk")): _*)
      .agg(max_by(struct(payloadCols.map(col): _*), ordStruct).as("__snap"))

    val lc = left.withColumn("__chunk", IntervalJoin.floorDiv(leftTs, chunkWidth))

    // 2. Seed each populated left chunk from the latest strictly-earlier
    //    right chunk (in-chunk rights are stage 3's job).
    val leftChunks = lc.select((keys.map(col) :+ col("__chunk")): _*).distinct()
    val seeds = asofUnchecked(
      leftChunks,
      chunkLast.withColumnRenamed("__chunk", "__rchunk"),
      keys, "__chunk", "__rchunk",
      forward = false, strict = true, tolerance = None, joinType = "inner", tiebreak = Nil)

    // 3. Per-(key, chunk) resolution — the [[asof]] union+window with the
    //    chunk added to the partition key and seeds injected as rights.
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)
    val partCols = keys :+ "__chunk"
    val rPart = rc.select(
      partCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(rightOrd).as("__side"),
        struct(payloadCols.map(col): _*).as("__r")
      ) ++ tiebreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)
    val rStructType = rPart.schema("__r").dataType
    val seedPart = seeds.select(
      partCols.map(col) ++ Seq(
        col("__snap")(rightTs).as("__ts"), lit(rightOrd).as("__side"),
        col("__snap").cast(rStructType).as("__r")
      ) ++ tiebreak.zipWithIndex.map { case (c, i) => col("__snap")(c).as(s"__tb$i") }: _*)
    val lPart = lc.select(
      lc.columns.toSeq.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(leftOrd).as("__side"),
        lit(null).cast(rStructType).as("__r")
      ) ++ tiebreak.indices.map(i => lit(null).cast(rPart.schema(s"__tb$i").dataType).as(s"__tb$i")): _*)

    val ord = Seq(col("__ts").asc, col("__side").asc) ++ tiebreak.indices.map(i => col(s"__tb$i").asc)
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val nullLeftCols = left.columns.filterNot(keys.contains)
      .map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val unioned = lPart
      .unionByName(rPart.select(
        partCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__r")) ++
          tiebreak.indices.map(i => col(s"__tb$i")) ++ nullLeftCols: _*))
      .unionByName(seedPart.select(
        partCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__r")) ++
          tiebreak.indices.map(i => col(s"__tb$i")) ++ nullLeftCols: _*))

    val matchedRaw = unioned
      .withColumn("__m", when(col("__ts").isNotNull, last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__side") === leftOrd)
    val withTol = tolerance match {
      case Some(tol) =>
        matchedRaw.withColumn("__m", when(col("__ts") - col("__m")(rightTs) <= tol, col("__m")))
      case None => matchedRaw
    }
    val unpacked = withTol.select(
      left.columns.toSeq.map(col) ++ payloadCols.map(c => col("__m")(c).as(c)): _*)
    if (joinType == "inner") unpacked.filter(col(rightTs).isNotNull) else unpacked
  }

  /** Hot-key-proof forward as-of: [[backwardChunked]] on NEGATED event
    * times — "latest right at-or-before −t" is exactly "earliest right
    * at-or-after t" — with both ts columns restored in the output. Same
    * chunking properties and contracts as the backward variant.
    * Requires ts > Long.MinValue (vacuous for real timestamps) —
    * ENFORCED per row, since silent negation overflow would corrupt the
    * chunk assignment rather than fail. */
  def forwardChunked(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      chunkWidth: Long,
      strict: Boolean = false,
      tolerance: Option[Long] = None,
      joinType: String = "inner",
      tiebreak: Seq[String] = Nil
  ): DataFrame = {
    // -Long.MinValue overflows back to Long.MinValue silently; fail the
    // row loudly instead (codegen'd branch, no-op on real timestamps).
    def negChecked(c: Column, name: String): Column =
      when(c === Long.MinValue,
        raise_error(lit(s"forwardChunked: $name = Long.MinValue cannot be negated")).cast("long"))
        .otherwise(-c)
    val out = backwardChunked(
      left.withColumn(leftTs, negChecked(col(leftTs), leftTs)),
      right.withColumn(rightTs, negChecked(col(rightTs), rightTs)),
      keys, leftTs, rightTs, chunkWidth, strict, tolerance, joinType, tiebreak)
    out.withColumn(leftTs, -col(leftTs)).withColumn(rightTs, -col(rightTs))
  }
}
