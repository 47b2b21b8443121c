package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stream-pairing operators — the relational re-expression of the
  * reference's in-memory pairing state machines (SURVEY.md §2.5).
  *
  * The reference (`ossplugins/network-latency/processor.go:278-285`,
  * `ossplugins/vote-latency/processor.go:26-65`) pairs a "send" stream
  * against a "receive" stream keyed by composite keys, FIFO per key. In
  * Spark that is a rank-paired equi-join: `row_number()` per (key, side)
  * gives each occurrence an ordinal, and an equi-join on (key, ordinal)
  * reproduces exact FIFO matching — fully distributed, one shuffle per
  * side on the pairing key, no driver state.
  *
  * Scale note: both windows and the join shuffle on the same key columns,
  * so the exchange is reused across the window and join stages; skewed
  * keys are handled by AQE skew-join splitting.
  */
object PairingJoin {

  /** FIFO multiset pairing: the n-th `left` row is matched with the n-th
    * `right` row within each key group, each side ordered by `orderBy`
    * (must be a total order for determinism — include a unique tiebreak).
    *
    * Column names in `left` and `right` must be disjoint apart from `keys`.
    *
    * @param joinType "inner" keeps matched pairs only (reference's
    *                 confirmed records); "full_outer" additionally yields
    *                 unmatched rows from both sides (reference's
    *                 unmatched-leftovers flush, processor.go:449-476).
    */
  def fifo(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftOrderBy: Seq[String],
      rightOrderBy: Seq[String],
      joinType: String = "inner"
  ): DataFrame = {
    val lw = Window.partitionBy(keys.map(col): _*).orderBy(leftOrderBy.map(col): _*)
    val rw = Window.partitionBy(keys.map(col): _*).orderBy(rightOrderBy.map(col): _*)
    val l  = left.withColumn("pair_seq", row_number().over(lw))
    val r  = right.withColumn("pair_seq", row_number().over(rw))
    l.join(r, keys :+ "pair_seq", joinType)
  }

  /** Last-send / first-receive pairing — the vote-latency quirk
    * (`vote-latency/processor.go:52-53`): a later send overwrites the
    * pending entry, so only the LAST send per key pairs, and it pairs with
    * the FIRST receive that arrives after it. Deduplicates both sides with
    * `row_number` before an inner join, then keeps send-before-receive
    * pairs only (the reference confirms only that order).
    */
  def lastSendFirstReceive(
      sends: DataFrame,
      receives: DataFrame,
      keys: Seq[String],
      sendTs: String,
      recvTs: String,
      sendTiebreak: Seq[String],
      recvTiebreak: Seq[String]
  ): DataFrame = {
    val kCols    = keys.map(col)
    val sendW    = Window.partitionBy(kCols: _*).orderBy((col(sendTs).desc +: sendTiebreak.map(col(_).desc)): _*)
    val recvW    = Window.partitionBy(kCols: _*).orderBy((col(recvTs).asc +: recvTiebreak.map(col(_).asc)): _*)
    val lastSend = sends.withColumn("rn", row_number().over(sendW)).filter(col("rn") === 1).drop("rn")
    val firstRcv = receives.withColumn("rn", row_number().over(recvW)).filter(col("rn") === 1).drop("rn")
    lastSend
      .join(firstRcv, keys)
      .filter(col(sendTs) <= col(recvTs))
  }
}
