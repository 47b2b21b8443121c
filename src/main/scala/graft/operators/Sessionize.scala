package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gaps-and-islands sessionization — the reference's timeout-cluster
  * detection (SURVEY.md §2.6 A10, `timeout-analysis/processor.go:180-199`):
  * consecutive events are chained into a cluster while an arbitrary
  * break predicate over (previous row, current row) holds, and clusters
  * below a minimum size are discarded.
  *
  * Spark's `session_window` only supports a time gap; the reference's dual
  * predicate (time gap AND height delta) needs the classic window
  * formulation: lag → new-cluster flag → running sum as cluster id. One
  * shuffle on the partition key; the running sum stays within the same
  * window exchange.
  */
object Sessionize {

  /** Assigns a `session_id` (per partition key, 1-based) to every row.
    *
    * @param breakWhen  given (lagged previous-row accessor, current row
    *                   accessor) returns the "start a new session" predicate;
    *                   rows with no predecessor always start a session.
    * @param orderBy    total order within a key (include a unique tiebreak).
    */
  def assign(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[String],
      breakWhen: (String => Column) => Column
  ): DataFrame = {
    val w       = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(col): _*)
    def prev(c: String): Column = lag(col(c), 1).over(w)
    val isBreak = breakWhen(prev)
    df.withColumn("is_new_session", when(isBreak.isNull || isBreak, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("is_new_session")
  }

  /** Session roll-up: one row per (keys..., session_id) with start/end/count,
    * filtered to sessions with at least `minEvents` rows (reference keeps
    * clusters of >= 3: `timeout-analysis/processor.go:194`). */
  def rollup(
      withSessions: DataFrame,
      keys: Seq[String],
      tsCol: String,
      minEvents: Long
  ): DataFrame = {
    withSessions
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end")
      )
      .filter(col("n_events") >= minEvents)
  }
}
