package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * Each accessor is a plain parquet scan — Catalyst pushes filters and
  * prunes columns into the scan, so callers should NOT pre-select here.
  * At 100 TB these would be partitioned/bucketed tables behind a catalog;
  * the path-per-table layout keeps the same API shape.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Exact integer-µs event time from `col`, tolerant of every flavor the
    * driver's events.parquet has resolved as across Spark/testdata versions:
    *   - `LongType` — raw parquet TIMESTAMP(NANOS) read with
    *     `spark.sql.legacy.parquet.nanosAsLong=true`; ns→µs truncation
    *     matches DuckDB's `epoch_us` for positive epochs;
    *   - `TimestampType` — `unix_micros` directly;
    *   - `TimestampNTZType` — what Spark 4.1.2 infers for no-timezone
    *     parquet `timestamp[us]`; under the UTC session timezone the cast
    *     to TIMESTAMP is a relabel, so `unix_micros` equals `epoch_us`.
    * Any other type is a schema drift we want loud, not coerced. */
  def tsToMicros(df: DataFrame, colName: String): org.apache.spark.sql.Column =
    df.schema(colName).dataType match {
      case LongType         => expr(s"$colName div 1000")
      case TimestampType    => unix_micros(col(colName))
      case TimestampNTZType => unix_micros(col(colName).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for column '$colName': $other")
    }
}
