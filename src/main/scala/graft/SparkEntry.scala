package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every entry in [[queries]]
  * with a matching key in [[oracleSql]] is hash-compared against DuckDB on
  * the driver's sf0.01 tables; entries without oracle SQL get a rows-only
  * check (non-SQL-expressible operators).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ CometbftQueries.queries ++ RelOpsQueries.queries ++ LayoutQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ EventQueries.oracleSql ++ TextQueries.oracleSql ++
      VectorQueries.oracleSql ++ CometbftQueries.oracleSql ++ RelOpsQueries.oracleSql ++ LayoutQueries.oracleSql
}
