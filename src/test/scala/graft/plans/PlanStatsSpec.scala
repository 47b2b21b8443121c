package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PlanStats' per-canonical-plan cache, negative path: a statistic job
  * that THROWS must be cached like a success — the rewrite rules catch
  * per query and keep the naive plan, so without negative caching a
  * side whose stats job always fails would re-submit the failing job on
  * every re-optimization. */
class PlanStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a failing statistic job is negative-cached; the retry declines without a job") {
    PlanStats.clearCache()
    // a key column that raises at EXECUTION time - analysis is clean, so
    // the failure happens inside the cached compute, exactly the
    // permissions-on-one-table shape
    val df = spark.range(8).select(
      when(col("id") < 4L, col("id"))
        .otherwise(expr("raise_error('graft-stats-boom')").cast("long")).as("k"))
    val plan = df.queryExecution.analyzed
    val keys = plan.output

    val first = intercept[Throwable](PlanStats.rowsPerKey(spark, plan, keys))
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: rootMessages(e.getCause))
    assert(rootMessages(first).exists(m => m != null && m.contains("graft-stats-boom")),
      s"first failure should surface the job error, got: $first")

    val second = intercept[IllegalStateException](PlanStats.rowsPerKey(spark, plan, keys))
    assert(second.getMessage.contains("negative-cached"))
    assert(rootMessages(second.getCause).exists(m => m != null && m.contains("graft-stats-boom")),
      "the cached failure must carry the original cause")

    // a DIFFERENT plan is unaffected by the cached failure
    val ok = spark.range(100).select((col("id") % 5L).as("k"))
    val okPlan = ok.queryExecution.analyzed
    assert(PlanStats.rowsPerKey(spark, okPlan, okPlan.output) == 20.0)
    PlanStats.clearCache()
  }
}
