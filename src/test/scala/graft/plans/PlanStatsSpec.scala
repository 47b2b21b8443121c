package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PlanStats' per-canonical-plan cache, failure paths: a statistic job
  * that fails DETERMINISTICALLY (AnalysisException) is negative-cached —
  * re-optimizing the same broken plan declines instantly instead of
  * re-submitting a guaranteed-failing job — while a TRANSIENT failure
  * (lost executor, concurrent file deletion, cancelled job) must NOT
  * poison the cache: the next call simply retries, so one flake can
  * never permanently break the user-facing verbs that share this cache
  * with the optimizer rules. */
class PlanStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a transient (runtime) statistic failure is retried, not poisoned") {
    PlanStats.clearCache()
    val plan = spark.range(3).queryExecution.analyzed
    var calls = 0
    def compute: java.lang.Long = {
      calls += 1
      if (calls == 1) throw new RuntimeException("graft-transient-flake")
      Long.box(42L)
    }
    val first = intercept[RuntimeException](PlanStats.cached("spec-transient", plan)(compute))
    assert(first.getMessage.contains("graft-transient-flake"))
    // the retry RE-RUNS the compute (no negative cache for runtime failures)
    assert(PlanStats.cached("spec-transient", plan)(compute) == 42L)
    assert(calls == 2)
    // and the success is now cached: no third call
    assert(PlanStats.cached("spec-transient", plan)(compute) == 42L)
    assert(calls == 2)
    PlanStats.clearCache()
  }

  test("a deterministic (AnalysisException) failure is negative-cached; the retry declines without a job") {
    PlanStats.clearCache()
    val plan = spark.range(4).queryExecution.analyzed
    var calls = 0
    def compute: java.lang.Long = {
      calls += 1
      // a real AnalysisException raised INSIDE the compute thunk — the
      // shape of a plan that can never analyze (dropped table, bad column)
      spark.sql("SELECT * FROM graft_no_such_table_xyz").head()
      Long.box(1L)
    }
    intercept[AnalysisException](PlanStats.cached("spec-analysis", plan)(compute))
    assert(calls == 1)
    val second = intercept[IllegalStateException](
      PlanStats.cached("spec-analysis", plan)(compute))
    assert(second.getMessage.contains("negative-cached"))
    assert(second.getCause.isInstanceOf[AnalysisException],
      "the cached failure must carry the original cause")
    assert(calls == 1, "the negative-cached retry must not re-run the job")

    // a DIFFERENT key is unaffected by the cached failure
    val ok = spark.range(100).select((col("id") % 5L).as("k"))
    val okPlan = ok.queryExecution.analyzed
    assert(PlanStats.rowsPerKey(spark, okPlan, okPlan.output) == 20.0)
    PlanStats.clearCache()
  }
}
