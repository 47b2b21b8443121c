package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed co-located join contract: two tables bucketed on the join
  * key with equal bucket counts join with NO exchange on either side — the
  * write-once-shuffle-never property the 100 TB layout depends on.
  * Broadcast is disabled (and restored — the session is shared across
  * suites) so the shuffle-free-ness is proved by bucketing, not by the
  * small-table fast path.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("equal-bucket tables join exchange-free; unbucketed join shuffles") {
    val t = Tables(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    Bucketing.writeBucketed(t.orders, "orders_b", "o_custkey", 4, Some(s"$tmp/orders_b"))
    Bucketing.writeBucketed(t.customer, "customer_b", "c_custkey", 4, Some(s"$tmp/customer_b"))
    try withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      // bucket keys must be THE join key on both sides; align the names
      val bucketed = spark.table("orders_b")
        .withColumnRenamed("o_custkey", "custkey")
        .join(spark.table("customer_b").withColumnRenamed("c_custkey", "custkey"), "custkey")
      val p = bucketed.queryExecution.explainString(FormattedMode)
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle:\n${p.linesIterator.take(25).mkString("\n")}")
      assert(p.contains("SortMergeJoin"), "expected a sort-merge co-located join")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        "scan did not use bucket metadata")

      // identical join over raw parquet shuffles both sides — the cost the
      // bucketed layout pays once at write time
      val plain = t.orders.withColumnRenamed("o_custkey", "custkey")
        .join(t.customer.withColumnRenamed("c_custkey", "custkey"), "custkey")
      val pp = plain.queryExecution.explainString(FormattedMode)
      assert(pp.contains("Exchange"), "control join unexpectedly exchange-free")

      // same answer either way
      assert(bucketed.count() == plain.count())

      // bucket pruning: an equality filter on the bucket key reads 1 of 4
      // buckets. autoBucketedScan (on by default) turns OFF bucketed reading
      // for filter-only queries — disable it so the pruned scan is visible.
      withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
        val prune = spark.table("customer_b").filter("c_custkey = 7")
          .queryExecution.explainString(FormattedMode)
        assert(prune.contains("SelectedBucketsCount: 1 out of 4"),
          s"expected bucket pruning:\n${prune.linesIterator.take(20).mkString("\n")}")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
