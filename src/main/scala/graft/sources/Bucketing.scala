package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (pre-partitioned) tables — the co-located join path for the
  * repeated big-join keys of a 100 TB deployment.
  *
  * A fact table that is joined on the same key query after query (orders ⋈
  * customer on custkey, lineitem ⋈ orders on orderkey, the events table on
  * its pairing keys) should pay its shuffle ONCE, at write time: both sides
  * bucketed into the same number of buckets on the join key make every
  * subsequent join exchange-free — each task reads matching bucket files
  * from both sides. `sortBy` additionally pre-orders within buckets so a
  * single-file-per-bucket layout skips the sort too.
  *
  * This is the catalog-table counterpart of the path-scan layout in
  * [[Tables]]: `bucketBy` requires `saveAsTable` (bucket metadata lives in
  * the catalog, not the parquet footer). `BucketingSpec` pins the
  * exchange-free plan shape.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table — managed (under
    * the session warehouse) by default, external at `path` when given.
    * `repartition(n, key)` first, so each bucket is ONE file — Spark's
    * reader only trusts the per-bucket sort order for single-file buckets,
    * and one writer task per bucket avoids the many-small-files problem at
    * write time. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.repartition(nBuckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
    path.foreach(p => w.option("path", p))
    w.saveAsTable(table)
  }

  /** Co-located equi-join of two tables bucketed on `key` with equal
    * bucket counts: plans as a join with NO exchange on either side. */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
                 key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
