package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the graft engine.
  *
  * Settings chosen for a 1000-executor 100 TB deployment first, local[32]
  * second:
  *   - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  *     and dynamic broadcast conversion replace hand-tuned partition counts
  *     at scale.
  *   - UTC session time zone: deterministic timestamp semantics across the
  *     cluster and vs. the DuckDB oracle.
  *   - shuffle.partitions is only the AQE *initial* value; local runs pass
  *     the core count, cluster deployments would size it to ~2-3x total
  *     cores.
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // The driver's events.parquet uses TIMESTAMP(NANOS), which Spark 4
      // otherwise refuses; LongType ns keeps full precision (SURVEY §7.4-2).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ObjectHashAggregate (every TypedImperativeAggregate: the bounded
      // top-k rankings, the exact-percentile histogram) falls back to
      // SORT-based aggregation after only 128 in-memory groups by
      // default — which silently re-introduces the full-input sort the
      // bounded aggregates exist to avoid (measured 3x on a 40M-row
      // candidate product, PLANS.md round 9). ANN query sides are gated
      // at <= 10k groups and each top-k buffer is ~24.k bytes, so 64k
      // hash-mode groups per task is far inside executor memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
