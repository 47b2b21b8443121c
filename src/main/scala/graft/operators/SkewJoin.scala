package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: the 100 TB answer for hot join keys that
  * overload single reducers when the small side is still too large (or
  * too row-multiplying) to broadcast.
  *
  * Left rows get a DETERMINISTIC salt in `[0, buckets)` derived from a
  * caller-chosen column (a row id — never `rand()`, which would break
  * retry idempotence and result parity); the right side is replicated
  * `buckets` times. The join key becomes `(keys..., salt)`, so each hot
  * key's rows spread across `buckets` reducers instead of one. Output is
  * row-for-row identical to the unsalted join (the q36 oracle checks
  * exactly that).
  *
  * Spark's AQE skew-join handles sort-merge skew adaptively at runtime;
  * this operator is the static form for when the skew is known and the
  * planner must not depend on runtime stats (e.g. first run, or
  * bucketed/pre-partitioned pipelines AQE won't re-plan).
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
             leftSaltSource: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = left.withColumn("__salt", pmod(leftSaltSource, lit(buckets)).cast("int"))
    val r = right.withColumn("__salt", explode(typedlit((0 until buckets).toArray)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
