package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 regression: the driver's events.parquet silently changed from a
  * type Spark reads as nanosecond longs to one it infers as TIMESTAMP_NTZ,
  * and every events-table query failed at analysis. [[Tables.tsToMicros]]
  * must now tolerate all three flavors the table has ever resolved as —
  * this spec writes the SAME instants in each flavor and asserts identical
  * integer-µs output, so the next environment shift fails here, not in the
  * driver's correctness run.
  */
class EventTimeFlavorSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Instants with sub-second precision; µs truncation must be exact.
  private val micros = Seq(0L, 1L, 999999L, 1700000000123456L, 1700000000999999L)

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ts-flavor-$tag").toString

  private def microsOf(dir: String): Seq[Long] = {
    val df  = spark.read.parquet(dir)
    df.select(Tables.tsToMicros(df, "ts").as("us")).collect().map(_.getLong(0)).sorted.toSeq
  }

  test("TIMESTAMP, TIMESTAMP_NTZ and INT64-ns flavors all yield the same exact microseconds") {
    import spark.implicits._
    val base = micros.toDF("us")

    // Flavor 1: TIMESTAMP (with session timezone).
    val tzDir = tempDir("tz")
    base.select(timestamp_micros($"us").as("ts")).write.mode("overwrite").parquet(tzDir)

    // Flavor 2: TIMESTAMP_NTZ — what Spark 4.1.2 infers for the driver's
    // current no-timezone parquet timestamp[us].
    val ntzDir = tempDir("ntz")
    base.select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(ntzDir)

    // Flavor 3: raw INT64 nanoseconds (the nanosAsLong read of TIMESTAMP(NANOS)).
    val nsDir = tempDir("ns")
    base.select(($"us" * 1000L).as("ts")).write.mode("overwrite").parquet(nsDir)

    val tz  = microsOf(tzDir)
    val ntz = microsOf(ntzDir)
    val ns  = microsOf(nsDir)
    val expected = micros.sorted

    assert(spark.read.parquet(ntzDir).schema("ts").dataType === TimestampNTZType)
    assert(tz === expected)
    assert(ntz === expected)
    assert(ns === expected)
  }

  test("an unsupported event-time type fails loudly, not silently coerced") {
    import spark.implicits._
    val dir = tempDir("bad")
    Seq("2024-01-01").toDF("ts").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val e = intercept[IllegalArgumentException](Tables.tsToMicros(df, "ts"))
    assert(e.getMessage.contains("unsupported event-time type"))
  }
}
