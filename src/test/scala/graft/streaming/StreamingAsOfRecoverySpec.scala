package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingPipeline.AsOfSide

/** Restart fault-tolerance of the temporal as-of join: the per-key
  * snapshot state must survive a checkpoint restart — probes arriving
  * after the restart must still match versions seen before it. */
class StreamingAsOfRecoverySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeFile(dir: String, name: String, rows: Seq[AsOfSide], mtime: Long): Unit = {
    val lines = rows.map(r =>
      s"""{"key":"${r.key}","ts":${r.ts},"side":"${r.side}","payload":"${r.payload}"}""")
    val p = java.nio.file.Paths.get(s"$dir/$name")
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(mtime))
  }

  private val schema = StructType(Seq(
    StructField("key", StringType), StructField("ts", LongType),
    StructField("side", StringType), StructField("payload", StringType)))

  private def runStream(in: String, out: String, cp: String): Unit = {
    import spark.implicits._
    val sides = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(in).as[AsOfSide]
    val q = StreamingPipeline.temporalAsOfStream(spark, sides)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def result(out: String) =
    spark.read.parquet(out)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.toString)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq

  private val f1 = Seq(
    AsOfSide("k1", 10L, "r", "v1"), AsOfSide("k2", 15L, "r", "w1"),
    AsOfSide("k1", 20L, "l", "p1"))
  private val f2 = Seq(
    AsOfSide("k1", 30L, "l", "p2"),  // needs k1's v1 from BEFORE the restart
    AsOfSide("k2", 40L, "r", "w2"),
    AsOfSide("k2", 50L, "l", "p3"))  // needs the post-restart w2, not w1

  test("as-of restarted from checkpoint equals the uninterrupted run") {
    val inA = tmp("asof-rec-a"); val outA = tmp("asof-rec-a-out")
    writeFile(inA, "f1.json", f1, 1700000000000L)
    writeFile(inA, "f2.json", f2, 1700000001000L)
    runStream(inA, outA, tmp("asof-rec-a-cp"))

    val inB = tmp("asof-rec-b"); val outB = tmp("asof-rec-b-out")
    val cpB = tmp("asof-rec-b-cp")
    writeFile(inB, "f1.json", f1, 1700000000000L)
    runStream(inB, outB, cpB)
    writeFile(inB, "f2.json", f2, 1700000001000L)
    runStream(inB, outB, cpB)

    val a = result(outA)
    val b = result(outB)
    assert(a.nonEmpty)
    assert(b == a, s"restarted as-of diverged: $b vs $a")
    // and the cross-restart match is actually exercised:
    val p2 = b.find(_._3 == "p2").get
    assert(p2._5.contains("v1"), s"p2 lost the pre-restart snapshot: $p2")
    val p3 = b.find(_._3 == "p3").get
    assert(p3._5.contains("w2"))
  }
}
