package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `graft.checkpoint.reliable` switch ([[Checkpoints.stage]]): every
  * iterative operator must label identically whether its per-round
  * checkpoints go through `localCheckpoint()` (default — fast,
  * executor-local, forfeits partials on executor loss) or reliable
  * `checkpoint()` (cluster mode — survives executor loss). Covers the
  * two mechanisms the modes could diverge on: the CC convergence metric
  * that rides the checkpoint job via `observe()`, and BPE's per-round
  * free-then-restage loop.
  */
class ReliableCheckpointSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withReliable[A](body: => A): A = {
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try body finally spark.conf.set(Checkpoints.ReliableKey, "false")
  }

  // Ordered before the parity tests: getCheckpointDir is sticky once set
  // on the shared context, so the missing-dir path is only reachable
  // while no test has called setCheckpointDir yet.
  test("reliable mode without a checkpoint dir fails loudly up front") {
    import spark.implicits._
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val pairs = Seq((2L, 1L)).toDF("d1", "d2")
    val ex = intercept[IllegalArgumentException] {
      withReliable(Dedup.connectedComponents(pairs, "d1", "d2").collect())
    }
    assert(ex.getMessage.contains("setCheckpointDir"))
  }

  private def enableCheckpointDir(): Unit =
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-reliable-cp").toString)

  test("connectedComponents labels identically under reliable checkpoints") {
    import spark.implicits._
    enableCheckpointDir()
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.toDF("d1", "d2")
    val local = Dedup.connectedComponents(pairs, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = withReliable {
      Dedup.connectedComponents(pairs, "d1", "d2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(local.nonEmpty && reliable == local)
  }

  test("bpeTrain merge table identical under reliable checkpoints") {
    import spark.implicits._
    enableCheckpointDir()
    val docs = Seq("low lower lowest", "new newer newest", "low low new")
      .toDF("text")
    val local = VocabOps.bpeTrain(docs, "text", nMerges = 4)
      .collect().map(_.toSeq).toSeq
    val reliable = withReliable {
      VocabOps.bpeTrain(docs, "text", nMerges = 4).collect().map(_.toSeq).toSeq
    }
    assert(local.nonEmpty && reliable == local)
  }

  test("minhash near-dup pairs identical under reliable checkpoints") {
    import spark.implicits._
    enableCheckpointDir()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different document about spark checkpoint modes"),
      (4L, "the quick brown fox jumps over the lazy cat again and again"),
    ).toDF("doc_id", "text")
    def run() = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, k = 16, bandSize = 4, minJaccardPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val local = run()
    val reliable = withReliable(run())
    assert(reliable == local)
  }
}
