package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DirSwap's atomic-rename scheme gate: built-in allowlist, the
  * per-session opt-in conf for rename-atomic stores, and the happy-path
  * swap on the local scheme. (Crash-state healing is pinned where the
  * swap is used — the streaming sketch and AnnIndex compaction specs.) */
class DirSwapSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("object-store schemes fail loudly before any write") {
    val err = intercept[IllegalArgumentException] {
      DirSwap.requireAtomicRename(spark, new Path("s3a://bucket/table"))
    }
    assert(err.getMessage.contains("rename is not atomic"))
    assert(err.getMessage.contains(DirSwap.AtomicSchemesConf),
      "the failure must name the opt-in conf - operators on rename-atomic stores need the way out")
  }

  test("rename-atomic stores opt in via the session conf, case-insensitively") {
    spark.conf.set(DirSwap.AtomicSchemesConf, " ABFS , o3fs ,")
    try {
      assert(DirSwap.allowedSchemes(spark).contains("abfs"))
      assert(DirSwap.allowedSchemes(spark).contains("o3fs"))
      DirSwap.requireAtomicRename(spark, new Path("abfs://c@acct/table")) // must not throw
      // the conf EXTENDS the allowlist - it never bypasses the gate for others
      intercept[IllegalArgumentException] {
        DirSwap.requireAtomicRename(spark, new Path("s3a://bucket/table"))
      }
    } finally spark.conf.unset(DirSwap.AtomicSchemesConf)
  }

  test("local-scheme swap rewrites in place and cleans up its working dirs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dirswap-spec").resolve("t").toString
    (1 to 100).toDF("v").repartition(8).write.parquet(dir)
    DirSwap.swapRewrite(spark, dir)(_.repartition(1))((df, out) => df.write.parquet(out))
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq == (1 to 100))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(dir + ".compact-tmp")))
    assert(!fs.exists(new Path(dir + ".compact-backup")))
  }
}
