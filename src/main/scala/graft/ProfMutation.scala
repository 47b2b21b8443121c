package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Scratch profiler (not part of the driver contract; safe to delete):
  * what does file-grain mutation buy over the naive full rewrite? A
  * 640-file clustered table, a delete box the envelope index localizes
  * to a handful of files, and an upsert touching a narrow key range —
  * timed against reading and rewriting the whole table. */
object ProfMutation {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("prof-mutation").toString
    def mk(name: String, n: Long): String = {
      val dir = s"$base/$name"
      val df = spark.range(n).select($"id".as("k"),
        pmod(hash($"id" * 7L), lit(1 << 20)).cast("long").as("v"),
        sha2(concat($"id".cast("string"), lit("pad")), 256).as("payload"))
      Layout.clusterWrite(df, Seq("k"), 640, dir)
      dir
    }
    def timeMs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }

    // sweep table size at fixed file count: the file-grain delete's cost
    // is metadata + the affected files; the naive full rewrite's cost is
    // the whole table — the gap must widen with size
    for (n <- Seq(2000000L, 8000000L, 32000000L)) {
      val del = mk(s"del$n", n)
      val tDel = timeMs {
        val s = Layout.deleteWhere(spark, del, Seq(("k", 10000L, 19999L)))
        println(s"  deleteWhere stats: $s")
      }
      val full = mk(s"full$n", n)
      val tFull = timeMs {
        val kept = spark.read.parquet(full).filter(!($"k".between(10000L, 19999L)))
        kept.write.mode("overwrite").parquet(s"$base/full$n-out")
      }
      println(f"rows=$n%-9d delete 10k: file-grain ${tDel}%8.1f ms  full rewrite ${tFull}%8.1f ms  (${tFull / tDel}%4.1fx)")
    }

    // upsert 5k keys in one narrow range, largest size only
    val n = 32000000L
    val ups = mk("ups", n)
    val updates = spark.range(20000L, 25000L).select($"id".as("k"), lit(-1L).as("v"),
      lit("upd").as("payload"))
    val tUps = timeMs {
      val s = Layout.upsert(spark, ups, updates, "k")
      println(s"  upsert stats: $s")
    }
    val full2 = mk("full2", n)
    val tFull2 = timeMs {
      val kept = spark.read.parquet(full2).join(updates.select("k"), Seq("k"), "left_anti")
      kept.unionByName(updates).write.mode("overwrite").parquet(s"$base/full2-out")
    }
    println(f"rows=$n%-9d upsert 5k:  file-grain ${tUps}%8.1f ms  full rewrite ${tFull2}%8.1f ms  (${tFull2 / tUps}%4.1fx)")

    // round 15: the classification STAB at scale — 10^4 file intervals ×
    // 10^5 update keys, the shape where the old between-condition
    // anti-join (a broadcast-nested-loop, O(files × keys) = 10^9
    // comparisons here, 10^13 at production counts) stalls. The interval
    // stab is a bucketized equi-join: flat in files × keys.
    {
      val nFiles = 10000L
      val nKeys = 100000L
      val env = spark.range(nFiles).select(
        concat(lit("f"), $"id").as("file"),
        ($"id" * 1000L).as("f_start"), ($"id" * 1000L + 999L).as("f_end"))
      val pts = spark.range(nKeys).select(($"id" * 97L).as("k_pt"))
      val stab = graft.operators.IntervalJoin.pointInInterval(
        pts, env, Nil, "k_pt", "f_start", "f_end", 1000L)
        .select("file").distinct()
      val plan = stab.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        "stab degraded to a nested-loop join")
      val tStab = timeMs { println(s"  stabbed files: ${stab.count()}") }
      val naive = env.join(pts, $"k_pt".between($"f_start", $"f_end"), "left_anti")
      val tNaive = timeMs { println(s"  naive-missed files: ${naive.count()}") }
      println(f"classify ${nFiles} files x ${nKeys} keys: stab ${tStab}%8.1f ms  BNLJ anti ${tNaive}%8.1f ms  (${tNaive / tStab}%4.1fx)")
    }

    // round 16: the STRING-key classification at the same scale — 10^4
    // file intervals × 10^5 string keys through Layout.stringKeyStab
    // (LCP strip → 7-byte-prefix interval stab → exact refinement), the
    // shape upsert builds for string doc-ids, vs the between-condition
    // BNLJ it replaces. The shared "doc-" prefix + zero padding is
    // deliberately the WORST realistic id scheme: without the LCP strip
    // every file's 7-byte window collapses to one value.
    {
      val nFiles = 10000L
      val nKeys = 100000L
      def key(c: org.apache.spark.sql.Column) =
        concat(lit("doc-"), lpad(c.cast("string"), 10, "0"))
      val env = spark.range(nFiles).select(
        concat(lit("f"), $"id").as("file"),
        key($"id" * 1000L).as("f_min"), key($"id" * 1000L + 999L).as("f_max"))
      val pts = spark.range(nKeys).select(key($"id" * 97L).as("k_val"))
      val stab = graft.sources.Layout.stringKeyStab(env, pts).select("file").distinct()
      val plan = stab.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        "string stab degraded to a nested-loop join")
      val tStab = timeMs { println(s"  string-stabbed files: ${stab.count()}") }
      val naive = env.join(pts, $"k_val".between($"f_min", $"f_max"), "left_anti")
      val tNaive = timeMs { println(s"  naive-missed files: ${naive.count()}") }
      println(f"string classify ${nFiles} files x ${nKeys} keys: stab ${tStab}%8.1f ms  BNLJ anti ${tNaive}%8.1f ms  (${tNaive / tStab}%4.1fx)")
    }

    // round 16: the GENERAL merge (conditional matched arm) must keep
    // the candidate restriction — the matched-pair condition join reads
    // candidate files only, so a 5k-key conditional merge over the 32M
    // table costs like the upsert (same stab, one extra candidate-file
    // pass for the pair join), never like a table scan
    {
      val mrg = mk("mrg", n)
      val src = spark.range(40000L, 45000L).select($"id".as("k"), lit(-2L).as("v"),
        lit("mrg").as("payload"))
      val tMrg = timeMs {
        val s = Layout.merge(spark, mrg, src, Seq("k"),
          Seq(Layout.MatchedUpdateAll(Some(col("_src_v") =!= col("v")))),
          insertUnmatched = true)
        println(s"  merge stats: $s")
      }
      println(f"rows=$n%-9d merge 5k cond-update: file-grain ${tMrg}%8.1f ms  (upsert same keys ${tUps}%8.1f ms, full rewrite ${tFull2}%8.1f ms)")
    }

    // round 17: DELETION-VECTOR delete cost must be INDEPENDENT of the
    // candidate file size on the write side — a 10-row delete in a table
    // of any size writes a tiny sidecar, never a data file: sweep table
    // size at fixed file count and compare dv vs copy-on-write
    for (nn <- Seq(2000000L, 8000000L, 32000000L)) {
      val dvd = mk(s"dv$nn", nn)
      val tDv = timeMs {
        val s = Layout.deleteWhere(spark, dvd, Seq(("k", 10000L, 10009L)), mode = "dv")
        println(s"  dv-delete stats: $s")
      }
      val cow = mk(s"cow$nn", nn)
      val tCow = timeMs {
        val s = Layout.deleteWhere(spark, cow, Seq(("k", 10000L, 10009L)))
        println(s"  copy-delete stats: $s")
      }
      println(f"rows=$nn%-9d delete 10 rows: dv ${tDv}%8.1f ms  copy ${tCow}%8.1f ms  (${tCow / tDv}%4.1fx)")
    }

    // round 17: COMPOSITE-key classification with a LOW-CARDINALITY
    // leading column — 8 distinct sources × 10^5 doc ids, the corpus
    // shape where a head-only stab candidates EVERYTHING: the
    // per-column union must classify at file grain through the second
    // component (only the key-range files rewrite)
    {
      val dir = s"$base/lowcard"
      val df = spark.range(n).select(
        concat(lit("src-"), pmod($"id", lit(8)).cast("string")).as("source"),
        $"id".as("doc_id"),
        sha2(concat($"id".cast("string"), lit("pad")), 256).as("payload"))
      Layout.clusterWrite(df, Seq("doc_id"), 640, dir)
      Layout.writeEnvelopes(spark, dir, Seq("source", "doc_id"))
      val ups = spark.range(20000L, 25000L).select(
        concat(lit("src-"), pmod($"id", lit(8)).cast("string")).as("source"),
        $"id".as("doc_id"), lit("upd").as("payload"))
      val tLc = timeMs {
        val s = Layout.upsertKeyed(spark, dir, ups, Seq("source", "doc_id"))
        println(s"  lowcard composite stats: $s")
        require(s.untouchedFiles > 600,
          s"per-column stab must keep the merge at file grain, got $s")
      }
      println(f"rows=$n%-9d composite (8-source, doc_id) upsert 5k: ${tLc}%8.1f ms (untouched > 600/640 files)")
    }
  }
}
