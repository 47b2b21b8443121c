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

    // `runMain graft.ProfMutation r18` skips the rounds-15..17 sections;
    // `r19` runs only the round-19 additions (the full sequence is
    // ~15 min; the per-round additions are meant to be re-measurable on
    // their own)
    val r18Only = args.contains("r18")
    val r19Only = args.contains("r19")

    if (!r18Only && !r19Only) {
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
    } // !r18Only

    if (!r19Only) {
    // round 18: the GENERAL merge arm matrix in MERGE-ON-READ mode must
    // keep the dv economics — flat in table size, zero candidate
    // rewrites — for the CDC-apply trickle shape (conditional update +
    // delete arms over a 10-key source)
    for (nn <- Seq(2000000L, 8000000L, 32000000L)) {
      val gm = mk(s"gmrg$nn", nn)
      val src = spark.range(30000L, 30010L).select($"id".as("k"), lit(-3L).as("v"),
        lit("gm").as("payload"))
      val tGm = timeMs {
        val s = Layout.merge(spark, gm, src, Seq("k"),
          Seq(Layout.MatchedDelete(Some(pmod(col("v"), lit(2L)) === 0L)),
            Layout.MatchedUpdateSet(Seq("payload" -> lit("gm-upd")))),
          insertUnmatched = true, mode = "dv")
        println(s"  dv general-merge stats: $s")
        require(s.rewrittenFiles == 0L, s"dv merge must rewrite nothing: $s")
      }
      val cm = mk(s"cmrg$nn", nn)
      val tCm = timeMs {
        val s = Layout.merge(spark, cm, src, Seq("k"),
          Seq(Layout.MatchedDelete(Some(pmod(col("v"), lit(2L)) === 0L)),
            Layout.MatchedUpdateSet(Seq("payload" -> lit("gm-upd")))),
          insertUnmatched = true)
        println(s"  copy general-merge stats: $s")
      }
      println(f"rows=$nn%-9d general merge 10 keys: dv ${tGm}%8.1f ms  copy ${tCm}%8.1f ms  (${tCm / tGm}%4.1fx)")
    }

    // round 18: the DV READ-side probe state — a broadcast map of
    // primitive long[] positions — measured at a LARGE synthetic
    // sidecar: serialized bytes per pending position must sit near 8
    // (the exploded (path-string, pos) rows it replaced carried the
    // 50-100-byte relative path on EVERY row, ~0.6-1 GB at the 10M
    // cap). Also times the snapshot read against the pending sidecar —
    // the same plan every streaming manifest batch over a DV commit
    // serves — and the reified read for contrast.
    {
      val nn = 8000000L
      val dir = mk("dvread", nn)
      spark.conf.set(Layout.DvMaxPositionsConf, "4000000")
      try {
        // EVERY OTHER row of the first half: no file is fully covered,
        // so nothing drops whole — all 2M deletes land as POSITIONS
        // (a contiguous box would retire interior files at metadata
        // grain and leave only boundary positions in the sidecar)
        val src = spark.range(0L, 4000000L, 2L).select($"id".as("k"))
        val s = Layout.merge(spark, dir, src, Seq("k"),
          Seq(Layout.MatchedDelete()), insertUnmatched = false, mode = "dv")
        println(s"  dv bulk-mark stats: $s")
        val info = graft.sources.Manifest.info(spark, dir)
        val root = new org.apache.hadoop.fs.Path(dir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val rootNorm = new org.apache.hadoop.fs.Path(
          fs.makeQualified(root).toString).toUri.getPath
        val lookup = graft.sources.DvProbe
          .lookupFor(spark, dir, info.dv.get, rootNorm).value
        val bos = new java.io.ByteArrayOutputStream()
        val oos = new java.io.ObjectOutputStream(bos)
        oos.writeObject(lookup); oos.close()
        val bytes = bos.size().toLong
        val positions = lookup.totalPositions
        println(f"dv probe state: $positions%d positions, ${bytes / 1e6}%.1f MB serialized, ${bytes.toDouble / positions}%.2f bytes/position")
        val tRead = timeMs {
          val r = Layout.readSnapshot(spark, dir).agg(count(lit(1)), sum($"v")).head()
          println(s"  dv-filtered read: ${r.getLong(0)} rows")
        }
        Layout.reifyDeletes(spark, dir)
        val tReified = timeMs {
          val r = Layout.readSnapshot(spark, dir).agg(count(lit(1)), sum($"v")).head()
          println(s"  reified read: ${r.getLong(0)} rows")
        }
        println(f"read w/ 2M-position sidecar: ${tRead}%8.1f ms  reified ${tReified}%8.1f ms  (probe overhead ${tRead / tReified}%4.2fx)")
        // TRICKLE shape — the case the round-18 scan SPLIT exists for:
        // one file of 640 carries a handful of positions, so the probe
        // runs on that file alone and the read must cost ~the reified
        // read, not the bulk-probe read above
        val s2 = Layout.deleteWhere(spark, dir, Seq(("k", 100000L, 100009L)), mode = "dv")
        println(s"  trickle dv stats: $s2")
        val tTrickle = timeMs {
          val r = Layout.readSnapshot(spark, dir).agg(count(lit(1)), sum($"v")).head()
          println(s"  trickle dv read: ${r.getLong(0)} rows")
        }
        println(f"read w/ trickle sidecar (1 of 640 files probed): ${tTrickle}%8.1f ms  (reified ${tReified}%8.1f ms)")
      } finally spark.conf.unset(Layout.DvMaxPositionsConf)
    }

    // round 18: the per-file MATERIALIZE threshold bounds sidecar
    // growth — repeated trickle deletes into one file region: pending
    // positions must saw-tooth (grow, then clear when the file crosses
    // the threshold and rewrites), never grow without bound
    {
      val dir = mk("thresh", 8000000L)
      spark.conf.set(Layout.DvMaterializeThresholdConf, "0.25")
      try {
        // ~12.5k rows/file at 640 files: 2k-row slices of ONE file
        for (i <- 0 until 5) {
          val lo = i * 2000L
          val s = Layout.deleteWhere(spark, dir,
            Seq(("k", lo, lo + 1999L)), mode = "dv")
          val pending = graft.sources.Manifest.info(spark, dir).dv match {
            case None => 0L
            case Some(nm) => spark.read
              .parquet(graft.sources.Manifest.dvsPath(dir) + "/" + nm)
              .agg(sum(size($"positions"))).head().getLong(0)
          }
          println(f"  slice $i%d: rewritten=${s.rewrittenFiles}%d pending=$pending%d")
          require(pending < 6500L,
            s"threshold must bound per-file DV growth, got $pending pending")
        }
      } finally spark.conf.unset(Layout.DvMaterializeThresholdConf)
    }
    } // !r19Only

    // round 19: the materialize-threshold pass at a WIDE pending set.
    // An every-16th-key merge-delete marks positions in EVERY file of a
    // 1024-file table, so the pass must price 1024 files — per-file row
    // counts now come from the `.envelopes` index (one metadata-scale
    // read) instead of 1024 serial driver footer opens. Measured as the
    // delta between two identical trickle deletes, threshold on vs off.
    {
      val dir = s"$base/wide"
      val df = spark.range(4000000L).select($"id".as("k"),
        pmod(hash($"id" * 7L), lit(1 << 20)).cast("long").as("v"),
        sha2(concat($"id".cast("string"), lit("pad")), 256).as("payload"))
      Layout.clusterWrite(df, Seq("k"), 1024, dir)
      Layout.writeEnvelopes(spark, dir, Seq("k"))
      spark.conf.set(Layout.DvMaxPositionsConf, "4000000")
      try {
        val src = spark.range(0L, 4000000L, 16L).select($"id".as("k"))
        val s = Layout.merge(spark, dir, src, Seq("k"),
          Seq(Layout.MatchedDelete()), insertUnmatched = false, mode = "dv")
        println(s"  wide dv mark stats: $s (sidecar names every file)")
        val widthRow = {
          val nm = graft.sources.Manifest.info(spark, dir).dv.get
          spark.read.parquet(graft.sources.Manifest.dvsPath(dir) + "/" + nm)
            .agg(countDistinct($"file"), sum(size($"positions"))).head()
        }
        println(s"  pending set: ${widthRow.getLong(0)} files, ${widthRow.getLong(1)} positions")
        require(widthRow.getLong(0) >= 1000L, "fixture must be a >=1k-file pending set")
        def trickle(lo: Long): Double = timeMs {
          Layout.deleteWhere(spark, dir, Seq(("k", lo, lo + 9L)), mode = "dv"); ()
        }
        val tOff = trickle(1000001L) // threshold off: no pass at all
        spark.conf.set(Layout.DvMaterializeThresholdConf, "0.9") // pass runs, nothing crosses
        val tOn = try trickle(2000001L)
        finally spark.conf.unset(Layout.DvMaterializeThresholdConf)
        println(f"trickle delete on the 1024-file pending set: threshold OFF ${tOff}%8.1f ms  ON ${tOn}%8.1f ms  (pass cost ${tOn - tOff}%6.1f ms — one .envelopes read, no footer opens)")
      } finally spark.conf.unset(Layout.DvMaxPositionsConf)
    }

    // round 19: DvProbe broadcast-cache sizing. A topology cycling
    // reads over MORE DV tables than the cache holds re-reads and
    // re-broadcasts a sidecar per cycle; sizing the conf to the table
    // count makes the steady state zero rebuilds.
    {
      val dirs = (0 until 6).map { i =>
        val d = s"$base/cache$i"
        spark.range(200000L).select($"id".as("k"), lit(i.toLong).as("v"),
          lit("c").as("payload")).coalesce(4).write.parquet(d)
        Layout.deleteWhere(spark, d, Seq(("k", 0L, 99L)), mode = "dv")
        d
      }
      def cycle(): Unit = dirs.foreach { d =>
        Layout.readSnapshot(spark, d).agg(count(lit(1))).head(); ()
      }
      def rebuildsOver(n: Int)(body: => Unit): Long = {
        val before = graft.sources.DvProbe.rebuildCount
        (0 until n).foreach(_ => body)
        graft.sources.DvProbe.rebuildCount - before
      }
      spark.conf.set(graft.sources.DvProbe.ProbeCacheSizeConf, "4")
      cycle() // populate at capacity 4
      val thrash = rebuildsOver(3)(cycle())
      spark.conf.set(graft.sources.DvProbe.ProbeCacheSizeConf, "8")
      cycle() // repopulate at capacity 8
      val steady = rebuildsOver(3)(cycle())
      spark.conf.unset(graft.sources.DvProbe.ProbeCacheSizeConf)
      println(s"dv probe cache, 6 tables x 3 cycles: capacity 4 -> $thrash rebuilds, capacity 8 -> $steady rebuilds")
      require(steady == 0L, s"sized cache must rebuild nothing, got $steady")
      require(thrash > 0L, s"undersized cache must thrash, got $thrash")
    }
  }
}
