package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

/** The envelope auto-pruning rule: a PLAIN `read.filter` box scan over a
  * `.envelopes`-indexed table must optimize to a scan over fewer files
  * (zero API change — the round-11 default-on lesson applied to the
  * layout layer), results must be identical to the unpruned plan,
  * staleness must cost I/O only, and non-matching shapes must be left
  * untouched. Queries are built FRESH per conf setting (QueryExecution
  * caches optimized plans). */
class EnvelopePruneSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    EnvelopePruneRule.ensure(s)
    s
  }
  import spark.implicits._

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set(EnvelopePruneRule.ConfKey, on.toString)
    try body
    finally spark.conf.unset(EnvelopePruneRule.ConfKey)
  }

  /** Total file count across the optimized plan's file-source scans. */
  private def scanFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation =>
        r.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }.sum

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def writeClustered(): (String, DataFrame) = {
    val rnd = new scala.util.Random(41)
    val df = (1 to 30000).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = freshDir("env-prune")
    Layout.clusterWrite(df, Seq("x", "y"), 16, dir)
    (dir, df)
  }

  test("a plain read.filter box scan is routed through the index: fewer files, identical rows") {
    val (dir, df) = writeClustered()
    def q() = spark.read.parquet(dir)
      .filter($"x".between(100L, 163L) && $"y".between(100L, 163L))
    val total = spark.read.parquet(dir).inputFiles.length
    val (offFiles, offRows) = withRule(false) { (scanFiles(q()), q().collect().toSet) }
    val (onFiles, onRows)   = withRule(true)  { (scanFiles(q()), q().collect().toSet) }
    assert(offFiles == total, "rule off must leave the full listing")
    assert(onFiles < total, s"rule on opened all $onFiles files - nothing pruned")
    assert(onRows == offRows, "pruning changed RESULTS - exactness broken")
    assert(onRows == df.filter($"x".between(100L, 163L) && $"y".between(100L, 163L))
      .collect().toSet)
  }

  test("single-sided, strict, equality, and IN conjuncts all prune; each stays exact") {
    val (dir, df) = writeClustered()
    val total = spark.read.parquet(dir).inputFiles.length
    def check(mk: DataFrame => DataFrame): Unit = withRule(true) {
      val got = mk(spark.read.parquet(dir))
      assert(scanFiles(got) < total, s"no pruning for ${got.queryExecution.logical}")
      val want = withRule(false)(mk(spark.read.parquet(dir)).collect().toSet)
      assert(got.collect().toSet == want)
    }
    check(_.filter($"x" >= 1000L))              // one-sided range
    check(_.filter($"x" > 999L && $"x" < 1010L)) // strict bounds
    check(_.filter($"x" === 512L))              // equality
    check(_.filter($"x".isin(3L, 5L, 9L)))      // IN hull
    check(_.filter(lit(800L) <= $"y"))          // flipped orientation, trailing dim
  }

  test("staleness is I/O-only: a file appended after the index is still read") {
    val (dir, _) = writeClustered()
    // 5000 is far outside every indexed envelope AND outside none of them
    Seq((120L, 5000L)).toDF("x", "y").write.mode("append").parquet(dir)
    withRule(true) {
      val got = spark.read.parquet(dir).filter($"x" === 120L && $"y" === 5000L)
      assert(got.count() == 1L, "a post-index append was wrongly pruned away")
    }
  }

  test("a box no file can satisfy collapses to an empty local relation") {
    val (dir, _) = writeClustered()
    withRule(true) {
      val got = spark.read.parquet(dir).filter($"x" > 100000L)
      assert(got.queryExecution.optimizedPlan.collectFirst { case l: LocalRelation => l }.isDefined
        || scanFiles(got) == 0, "expected a file-free plan")
      assert(got.count() == 0L)
      assert(got.columns.toSeq == Seq("x", "y"))
    }
  }

  test("declines: no index, unindexed column, non-literal predicate, the index table itself") {
    val rnd = new scala.util.Random(43)
    val df = (1 to 5000).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)).toDF("x", "y")
    val plain = freshDir("env-prune-noidx")
    df.write.parquet(plain)
    withRule(true) {
      val noIdx = spark.read.parquet(plain).filter($"x" > 90L)
      assert(scanFiles(noIdx) == spark.read.parquet(plain).inputFiles.length)
      assert(noIdx.count() == df.filter($"x" > 90L).count())
    }
    val (dir, _) = writeClustered()
    val total = spark.read.parquet(dir).inputFiles.length
    withRule(true) {
      // a filter with NO extractable literal bound on an indexed column
      val nonLit = spark.read.parquet(dir).filter($"x" < $"y")
      assert(scanFiles(nonLit) == total)
      // the .envelopes table is never pruned against itself
      val env = spark.read.parquet(Layout.envelopesPath(dir)).filter($"rows" > 0L)
      assert(env.count() > 0)
    }
  }

  test("all-null files are skipped for non-null box predicates (nulls_ column), exactly") {
    val dir = freshDir("env-prune-nulls")
    Seq[(Option[Long], Long)]((None, 1L), (None, 2L)).toDF("x", "y")
      .coalesce(1).write.parquet(dir)
    Seq[(Option[Long], Long)]((Some(10L), 3L), (Some(20L), 4L)).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val total = spark.read.parquet(dir).inputFiles.length
    assert(total >= 2)
    withRule(true) {
      val got = spark.read.parquet(dir).filter($"x" >= 5L)
      assert(scanFiles(got) < total, "the all-null file was not skipped")
      assert(got.collect().map(_.getLong(1)).toSet == Set(3L, 4L))
      // explicit null-ness conjuncts prune through the nulls_ stats too:
      // IS NOT NULL skips the all-null file, IS NULL the no-null file
      val notNull = spark.read.parquet(dir).filter($"x".isNotNull)
      assert(scanFiles(notNull) < total, "IS NOT NULL did not skip the all-null file")
      assert(notNull.collect().map(_.getLong(1)).toSet == Set(3L, 4L))
      val isNull = spark.read.parquet(dir).filter($"x".isNull)
      assert(scanFiles(isNull) < total, "IS NULL did not skip the zero-null file")
      assert(isNull.collect().map(_.getLong(1)).toSet == Set(1L, 2L))
    }
  }

  test("a hive-partitioned table prunes automatically; partition pruning composes") {
    val rnd = new scala.util.Random(47)
    val df = (1 to 20000).map { i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
    }.toDF("part", "x", "y")
    val dir = freshDir("env-prune-parts")
    df.write.partitionBy("part").parquet(dir)
    // partition column NOT indexed: the composition below must come from
    // Catalyst's own partition pruning stacking on the envelope skip
    // (an INDEXED partition column would subsume it into the envelope
    // anti-join — LayoutSpec's clusterPartitions case covers that path)
    Layout.clusterPartitions(spark, dir, Seq("x", "y"),
      filesPerPartition = 4, indexCols = Nil)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(total == 8)
    withRule(true) {
      // envelope skipping inside partitions, zero API change
      val boxed = spark.read.parquet(dir).filter($"x".between(100L, 163L))
      assert(scanFiles(boxed) < total, "no automatic pruning on the partitioned table")
      val want = withRule(false)(
        spark.read.parquet(dir).filter($"x".between(100L, 163L)).collect().toSet)
      assert(boxed.collect().toSet == want)
      // composed: a partition filter still prunes directories on TOP of
      // the envelope skip - the files actually read sit within one
      // partition AND under the envelope-kept count
      val both = spark.read.parquet(dir)
        .filter($"part" === "a" && $"x".between(100L, 163L))
      both.collect()
      val physical = both.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val read = physical.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
      assert(read < scanFiles(both), // partition pruning subtracted more
        s"partition pruning did not compose: $read files read of ${scanFiles(both)} kept")
      assert(both.count() ==
        df.filter($"part" === "a" && $"x".between(100L, 163L)).count())
    }
  }

  test("per-value IN proofs: a file between two listed values is skipped (hull would keep it)") {
    val dir = freshDir("env-prune-inlist")
    Seq((1L, "lo"), (10L, "lo")).toDF("x", "tag").coalesce(1).write.parquet(dir)
    Seq((5000L, "mid"), (6000L, "mid")).toDF("x", "tag").coalesce(1).write.mode("append").parquet(dir)
    Seq((100000L, "hi"), (100100L, "hi")).toDF("x", "tag").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val total = spark.read.parquet(dir).inputFiles.length
    assert(total == 3)
    withRule(true) {
      // hull [1, 100000] covers the mid file; only per-value proofs skip it
      val got = spark.read.parquet(dir).filter($"x".isin(1L, 100000L))
      assert(scanFiles(got) == 2, "the between-values file was not skipped")
      assert(got.collect().map(_.getLong(0)).toSet == Set(1L, 100000L))
    }
  }

  test("a Project interposed between Filter and scan still prunes (select-then-filter spelling)") {
    val (dir, df) = writeClustered()
    val total = spark.read.parquet(dir).inputFiles.length
    withRule(true) {
      // renamed column: the constraint must resolve through the alias
      def q() = spark.read.parquet(dir)
        .select($"x".as("a"), $"y")
        .filter($"a".between(100L, 163L))
      // pin that the RULE ITSELF handles the un-pushed Filter(Project(scan))
      // shape — apply it directly to the analyzed plan, before pushdown
      // has a chance to normalize it away
      val rule = new EnvelopePruneRule(spark)
      val out = rule(q().queryExecution.analyzed)
      val outFiles = out.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
      }.sum
      assert(outFiles < total, "rule did not prune through the Project")
      // and end-to-end exactness through the normal optimizer path
      assert(q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        df.filter($"x".between(100L, 163L)).select($"x", $"y")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      // a non-deterministic projection declines (conservative guard)
      val nd = spark.read.parquet(dir)
        .select($"x", $"y", rand().as("r"))
        .filter($"x".between(100L, 163L))
      val ndOut = rule(nd.queryExecution.analyzed)
      val ndFiles = ndOut.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
      }.sum
      assert(ndFiles == total, "rule must decline a non-deterministic Project")
    }
  }

  test("a multi-root read prunes each root through its own index; unindexed roots read fully") {
    val (dirA, dfA) = writeClustered()
    val rnd = new scala.util.Random(53)
    val dfB = (1 to 20000).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dirB = freshDir("env-prune-rootB")
    Layout.clusterWrite(dfB, Seq("x", "y"), 16, dirB)
    def q() = spark.read.parquet(dirA, dirB)
      .filter($"x".between(100L, 163L) && $"y".between(100L, 163L))
    val total = spark.read.parquet(dirA, dirB).inputFiles.length
    val (offFiles, offRows) = withRule(false) { (scanFiles(q()), q().collect().toSet) }
    val (onFiles, onRows)   = withRule(true)  { (scanFiles(q()), q().collect().toSet) }
    assert(offFiles == total)
    assert(onFiles < total, "multi-root scan was not pruned")
    assert(onRows == offRows, "multi-root pruning changed RESULTS")
    // one root indexed, one plain: only the indexed root's files prune
    val dirC = freshDir("env-prune-rootC")
    dfB.write.parquet(dirC) // no index
    val plainC = spark.read.parquet(dirC).inputFiles.length
    withRule(true) {
      val mixed = spark.read.parquet(dirA, dirC).filter($"x".between(100L, 163L))
      val kept = scanFiles(mixed)
      assert(kept < spark.read.parquet(dirA, dirC).inputFiles.length)
      assert(kept >= plainC, "files of the unindexed root must never be skipped")
      val want = withRule(false)(
        spark.read.parquet(dirA, dirC).filter($"x".between(100L, 163L)).collect().toSet)
      assert(withRule(true)(spark.read.parquet(dirA, dirC)
        .filter($"x".between(100L, 163L)).collect().toSet) == want)
    }
  }

  test("skip-set cache: LRU eviction bounds retained paths; hot keys survive key cycling") {
    EnvelopePruneRule.clearCache()
    var computes = 0
    def get(k: String, n: Int): Set[String] =
      EnvelopePruneRule.cachedSkipSet((k, "sig", "c")) {
        computes += 1
        (0 until n).map(i => s"/$k/part-$i.parquet").toSet
      }
    try {
      get("a", 10); get("a", 10)
      assert(computes == 1, "a warm key recomputed")
      // three 400k-path entries exceed the ~1M-path budget: the LRU (a
      // first, then the coldest of the rest) is evicted, never the lot
      get("big1", 400000); get("big2", 400000); get("big3", 400000)
      assert(EnvelopePruneRule.retainedPaths <= (1L << 20),
        s"retained ${EnvelopePruneRule.retainedPaths} paths - budget not enforced")
      val c0 = computes
      get("big3", 400000) // most recent: must still be cached
      assert(computes == c0, "the most recently used entry was evicted")
      // cycling distinct keys keeps evicting the coldest, never the lot,
      // and the retained-path bound holds throughout
      (1 to 8).foreach(i => get(s"cycle$i", 400000))
      assert(EnvelopePruneRule.retainedPaths <= (1L << 20))
      assert(EnvelopePruneRule.cacheEntries >= 1)
      // a single entry larger than the whole budget still caches (the
      // query that computed it is about to use it), alone
      EnvelopePruneRule.clearCache()
      get("huge", 1200000)
      assert(EnvelopePruneRule.cacheEntries == 1)
      val c2 = computes
      get("huge", 1200000)
      assert(computes == c2, "the over-budget singleton was not served from cache")
    } finally EnvelopePruneRule.clearCache()
  }

  test("foreachBatch stream-static serving prunes the static side per micro-batch, exactly") {
    val (dir, df) = writeClustered()
    val total = spark.read.parquet(dir).inputFiles.length
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    @volatile var servedFiles = -1
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    spark.conf.set(EnvelopePruneRule.ConfKey, "true")
    val q = mem.toDF().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the q93/q103 serving shape: a boxed read of the indexed static
        // table joined to the micro-batch — inside foreachBatch the plan
        // is a plain batch plan, so the envelope rule must fire on the
        // static side like on any other scan
        val static = spark.read.parquet(dir).filter($"x".between(100L, 163L))
        val served = static.join(batch, static("x") === batch("k"))
        servedFiles = scanFiles(served)
        served.select($"x", $"y").collect().foreach(r => got.add((r.getLong(0), r.getLong(1))))
        ()
      }.start()
    try {
      mem.addData(110L, 120L, 900L)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset(EnvelopePruneRule.ConfKey)
    }
    assert(servedFiles >= 0 && servedFiles < total,
      s"static side of the stream-static serve opened $servedFiles of $total files - no pruning")
    val want = df.filter($"x".isin(110L, 120L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toArray(Array.empty[(Long, Long)]).toSet == want,
      "pruned stream-static serving changed RESULTS")
  }

  test("envelope pruning composes with manifest snapshot reads (skip inside the pinned file set)") {
    val (dir, df) = writeClustered() // clusterWrite: envelopes exist
    graft.sources.Manifest.write(spark, dir)
    withRule(true) {
      // readSnapshot plans over a ManifestFileIndex; the rule wraps it in
      // the delegating SkippingFileIndex like any parquet relation — the
      // skip subtracts from the PINNED set, and retired/backup-resolved
      // paths simply never match the skip set (under-skip, never wrong)
      val snap = Layout.readSnapshot(spark, dir)
        .filter($"x".between(100L, 163L) && $"y".between(100L, 163L))
      val total = Layout.readSnapshot(spark, dir).inputFiles.length
      assert(scanFiles(snap) < total, "no envelope pruning on the snapshot read")
      assert(snap.collect().toSet ==
        df.filter($"x".between(100L, 163L) && $"y".between(100L, 163L)).collect().toSet)
    }
  }

  test("the injected-extensions path prunes and reaches a fixed point (no optimizer loop)") {
    val (dir, df) = writeClustered()
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val got = s2.read.parquet(dir)
        .filter(col("x").between(100L, 163L) && col("y").between(100L, 163L))
      assert(scanFiles(got) < s2.read.parquet(dir).inputFiles.length)
      assert(got.count() ==
        df.filter($"x".between(100L, 163L) && $"y".between(100L, 163L)).count())
    } finally {
      prior.foreach { s => SparkSession.setDefaultSession(s); SparkSession.setActiveSession(s) }
    }
  }

  test("bloom columns refute equality/IN where every min/max hull fails") {
    // x assigned to files by x % 16: EVERY file's [min,max] spans the
    // whole domain, so the range hull proves nothing for any lookup —
    // the bloom is the only possible skip. Values are unique per file
    // (x lives in file x % 16), so an exact index would keep 1 of 16;
    // a bloom keeps 1 + false positives (bounded loosely below).
    val dir = freshDir("env-bloom")
    val df = spark.range(16000).select($"id".as("x"), ($"id" * 7L).as("pay"))
    df.repartition(16, pmod($"x", lit(16))).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"), bloomCols = Seq("x"))
    // hash-partitioning the residue leaves some of the 16 partitions
    // empty — what matters is that EVERY written file's hull spans the
    // domain while each x value lives in exactly one file
    val nFiles = spark.read.parquet(dir).inputFiles.length
    assert(nFiles >= 8, s"fixture needs many files, got $nFiles")

    def eq(v: Long) = spark.read.parquet(dir).filter($"x" === v)
    withRule(true) {
      val q = eq(12345L)
      assert(scanFiles(q) <= nFiles / 3,
        s"bloom should prune most of $nFiles files, scanned ${scanFiles(q)}")
      assert(q.select("pay").as[Long].collect().toSeq == Seq(12345L * 7L))
      // IN: per-value bloom proofs compose — three values, <= three files
      val in = spark.read.parquet(dir).filter($"x".isin(11L, 5000L, 12345L))
      assert(scanFiles(in) <= nFiles / 2, s"IN bloom prune scanned ${scanFiles(in)}")
      assert(in.count() == 3L)
      // an absent value can prune EVERYTHING (empty-relation fold)
      assert(eq(999999L).count() == 0L)
    }
    // identical rows with the rule off
    withRule(false) {
      assert(scanFiles(eq(12345L)) == nFiles, "hull-only would scan everything")
    }

    // a range-only index on the same data cannot prune this shape
    val dir2 = freshDir("env-bloom-ctrl")
    df.repartition(16, pmod($"x", lit(16))).write.parquet(dir2)
    Layout.writeEnvelopes(spark, dir2, Seq("x"))
    withRule(true) {
      assert(scanFiles(spark.read.parquet(dir2).filter($"x" === 12345L)) ==
        spark.read.parquet(dir2).inputFiles.length,
        "control: min/max hulls alone must prove nothing here")
    }

    // mutation verbs preserve the bloom column through the incremental
    // index refresh: delete a box, then the lookup still prunes
    Layout.deleteWhere(spark, dir, Seq(("x", 0L, 15L)))
    EnvelopePruneRule.clearCache()
    withRule(true) {
      val q = eq(12345L)
      assert(scanFiles(q) <= nFiles / 3, s"bloom lost across a mutation: ${scanFiles(q)}")
      assert(q.count() == 1L)
    }

    // STRING keys — the common point-lookup shape (URL / document id) —
    // hash through the same xxhash64 path
    val sdir = freshDir("env-bloom-str")
    spark.range(8000).select(concat(lit("doc-"), $"id").as("k"), $"id".as("v"))
      .repartition(8, pmod($"id", lit(8))).write.parquet(sdir)
    Layout.writeEnvelopes(spark, sdir, Seq("k"), bloomCols = Seq("k"))
    val sFiles = spark.read.parquet(sdir).inputFiles.length
    withRule(true) {
      val q = spark.read.parquet(sdir).filter($"k" === "doc-4321")
      assert(scanFiles(q) <= math.max(2, sFiles / 3),
        s"string bloom lookup scanned ${scanFiles(q)} of $sFiles")
      assert(q.select("v").as[Long].collect().toSeq == Seq(4321L))
    }
  }

  test("a 100-value IN (already InSet by user-rule time) prunes through the batched bloom probe") {
    val dir = freshDir("env-bloom-in100")
    val df = spark.range(16000).select($"id".as("x"), ($"id" * 7L).as("pay"))
    df.repartition(16, pmod($"x", lit(16))).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"), bloomCols = Seq("x"))
    val nFiles = spark.read.parquet(dir).inputFiles.length
    assert(nFiles >= 8, s"fixture needs many files, got $nFiles")
    // 100 values, all ≡ 3 (mod 16): every listed value lives in ONE
    // file while every hull spans the whole domain — only the bloom can
    // prove the other files miss. The list is far past both the
    // per-value proof cap (32) and OptimizeIn's In→InSet threshold
    // (10), so this pins the InSet extraction arm specifically.
    val vals = (0 until 100).map(i => 16L * i + 3L)
    withRule(true) {
      val q = spark.read.parquet(dir).filter($"x".isin(vals: _*))
      assert(scanFiles(q) <= nFiles / 3,
        s"InSet bloom prune scanned ${scanFiles(q)} of $nFiles")
      assert(q.count() == 100L)
      assert(q.agg(sum($"pay")).as[Long].head() == vals.map(_ * 7L).sum)
    }
    withRule(false) {
      assert(scanFiles(spark.read.parquet(dir).filter($"x".isin(vals: _*))) == nFiles,
        "hull-only would scan everything")
    }
  }
}
