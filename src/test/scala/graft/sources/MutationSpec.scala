package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mutation verbs (deleteWhere / upsert): file-level work
  * classification over the envelope index (drop whole / rewrite /
  * untouched), exact results incl. SQL null semantics, manifest
  * time travel across a mutation, the no-index degradation, and the
  * loud guards. */
class MutationSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def leafFiles(dir: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toSeq.sortBy(_._1)
  }

  test("deleteWhere: drop-whole / rewrite / untouched classification, exact rows, time travel") {
    val dir = freshDir("graft-del")
    // four single-file chunks with known x-ranges:
    //   A [0,99]    entirely inside the delete box -> dropped whole
    //   B [200,299] disjoint                        -> untouched
    //   C [100,199] straddles the box edge          -> rewritten
    //   D all-null x                                -> untouched (nulls never match)
    (0L to 99L).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    (100L to 199L).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    Seq.fill(10)(Option.empty[Long]).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val bFile = leafFiles(dir) // captured for the untouched check below

    val stats = Layout.deleteWhere(spark, dir, Seq(("x", 0L, 150L)))
    assert(stats == Layout.MutationStats(droppedFiles = 1, rewrittenFiles = 1,
      untouchedFiles = 2), s"classification: $stats")
    val xs = spark.read.parquet(dir).as[Option[Long]].collect()
    assert(xs.flatten.sorted.toSeq == (151L to 299L), "exactly the box deleted")
    assert(xs.count(_.isEmpty) == 10, "null rows never match a box")
    // untouched files really were not rewritten (same names + mtimes)
    val after = leafFiles(dir).toMap
    assert(bFile.count { case (n, m) => after.get(n).contains(m) } == 2)
    // the index followed the mutation: it covers exactly the current files
    val idxFiles = spark.read.parquet(Layout.envelopesPath(dir))
      .select("file").distinct().collect().map(r => Layout.normPath(r.getString(0))).toSet
    assert(idxFiles == spark.read.parquet(dir).inputFiles.map(Layout.normPath).toSet)
    // TIME TRAVEL: the pre-delete snapshot still resolves (retired files)
    val seqNow = Manifest.latestSeq(spark, dir).get
    assert(Layout.readSnapshot(spark, dir, Some(seqNow - 1)).count() == 310L)
    assert(Layout.readSnapshot(spark, dir).count() == 159L)
    // steady state: the same delete again touches nothing
    assert(Layout.deleteWhere(spark, dir, Seq(("x", 0L, 150L))) ==
      Layout.MutationStats(0, 0, 3))
  }

  test("upsert: replace matched keys, insert new ones, skip key-disjoint files") {
    val dir = freshDir("graft-ups")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    val updates = ((50L to 59L) ++ (1000L to 1004L)).map(k => (k, -k)).toDF("k", "v")
    val stats = Layout.upsert(spark, dir, updates, "k")
    assert(stats == Layout.MutationStats(droppedFiles = 0, rewrittenFiles = 1,
      untouchedFiles = 1), s"classification: $stats")
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got.size == 205)
    assert((0L to 49L).forall(k => got(k) == k * 10L), "unmatched rows intact")
    assert((50L to 59L).forall(k => got(k) == -k), "matched keys replaced")
    assert((1000L to 1004L).forall(k => got(k) == -k), "new keys inserted")
    assert((200L to 299L).forall(k => got(k) == k * 10L), "disjoint file intact")
    // guards: duplicate and null keys fail loudly
    intercept[IllegalArgumentException] {
      Layout.upsert(spark, dir, Seq((1L, 1L), (1L, 2L)).toDF("k", "v"), "k")
    }
    intercept[IllegalArgumentException] {
      Layout.upsert(spark, dir,
        Seq((Option.empty[Long], 1L)).toDF("k", "v"), "k")
    }
  }

  test("partitioned tables: delete and upsert rewrite inside leaves, other leaves untouched") {
    val dir = freshDir("graft-mut-part")
    val df = (1 to 3000).map(i => (i % 3, i.toLong, i * 2L)).toDF("g", "x", "v")
    df.write.partitionBy("g").parquet(dir)
    Layout.clusterPartitions(spark, dir, Seq("x"), filesPerPartition = 2,
      indexCols = Seq("g"))
    def leafFilesOf(leaf: String) = leafFiles(s"$dir/$leaf")
    val g0 = leafFilesOf("g=0"); val g2 = leafFilesOf("g=2")

    // DELETE g=1 AND x<=1000: only the g=1 leaf is touched
    val stats = Layout.deleteWhere(spark, dir, Seq(("g", 1L, 1L), ("x", 0L, 1000L)))
    assert(stats.droppedFiles + stats.rewrittenFiles >= 1 && stats.untouchedFiles >= 4,
      s"only g=1 files may be touched: $stats")
    assert(leafFilesOf("g=0") == g0 && leafFilesOf("g=2") == g2,
      "untouched leaves must not be rewritten")
    val after = spark.read.parquet(dir).select("g", "x", "v")
      .as[(Int, Long, Long)].collect().toSet
    val expect = (1 to 3000).map(i => (i % 3, i.toLong, i * 2L))
      .filterNot { case (g, x, _) => g == 1 && x <= 1000L }.toSet
    assert(after == expect, "exactly the (g=1, x<=1000) rows deleted; partition values intact")

    // UPSERT by x: replace one g=0 row, insert a new key (lands in its leaf)
    val updates = Seq((0, 3L, -30L), (0, 3003L, -1L)).toDF("g", "x", "v")
    val s2 = Layout.upsert(spark, dir, updates, "x")
    assert(s2.rewrittenFiles >= 1, s"candidate leaf file must rewrite: $s2")
    val m = spark.read.parquet(dir).select("x", "v", "g")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(3L) == ((-30L, 0)), "matched key replaced, partition value kept")
    assert(m(3003L) == ((-1L, 0)), "new key inserted under its partition")
    assert(m(6L) == ((12L, 0)), "unmatched rows intact")
  }

  test("no index: deleteWhere degrades to rewriting everything — still exact") {
    val dir = freshDir("graft-del-noidx")
    (0L to 99L).toDF("x").coalesce(2).write.parquet(dir)
    val stats = Layout.deleteWhere(spark, dir, Seq(("x", 10L, 19L)))
    assert(stats.droppedFiles == 0 && stats.untouchedFiles == 0 &&
      stats.rewrittenFiles == 2, s"no index -> all rewritten: $stats")
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      ((0L to 9L) ++ (20L to 99L)))
  }

  test("deleting every row fails loudly (manifests cannot commit an empty table)") {
    val dir = freshDir("graft-del-all")
    (0L to 9L).toDF("x").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    intercept[IllegalArgumentException] {
      Layout.deleteWhere(spark, dir, Seq(("x", 0L, 9L)))
    }
  }

  test("stray files appended since the last commit fail the mutation loudly") {
    val dir = freshDir("graft-del-stray")
    (0L to 99L).toDF("x").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Manifest.write(spark, dir) // committed snapshot = this one file
    // a plain append the writer-exclusive contract does not expect:
    // rows 10..19 of it match the delete box but classification cannot
    // see them — the verb must refuse, not silently keep them
    (10L to 19L).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      Layout.deleteWhere(spark, dir, Seq(("x", 10L, 19L)))
    }
    assert(ex.getMessage.contains("not in the committed snapshot"), ex.getMessage)
    // the stated remedy works: commit, then the delete sees every file
    Manifest.write(spark, dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Layout.deleteWhere(spark, dir, Seq(("x", 10L, 19L)))
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      ((0L to 9L) ++ (20L to 99L)))
  }

  test("a no-op mutation commits nothing: same manifest seq, no index churn") {
    val dir = freshDir("graft-del-noop")
    (0L to 99L).toDF("x").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val s0 = Layout.deleteWhere(spark, dir, Seq(("x", 0L, 9L))) // bootstraps + mutates
    assert(s0.rewrittenFiles + s0.droppedFiles >= 1)
    val seqBefore = Manifest.latestSeq(spark, dir).get
    val envBefore = leafFiles(Layout.envelopesPath(dir))
    // box provably disjoint from every file -> untouched everywhere
    val s1 = Layout.deleteWhere(spark, dir, Seq(("x", 1000L, 2000L)))
    assert(s1 == Layout.MutationStats(0, 0, s0.untouchedFiles + s0.rewrittenFiles),
      s"no-op classification: $s1")
    assert(Manifest.latestSeq(spark, dir).contains(seqBefore), "no manifest churn")
    assert(leafFiles(Layout.envelopesPath(dir)) == envBefore, "no index churn")
  }

  test("append: snapshot adopts the rows, index stays exact (agg gate passes), no stray guard") {
    val dir = freshDir("graft-append")
    (0L to 99L).map(x => (x, x % 5)).toDF("x", "g").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    Manifest.write(spark, dir)
    val seqBefore = Manifest.latestSeq(spark, dir).get
    val s1 = Layout.append(spark, dir, (100L to 149L).map(x => (x, x % 5)).toDF("x", "g"))
    assert(s1 == seqBefore + 1)
    assert(Layout.readSnapshot(spark, dir).count() == 150L, "snapshot adopted the rows")
    // the envelope index followed incrementally: the stats-agg rule's
    // exact file-set gate must still pass (count answers from the index)
    graft.plans.EnvelopeAggRule.ensure(spark)
    val agg = spark.read.parquet(dir).agg(count(lit(1)).as("n"), max($"x").as("mx"))
    val roots = agg.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(roots.nonEmpty && roots.forall(_.endsWith(".envelopes")),
      s"post-append agg must still answer from the index:\n${agg.queryExecution.optimizedPlan}")
    assert(agg.head() == org.apache.spark.sql.Row(150L, 149L))
    // and a mutation right after append passes the stray guard
    val del = Layout.deleteWhere(spark, dir, Seq(("x", 100L, 149L)))
    assert(del.droppedFiles + del.rewrittenFiles >= 1)
    assert(spark.read.parquet(dir).agg(count(lit(1))).head().getLong(0) == 100L)

    // partitioned: appended rows land under their own leaves
    val pdir = freshDir("graft-append-part")
    (0 to 99).map(i => (i % 4, i.toLong)).toDF("p", "x")
      .write.partitionBy("p").parquet(pdir)
    Manifest.write(spark, pdir)
    Layout.append(spark, pdir, Seq((9, 1000L), (9, 1001L)).toDF("p", "x"))
    val snap = Layout.readSnapshot(spark, pdir)
    assert(snap.filter($"p" === 9).count() == 2L, "new partition leaf adopted")
    assert(snap.count() == 102L)
    // missing column fails loudly
    val ex = intercept[IllegalArgumentException] {
      Layout.append(spark, pdir, Seq(1L).toDF("x"))
    }
    assert(ex.getMessage.contains("missing table column"), ex.getMessage)
    // an EXTRA column fails loudly too — silently dropping it loses data
    val ex2 = intercept[IllegalArgumentException] {
      Layout.append(spark, pdir, Seq((9, 1L, "oops")).toDF("p", "x", "z"))
    }
    assert(ex2.getMessage.contains("does not have"), ex2.getMessage)
  }

  test("updateWhere: simultaneous assignments inside the box only; disjoint files untouched") {
    val dir = freshDir("graft-upd-where")
    (0L to 99L).map(x => (x, x * 10L)).toDF("a", "b")
      .coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x * 10L)).toDF("a", "b")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("a"))
    val before = leafFiles(dir)
    // SQL UPDATE semantics: every RHS sees the ORIGINAL row — a swap
    val stats = Layout.updateWhere(spark, dir, Seq(("a", 10L, 19L)),
      Seq("a" -> col("b"), "b" -> col("a")))
    assert(stats == Layout.MutationStats(0, 1, 1), s"one candidate file: $stats")
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert((10L to 19L).forall(x => got(x * 10L) == x), "swap applied with original RHS")
    assert((0L to 9L).forall(x => got(x) == x * 10L), "outside the box untouched")
    assert((200L to 299L).forall(x => got(x) == x * 10L), "disjoint file intact")
    // the untouched file was truly not rewritten
    val after = leafFiles(dir).toMap
    assert(before.count { case (n, m) => after.get(n).contains(m) } == 1)
    // store-assignment: types preserved even when the RHS widens
    Layout.updateWhere(spark, dir, Seq(("a", 0L, 0L)),
      Seq("b" -> (col("b").cast("double") + 0.9)))
    assert(spark.read.parquet(dir).schema("b").dataType ==
      org.apache.spark.sql.types.LongType, "assignment cast back to the column type")
  }

  test("upsert classification is an interval stab (equi-join), never a nested-loop between-join") {
    val dir = freshDir("graft-ups-stab")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // the stab itself: same shape upsert's classify builds — assert no BNLJ
    val env = spark.read.parquet(Layout.envelopesPath(dir))
      .select(col("file"), col("min_k").cast("long").as("f_start"),
        col("max_k").cast("long").as("f_end"))
    val pts = Seq(50L, 250L).toDF("k_pt")
    val stab = graft.operators.IntervalJoin.pointInInterval(
      pts, env, Nil, "k_pt", "f_start", "f_end", 100L)
    val plan = stab.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"classification degraded to a nested-loop join:\n$plan")
    // and end-to-end it still classifies correctly
    val stats = Layout.upsert(spark, dir, Seq((50L, -1L)).toDF("k", "v"), "k")
    assert(stats == Layout.MutationStats(0, 1, 1), s"stab classification: $stats")
    assert(spark.read.parquet(dir).filter(col("k") === 50L)
      .select("v").as[Long].head() == -1L)
  }

  test("string-key upsert: prefix stab classifies without a nested loop; range-disjoint file untouched") {
    val dir = freshDir("graft-ups-str")
    (0 to 99).map(i => (f"doc-$i%05d", i.toLong)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (200 to 299).map(i => (f"doc-$i%05d", i.toLong)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // the prefix-long stab shape upsert's classify builds for strings —
    // pinned BNLJ-free like the numeric stab
    val pv: org.apache.spark.sql.Column => org.apache.spark.sql.Column = c =>
      conv(rpad(substring(hex(encode(c, "UTF-8")), 1, 14), 14, "0"), 16, 10).cast("long")
    val env = spark.read.parquet(Layout.envelopesPath(dir))
      .select(col("file"), pv(col("min_k")).as("f_start"), pv(col("max_k")).as("f_end"),
        col("min_k").as("f_min"), col("max_k").as("f_max"))
    val pts = Seq("doc-00050").toDF("k_val").select(col("k_val"), pv(col("k_val")).as("k_pt"))
    val stab = graft.operators.IntervalJoin.pointInInterval(
      pts, env, Nil, "k_pt", "f_start", "f_end", 1L << 40)
      .filter(col("k_val") >= col("f_min") && col("k_val") <= col("f_max"))
    val plan = stab.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"string-key classification degraded to a nested-loop join:\n$plan")
    // end-to-end: only the file whose string range holds the key rewrites
    val stats = Layout.upsert(spark, dir, Seq(("doc-00050", -1L)).toDF("k", "v"), "k")
    assert(stats == Layout.MutationStats(0, 1, 1), s"string stab classification: $stats")
    val got = spark.read.parquet(dir).as[(String, Long)].collect().toMap
    assert(got("doc-00050") == -1L && got("doc-00250") == 250L && got.size == 200)
  }

  test("string-key upsert: bloom refutes hull-covered files (interleaved keys, overlapping ranges)") {
    val dir = freshDir("graft-ups-str-bloom")
    // both files' [min,max] string hulls cover the update key "z050":
    // range proofs alone rewrite BOTH; the per-file bloom must refute A
    val a = ((0 to 99).map(i => (f"a$i%03d", 0L)) :+ ("z999" -> 0L)).toDF("k", "v")
    val b = ((0 to 99).map(i => (f"z$i%03d", 0L)) :+ ("a500" -> 0L)).toDF("k", "v")
    a.coalesce(1).write.mode("append").parquet(dir)
    b.coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"), bloomCols = Seq("k"))
    val stats = Layout.upsert(spark, dir, Seq(("z050", -5L)).toDF("k", "v"), "k")
    assert(stats == Layout.MutationStats(0, 1, 1),
      s"bloom should refute the hull-covered file holding no z050: $stats")
    val got = spark.read.parquet(dir).as[(String, Long)].collect().toMap
    assert(got("z050") == -5L && got("z999") == 0L && got.size == 202)
  }

  test("upsertKeyed: composite key matches on ALL columns; duplicates across the pair rejected") {
    val dir = freshDir("graft-ups-multi")
    Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 30L)).toDF("g", "i", "v")
      .coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("g", "i"))
    // (1,2) replaces exactly that row — (1,1) and (2,1) share a g or an i
    // with it and must survive; (9,9) inserts
    val stats = Layout.upsertKeyed(spark, dir,
      Seq((1L, 2L, -20L), (9L, 9L, 90L)).toDF("g", "i", "v"), Seq("g", "i"))
    assert(stats.rewrittenFiles == 1L, s"$stats")
    val got = spark.read.parquet(dir).as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 10L), (1L, 2L, -20L), (2L, 1L, 30L), (9L, 9L, 90L)))
    // composite uniqueness is over the PAIR: (1,1) twice must throw
    val ex = intercept[IllegalArgumentException](Layout.upsertKeyed(spark, dir,
      Seq((1L, 1L, 0L), (1L, 1L, 1L)).toDF("g", "i", "v"), Seq("g", "i")))
    assert(ex.getMessage.contains("not unique"))
    // but two rows sharing only ONE component are a fine composite key
    Layout.upsertKeyed(spark, dir,
      Seq((5L, 1L, 51L), (5L, 2L, 52L)).toDF("g", "i", "v"), Seq("g", "i"))
    assert(spark.read.parquet(dir).count() == 6)
  }

  test("composite key with a near-constant leading column still classifies at file grain") {
    val dir = freshDir("graft-ups-lowcard")
    // the corpus-pipeline composite-key shape: (source, doc_id) where the
    // LEADING column has 2 distinct values covering every file's hull —
    // a head-only stab candidates EVERYTHING; the per-column union must
    // prove the i-disjoint file missed through its second component
    (0L to 99L).map(i => (if (i % 2 == 0) "web" else "books", i, i))
      .toDF("src", "i", "v").coalesce(1).write.mode("append").parquet(dir)
    (500L to 599L).map(i => (if (i % 2 == 0) "web" else "books", i, i))
      .toDF("src", "i", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("src", "i"))
    val ups = Seq(("web", 10L, -1L), ("books", 11L, -2L)).toDF("src", "i", "v")
    val stats = Layout.upsertKeyed(spark, dir, ups, Seq("src", "i"))
    assert(stats == Layout.MutationStats(0, 1, 1),
      s"the i-disjoint file must classify untouched despite the covered leading key: $stats")
    val got = spark.read.parquet(dir).as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("web", 10L)) == -1L && got(("books", 11L)) == -2L)
    assert(got(("web", 500L)) == 500L && got.size == 200)
  }

  test("unsupported key types decline loudly instead of planning a nested loop") {
    val dir = freshDir("graft-ups-badkey")
    Seq((true, 1L), (false, 2L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    val ex = intercept[IllegalArgumentException] {
      Layout.upsert(spark, dir, Seq((true, -1L)).toDF("k", "v"), "k")
    }
    assert(ex.getMessage.contains("sound file-stab view") &&
      ex.getMessage.contains("surrogate"), ex.getMessage)
    // a COMPOSITE key with one unsupported component still runs: the
    // unsupported column contributes an empty miss proof (sound — the
    // per-column proofs are unioned) and classification prunes through
    // the stab-able column alone
    val bdir = freshDir("graft-ups-binkey")
    Seq((Array[Byte](1), 1L, 10L), (Array[Byte](2), 2L, 20L))
      .toDF("k", "v", "w").coalesce(1).write.mode("append").parquet(bdir)
    Seq((Array[Byte](3), 100L, 30L))
      .toDF("k", "v", "w").coalesce(1).write.mode("append").parquet(bdir)
    Layout.writeEnvelopes(spark, bdir, Seq("v"))
    val stats = Layout.upsertKeyed(spark, bdir,
      Seq((Array[Byte](1), 1L, -1L)).toDF("k", "v", "w"), Seq("v", "k"))
    assert(stats.untouchedFiles == 1L && stats.rewrittenFiles == 1L,
      s"the v-disjoint file must classify untouched through the long component: $stats")
    val got = spark.read.parquet(bdir).select($"k", $"v", $"w")
      .as[(Array[Byte], Long, Long)].collect()
      .map(r => (r._1.toSeq, r._2) -> r._3).toMap
    assert(got((Seq[Byte](1), 1L)) == -1L && got((Seq[Byte](2), 2L)) == 20L &&
      got((Seq[Byte](3), 100L)) == 30L && got.size == 3)
  }

  test("insert-only merge accepts duplicate unmatched source keys (SQL cardinality rule)") {
    val dir = freshDir("graft-merge-insonly")
    (0L to 9L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // two source rows with the SAME unmatched key: both insert (no
    // matched arm exists, so no target row has two source matches)
    val src = Seq((100L, 1L), (100L, 2L), (5L, -5L)).toDF("k", "v")
    val stats = Layout.merge(spark, dir, src, Seq("k"),
      matched = Nil, insertUnmatched = true)
    assert(stats.rewrittenFiles == 0L, s"insert-only must rewrite nothing: $stats")
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toSeq
    assert(got.count(_._1 == 100L) == 2, "both duplicate-key rows inserted")
    assert(got.count(_._1 == 5L) == 1 && got.find(_._1 == 5L).get._2 == 5L,
      "matched key NOT touched by an insert-only merge")
    assert(got.size == 12)
    // with a matched arm the same duplicates are the cardinality error
    val ex = intercept[IllegalArgumentException](Layout.merge(spark, dir,
      Seq((100L, 1L), (100L, 2L)).toDF("k", "v"), Seq("k"),
      Seq(Layout.MatchedUpdateAll())))
    assert(ex.getMessage.contains("not unique"), ex.getMessage)
  }

  test("a commit between merge's classification and its moves is a detected conflict") {
    val dir = freshDir("graft-merge-pin")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    Manifest.write(spark, dir)
    // the interleaving the seq pinning closes: a foreign commit lands
    // AFTER merge classified (snapshot + candidate sets built) but
    // BEFORE mutateFiles moves anything — the pre-move re-check must
    // see the pinned seq superseded and abort with nothing moved
    Layout.raceHooks.preMutate = () => { Manifest.write(spark, dir); () }
    spark.conf.set(Layout.MutationMaxRetriesConf, "0") // pin fail-fast
    try {
      val ex = intercept[java.util.ConcurrentModificationException] {
        Layout.merge(spark, dir, Seq((5L, -5L)).toDF("k", "v"), Seq("k"),
          Seq(Layout.MatchedUpdateAll()))
      }
      assert(ex.getMessage.contains("NOTHING"), ex.getMessage)
      Layout.raceHooks.reset()
      assert(Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().toMap
        .apply(5L) == 5L, "aborted merge changed nothing")
    } finally {
      Layout.raceHooks.reset()
      spark.conf.unset(Layout.MutationMaxRetriesConf)
    }
  }

  test("conditioned BY SOURCE arms classify through envelope refutation; unconditioned stay full") {
    import org.apache.spark.sql.functions.col
    val dir = freshDir("graft-merge-bysrc-env")
    // file A: ds=1, k 0..99; file B: ds=2, k 200..299 — the retention-
    // sync shape: the by-source delete is conditioned on ds=1, so file B
    // (envelope-refuted on ds AND key-stab-missed) must stay untouched
    (0L to 99L).map(k => (1L, k, k)).toDF("ds", "k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (2L, k, k)).toDF("ds", "k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("ds", "k"))
    val src = (0L to 49L).map(k => (1L, k, -k)).toDF("ds", "k", "v")
    val stats = Layout.merge(spark, dir, src, Seq("k"),
      Seq(Layout.MatchedUpdateAll()), insertUnmatched = false,
      notMatchedBySource = Seq(Layout.MatchedDelete(Some(col("ds") === 1L))))
    assert(stats == Layout.MutationStats(0, 1, 1),
      s"ds=2 file must be envelope-refuted AND key-missed: $stats")
    val got = spark.read.parquet(dir).select("k", "v").as[(Long, Long)].collect().toMap
    assert((0L to 49L).forall(k => got(k) == -k), "matched rows updated")
    assert((50L to 99L).forall(k => !got.contains(k)), "conditioned sync deleted ds=1 leftovers")
    assert((200L to 299L).forall(k => got(k) == k), "refuted file intact")
    // an UNCONDITIONED by-source arm keeps the honest full-candidacy
    val s2 = Layout.merge(spark, dir,
      spark.read.parquet(dir).select("ds", "k", "v"), Seq("k"),
      Seq(Layout.MatchedUpdateAll()), insertUnmatched = false,
      notMatchedBySource = Seq(Layout.MatchedDelete()))
    assert(s2.untouchedFiles == 0L, s"unconditioned sync must candidate everything: $s2")
    // an UNPROVABLE condition (expression over the column) also declines
    // to full candidacy — never a wrong skip
    val s3 = Layout.merge(spark, dir,
      Seq((1L, 0L, 0L)).toDF("ds", "k", "v"), Seq("k"),
      Seq(Layout.MatchedUpdateAll()), insertUnmatched = false,
      notMatchedBySource = Seq(Layout.MatchedDelete(Some(col("ds") % 2 === 0L))))
    assert(s3.untouchedFiles == 0L, s"unprovable condition must not skip: $s3")
  }

  test("merge: conditional arms via the Scala API, _src_ columns, key-disjoint files skipped") {
    import org.apache.spark.sql.functions.col
    val dir = freshDir("graft-merge")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (500L to 599L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // conditional update, NO unmatched insert: proposals for 90..110,
    // taken only when _src_v > t.v (always here), 100..110 NOT inserted
    val src = (90L to 110L).map(k => (k, k + 1000L)).toDF("k", "v")
    val s1 = Layout.merge(spark, dir, src, Seq("k"),
      Seq(Layout.MatchedUpdateAll(Some(col("_src_v") > col("v")))),
      insertUnmatched = false)
    assert(s1.untouchedFiles == 1L && s1.rewrittenFiles == 1L,
      s"key-disjoint 500s file must classify untouched: $s1")
    val got1 = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got1.size == 200, "insertUnmatched=false adds nothing")
    assert((90L to 99L).forall(k => got1(k) == k + 1000L), "condition held, replaced")
    assert(got1(89L) == 89L && got1(500L) == 500L)
    // conditional delete on the target side
    val s2 = Layout.merge(spark, dir,
      (0L to 9L).map(k => (k, 0L)).toDF("k", "v"), Seq("k"),
      Seq(Layout.MatchedDelete(Some(col("v") < 5L))), insertUnmatched = false)
    // s1's rewrite may have split its replacement across several files;
    // only the one(s) holding k 0..9 rewrite here, the rest stab out
    assert(s2.rewrittenFiles >= 1L && s2.droppedFiles == 0L &&
      s2.untouchedFiles >= 1L, s"$s2")
    val got2 = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got2.size == 195 && !got2.contains(0L) && got2.contains(5L))
    // a fully key-disjoint source is a clean no-op (no commit churn)
    val seqBefore = Manifest.latestSeq(spark, dir)
    val s3 = Layout.merge(spark, dir,
      Seq((9999L, 1L)).toDF("k", "v"), Seq("k"),
      Seq(Layout.MatchedDelete()), insertUnmatched = false)
    assert(s3.droppedFiles == 0L && s3.rewrittenFiles == 0L, s"$s3")
    assert(Manifest.latestSeq(spark, dir) == seqBefore, "no-op must not commit")
    // the _src_ prefix collision guard fires loudly
    val ex = intercept[IllegalArgumentException](Layout.merge(spark, dir,
      Seq((1L, 2L, 3L)).toDF("k", "v", "_src_v"), Seq("k"),
      Seq(Layout.MatchedUpdateAll())))
    assert(ex.getMessage.contains("_src_"))
  }

  test("double-keyed upsert: truncation stab classifies without a nested loop; NaN is conservative") {
    val dir = freshDir("graft-ups-dbl")
    (0 until 100).map(i => (i * 1.5, i.toLong)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (0 until 100).map(i => (5000.0 + i * 1.5, i.toLong)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // key range [30, 60] lives only in the first file — the second must
    // classify untouched through the trunc-view stab
    val ups = Seq((30.0, -1L), (31.5, -2L)).toDF("k", "v")
    val stats = Layout.upsert(spark, dir, ups, "k")
    assert(stats == Layout.MutationStats(0, 1, 1), s"trunc stab classification: $stats")
    val got = spark.read.parquet(dir).as[(Double, Long)].collect().toMap
    assert(got(30.0) == -1L && got(31.5) == -2L && got.size == 200)
    // a file CONTAINING NaN has a NaN max — its long view is null, so
    // it can never be proven missed (conservative: always rewritten)
    val ndir = freshDir("graft-ups-nan")
    Seq((1.0, 1L), (Double.NaN, 2L)).toDF("k", "v").coalesce(1).write.parquet(ndir)
    Layout.writeEnvelopes(spark, ndir, Seq("k"))
    // a NaN UPDATE key must replace the NaN row (Spark joins NaN = NaN)
    val s2 = Layout.upsert(spark, ndir, Seq((Double.NaN, -9L)).toDF("k", "v"), "k")
    assert(s2.rewrittenFiles == 1L, s"NaN-holding file must stay a candidate: $s2")
    val got2 = spark.read.parquet(ndir).as[(Double, Long)].collect()
    assert(got2.exists(r => r._1.isNaN && r._2 == -9L) && got2.length == 2, got2.toSeq.toString)
  }

  test("racing deleteWhere calls: exactly one wins; the loser aborts having moved nothing") {
    import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}
    val dir = freshDir("graft-race-abort")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    Manifest.write(spark, dir)
    // both mutations classify against the SAME snapshot (the barrier),
    // then the loser holds at the pre-move re-check until the winner's
    // commit has landed — the deterministic worst-case interleaving
    val barrier = new CyclicBarrier(2)
    val winnerDone = new CountDownLatch(1)
    Layout.raceHooks.preRetire = () => {
      barrier.await(60, TimeUnit.SECONDS)
      if (Thread.currentThread().getName == "graft-loser")
        assert(winnerDone.await(60, TimeUnit.SECONDS))
      ()
    }
    spark.conf.set(Layout.MutationMaxRetriesConf, "0") // pin the fail-fast contract
    try {
      val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Layout.MutationStats]]()
      def run(name: String, lo: Long, hi: Long): Thread = {
        val t = new Thread(() => {
          try results.put(name, Right(Layout.deleteWhere(spark, dir, Seq(("k", lo, hi)))))
          catch { case e: Throwable => results.put(name, Left(e)) }
        }, name)
        t.start(); t
      }
      val w = run("graft-winner", 0L, 9L)
      new Thread(() => { w.join(); winnerDone.countDown() }).start()
      val l = run("graft-loser", 200L, 209L)
      w.join(120000); l.join(120000)
      assert(results.get("graft-winner").isRight, s"winner: ${results.get("graft-winner")}")
      results.get("graft-loser") match {
        case Left(e: java.util.ConcurrentModificationException) =>
          assert(e.getMessage.contains("NOTHING"), e.getMessage)
        case other => fail(s"loser should have aborted with CME: $other")
      }
      // the loser's table state IS the winner's snapshot: its own box intact
      val got = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
      assert(got == ((10L to 99L) ++ (200L to 299L)).toSet, "winner applied, loser not")
      // zero strays: the next mutation's stray guard passes and is exact
      Layout.raceHooks.reset()
      Layout.deleteWhere(spark, dir, Seq(("k", 200L, 209L)))
      val after = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
      assert(after == ((10L to 99L) ++ (210L to 299L)).toSet)
    } finally {
      Layout.raceHooks.reset()
      spark.conf.unset(Layout.MutationMaxRetriesConf)
    }
  }

  test("optimistic retry: the conflict loser re-pins, re-classifies, and commits (both writers land)") {
    import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}
    val dir = freshDir("graft-race-retry")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    Manifest.write(spark, dir)
    // same deterministic worst case as the fail-fast test — both FIRST
    // attempts classify against the same snapshot, the loser holds at
    // the pre-move re-check until the winner committed — but with the
    // default retries the loser's SECOND attempt (hook disarmed for it)
    // re-pins the winner's snapshot and commits
    val barrier = new CyclicBarrier(2)
    val winnerDone = new CountDownLatch(1)
    val firstAttempt = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    firstAttempt.add("graft-winner"); firstAttempt.add("graft-loser")
    Layout.raceHooks.preRetire = () => {
      if (firstAttempt.remove(Thread.currentThread().getName)) {
        barrier.await(60, TimeUnit.SECONDS)
        if (Thread.currentThread().getName == "graft-loser")
          assert(winnerDone.await(60, TimeUnit.SECONDS))
      }
      ()
    }
    try {
      val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Layout.MutationStats]]()
      def run(name: String, lo: Long, hi: Long): Thread = {
        val t = new Thread(() => {
          try results.put(name, Right(Layout.deleteWhere(spark, dir, Seq(("k", lo, hi)))))
          catch { case e: Throwable => results.put(name, Left(e)) }
        }, name)
        t.start(); t
      }
      val w = run("graft-winner", 0L, 9L)
      new Thread(() => { w.join(); winnerDone.countDown() }).start()
      val l = run("graft-loser", 200L, 209L)
      w.join(120000); l.join(120000)
      assert(results.get("graft-winner").isRight, s"winner: ${results.get("graft-winner")}")
      assert(results.get("graft-loser").isRight,
        s"loser must RETRY and commit: ${results.get("graft-loser")}")
      // BOTH mutations applied — serialized commits, no error
      val got = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
      assert(got == ((10L to 99L) ++ (210L to 299L)).toSet, "both writers landed")
      assert(Manifest.listLive(spark, dir).size ==
        Manifest.info(spark, dir).files.size, "no strays either way")
    } finally Layout.raceHooks.reset()
  }

  test("a commit lost in the final CAS window heals: promoted files deleted, originals un-retired") {
    val dir = freshDir("graft-race-heal")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    val seq0 = Manifest.write(spark, dir)
    val filesBefore = leafFiles(dir).map(_._1).toSet
    // the competing writer: a no-change commit (a bare Manifest.write
    // whose listing predates our moves) whose CAS lands INSIDE the
    // window between our re-check and our writeSeq — simulated by
    // copying m<seq0>'s body to m<seq0+1> at the preCommit seam
    Layout.raceHooks.preCommit = () => {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val md = Manifest.manifestsPath(dir)
      val src = new org.apache.hadoop.fs.Path(md, f"m$seq0%020d")
      val dst = new org.apache.hadoop.fs.Path(md, f"m${seq0 + 1}%020d")
      val in = fs.open(src)
      val out = fs.create(dst, false)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024)
      finally { in.close(); out.close() }
      ()
    }
    spark.conf.set(Layout.MutationMaxRetriesConf, "0") // pin fail-fast
    try {
      val ex = intercept[java.util.ConcurrentModificationException](
        Layout.deleteWhere(spark, dir, Seq(("k", 0L, 9L))))
      assert(ex.getMessage.contains("conflict"), ex.getMessage)
      Layout.raceHooks.reset()
      // HEALED: the live files are exactly the pre-mutation set (promoted
      // replacements deleted, retired originals back), rows intact
      assert(leafFiles(dir).map(_._1).toSet == filesBefore, "file set restored")
      val got = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
      assert(got == ((0L to 99L) ++ (200L to 299L)).toSet, "no row lost or duplicated")
      // the inverted index still classifies exactly: a fresh mutation
      // over the healed table stabs, passes the stray guard, and is exact
      val stats = Layout.deleteWhere(spark, dir, Seq(("k", 0L, 9L)))
      assert(stats.rewrittenFiles == 1L && stats.untouchedFiles >= 1L, s"$stats")
      val after = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
      assert(after == ((10L to 99L) ++ (200L to 299L)).toSet)
    } finally {
      Layout.raceHooks.reset()
      spark.conf.unset(Layout.MutationMaxRetriesConf)
    }
  }

  test("TWO SESSIONS, shared dir: racing writers serialize through the filesystem CAS, both commit") {
    import java.util.concurrent.{CyclicBarrier, TimeUnit}
    // unlike the raceHooks tests above, NOTHING is choreographed here:
    // two independent SparkSessions (own SessionState/conf, as two
    // processes would have) fire the same verb at the same barrier tick
    // against one directory. The manifest CAS is a FILESYSTEM primitive
    // (create-if-absent hard link locally, rename + nonce read-back on
    // HDFS-likes — README documents the object-store matrix), so
    // serialization owes nothing to in-process state; the conflict loser
    // retries under the default maxRetries and both mutations land.
    val dir = freshDir("graft-race-2session")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    spark.conf.set(Manifest.KeepConf, "5") // retain all three generations
    val seq0 = Manifest.write(spark, dir)
    val sessionA = spark.newSession()
    val sessionB = spark.newSession()
    assert((sessionA ne spark) && (sessionA ne sessionB))
    // session confs are independent (the point of the two-session
    // setup) — each writer's vacuum must retain all three generations
    sessionA.conf.set(Manifest.KeepConf, "5")
    sessionB.conf.set(Manifest.KeepConf, "5")
    val barrier = new CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Layout.MutationStats]]()
    def run(name: String, s: SparkSession, lo: Long, hi: Long): Thread = {
      val t = new Thread(() => {
        try {
          barrier.await(60, TimeUnit.SECONDS)
          results.put(name, Right(Layout.deleteWhere(s, dir, Seq(("k", lo, hi)))))
        } catch { case e: Throwable => results.put(name, Left(e)) }
      }, name)
      t.start(); t
    }
    val a = run("session-a", sessionA, 0L, 9L)
    val b = run("session-b", sessionB, 200L, 209L)
    a.join(120000); b.join(120000)
    assert(results.get("session-a").isRight, s"A: ${results.get("session-a")}")
    assert(results.get("session-b").isRight, s"B: ${results.get("session-b")}")
    // both mutations applied, regardless of who won the CAS first
    val got = Layout.readSnapshot(spark, dir).as[(Long, Long)].collect().map(_._1).toSet
    assert(got == ((10L to 99L) ++ (210L to 299L)).toSet, "both sessions' deletes landed")
    // retention history shows BOTH generations on top of the base commit
    val seqs = Manifest.history(spark, dir).select("seq").collect().map(_.getLong(0)).toSet
    assert(seqs.contains(seq0) && seqs.contains(seq0 + 1) && seqs.contains(seq0 + 2),
      s"expected seqs $seq0..${seq0 + 2} retained, got $seqs")
    // and every retained snapshot still resolves (no torn generation —
    // a manifest must never have captured the loser's healed-away files)
    assert(Manifest.read(spark, dir, Some(seq0)).count() == 200L)
    assert(Manifest.read(spark, dir, Some(seq0 + 1)).count() == 190L)
    assert(Manifest.read(spark, dir, Some(seq0 + 2)).count() == 180L)
    assert(Manifest.listLive(spark, dir).size ==
      Manifest.info(spark, dir).files.size, "no strays either way")
    spark.conf.unset(Manifest.KeepConf)
  }

  test("append racing a concurrent widening carries the winner's schema on retry") {
    // the CAS loser re-pins files AND schemas: committing the original
    // pin would silently un-widen the table the winner just widened
    val dir = freshDir("graft-append-widen-race")
    (0L to 9L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Manifest.write(spark, dir)
    Layout.raceHooks.preCommit = () => {
      Layout.raceHooks.reset() // interleave exactly once
      Layout.addColumns(spark, dir, Seq(org.apache.spark.sql.types.StructField(
        "w", org.apache.spark.sql.types.LongType, nullable = true)))
      ()
    }
    try {
      val seq = Layout.append(spark, dir, (10L to 14L).map(k => (k, k)).toDF("k", "v"))
      val fin = Manifest.info(spark, dir)
      assert(fin.seq == seq, "the retried append is the latest commit")
      assert(fin.dataSchema.fieldNames.contains("w"),
        "the retried append must carry the winner's widened schema forward")
      val t = Layout.readSnapshot(spark, dir)
      assert(t.count() == 15L, "both the widening and the append landed")
      assert(t.columns.contains("w") && t.filter(col("w").isNull).count() == 15L,
        "every file null-fills the metadata-committed column")
    } finally Layout.raceHooks.reset()
  }

  test("addColumns commits the pinned file set, never the live listing") {
    // a stray parquet file on disk at commit time — exactly what a
    // concurrent writer's in-flight (heal-doomed) promotion looks
    // like — must NOT be captured by a metadata-only commit; adopting
    // strays stays the explicit Manifest.write(listing) path
    val dir = freshDir("graft-addcols-pinned")
    (0L to 9L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Manifest.write(spark, dir)
    val pinned = Manifest.info(spark, dir).files.toSet
    (100L to 109L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir) // the stray
    Layout.addColumns(spark, dir, Seq(org.apache.spark.sql.types.StructField(
      "w", org.apache.spark.sql.types.LongType, nullable = true)))
    val after = Manifest.info(spark, dir)
    assert(after.files.toSet == pinned,
      s"metadata commit captured the live listing: ${after.files.toSet -- pinned}")
    assert(after.dataSchema.fieldNames.contains("w"))
    assert(Layout.readSnapshot(spark, dir).count() == 10L)
  }
}
