package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Layout, Manifest}

/** The SQL mutation surface: `DELETE FROM parquet.` and key-equality
  * `MERGE INTO` lower onto the file-grain verbs (same classification,
  * same manifest commit), return the MutationStats triple, and DECLINE
  * LOUDLY on any shape the verbs cannot express exactly. */
class MutationSqlSpec extends AnyFunSuite {

  // The resolution rule is fixed at session construction — a session an
  // earlier suite built without GraftExtensions cannot serve DELETE/
  // MERGE SQL. Force a FRESH session with the extensions (same
  // SparkContext; suites in the forked test JVM run sequentially, so
  // clearing the active session races nothing — the EnvelopePruneSpec
  // injected-extensions pattern).
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  test("DELETE FROM: box predicate classifies over the index, stats returned, rows exact") {
    val dir = freshDir("sql-del")
    (0L to 99L).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("x"))
    val stats = spark.sql(
      s"DELETE FROM parquet.`$dir` WHERE x BETWEEN 0 AND 99").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 1L)), s"drop-whole + untouched: ${stats.toSeq}")
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq == (200L to 299L))
    // the mutation committed a manifest like the Scala verb
    assert(Manifest.latestSeq(spark, dir).nonEmpty)
    // >= / <= and = spellings work too
    spark.sql(s"DELETE FROM parquet.`$dir` WHERE x >= 290 AND x <= 291").collect()
    spark.sql(s"DELETE FROM parquet.`$dir` WHERE x = 295").collect()
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      ((200L to 289L) ++ Seq(292L, 293L, 294L) ++ (296L to 299L)))
  }

  test("DELETE FROM declines loudly on non-box predicates; stock v2 error preserved elsewhere") {
    val dir = freshDir("sql-del-decline")
    (0L to 99L).toDF("x").write.parquet(dir)
    def bad(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](spark.sql(sql).collect())
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"$sql -> ${ex.getMessage}")
    }
    bad(s"DELETE FROM parquet.`$dir` WHERE x > 10 AND x < 20", "not expressible")
    bad(s"DELETE FROM parquet.`$dir` WHERE x >= 10", "no upper bound")
    bad(s"DELETE FROM parquet.`$dir` WHERE x % 2 = 0", "not expressible")
    bad(s"DELETE FROM parquet.`$dir` WHERE x BETWEEN 1 AND 5 OR x = 9", "not expressible")
  }

  test("DELETE FROM intersects repeated bounds on one column (eq + BETWEEN, both orders)") {
    // a = 5 AND a BETWEEN 1 AND 10 must delete EXACTLY a = 5 — a
    // last-wins bound map would build box [1,10] and silently delete
    // rows the predicate excludes (order-dependent data loss)
    val dirA = freshDir("sql-del-ix-a")
    (0L to 20L).toDF("a").coalesce(1).write.parquet(dirA)
    spark.sql(s"DELETE FROM parquet.`$dirA` WHERE a = 5 AND a BETWEEN 1 AND 10").collect()
    assert(spark.read.parquet(dirA).as[Long].collect().sorted.toSeq ==
      ((0L to 4L) ++ (6L to 20L)), "only a = 5 deleted")
    // the reverse conjunct order must intersect identically
    val dirB = freshDir("sql-del-ix-b")
    (0L to 20L).toDF("a").coalesce(1).write.parquet(dirB)
    spark.sql(s"DELETE FROM parquet.`$dirB` WHERE a BETWEEN 1 AND 10 AND a = 5").collect()
    assert(spark.read.parquet(dirB).as[Long].collect().sorted.toSeq ==
      ((0L to 4L) ++ (6L to 20L)), "order-independent intersection")
    // overlapping ranges intersect; an UNSATISFIABLE intersection (empty
    // box) deletes nothing rather than declining or widening
    val dirC = freshDir("sql-del-ix-c")
    (0L to 20L).toDF("a").coalesce(1).write.parquet(dirC)
    spark.sql(s"DELETE FROM parquet.`$dirC` WHERE a BETWEEN 3 AND 12 AND a BETWEEN 8 AND 18").collect()
    assert(spark.read.parquet(dirC).as[Long].collect().sorted.toSeq ==
      ((0L to 7L) ++ (13L to 20L)), "ranges intersected to [8,12]")
    spark.sql(s"DELETE FROM parquet.`$dirC` WHERE a = 1 AND a = 2").collect()
    assert(spark.read.parquet(dirC).as[Long].collect().sorted.toSeq ==
      ((0L to 7L) ++ (13L to 20L)), "empty intersection deletes nothing")
  }

  test("UPDATE: box predicate + deterministic assignments lower onto updateWhere; declines loud") {
    val dir = freshDir("sql-upd")
    (0L to 99L).map(x => (x, x * 10L)).toDF("a", "b")
      .coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(x => (x, x * 10L)).toDF("a", "b")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("a"))
    val stats = spark.sql(
      s"UPDATE parquet.`$dir` SET b = b + a WHERE a BETWEEN 10 AND 19").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 1L, 1L)), s"one candidate file: ${stats.toSeq}")
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert((10L to 19L).forall(x => got(x) == x * 11L), "assignment applied in the box")
    assert((0L to 9L).forall(x => got(x) == x * 10L) &&
      (200L to 299L).forall(x => got(x) == x * 10L), "outside untouched")
    // declines: unconditional, non-box predicate, nondeterministic RHS
    def bad(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](spark.sql(sql).collect())
      assert(ex.getMessage.contains(frag), s"$sql -> ${ex.getMessage}")
    }
    bad(s"UPDATE parquet.`$dir` SET b = 0", "unconditional")
    bad(s"UPDATE parquet.`$dir` SET b = 0 WHERE a > 5", "ranges")
    bad(s"UPDATE parquet.`$dir` SET b = CAST(rand() * 10 AS BIGINT) WHERE a BETWEEN 1 AND 2",
      "unsupported assignment")
  }

  test("MERGE INTO: the exact upsert shape lowers onto upsert; others decline loudly") {
    val dir = freshDir("sql-merge")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    ((50L to 59L) ++ (1000L to 1004L)).map(k => (k, -k)).toDF("k", "v")
      .createOrReplaceTempView("updates")
    val stats = spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING updates AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 1L, 1L)), s"one candidate file rewritten: ${stats.toSeq}")
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got.size == 205)
    assert((50L to 59L).forall(k => got(k) == -k), "matched keys replaced")
    assert((1000L to 1004L).forall(k => got(k) == -k), "new keys inserted")
    assert((200L to 299L).forall(k => got(k) == k * 10L), "disjoint file intact")
    // declines: a non-equi ON, a conditional INSERT, duplicate key
    // conjuncts, a nondeterministic matched condition
    def bad(sql: String): Unit = {
      val ex = intercept[Exception](spark.sql(sql).collect())
      assert(ex.getMessage.contains("MERGE"), ex.getMessage)
    }
    bad(s"""MERGE INTO parquet.`$dir` AS t USING updates AS s ON t.k >= s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    bad(s"""MERGE INTO parquet.`$dir` AS t USING updates AS s ON t.k = s.k
           |WHEN NOT MATCHED AND rand() > 0.5 THEN INSERT *""".stripMargin)
    bad(s"""MERGE INTO parquet.`$dir` AS t USING updates AS s
           |ON t.k = s.k AND t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    bad(s"""MERGE INTO parquet.`$dir` AS t USING updates AS s ON t.k = s.k
           |WHEN MATCHED AND rand() > 0.5 THEN DELETE""".stripMargin)
  }

  test("MERGE INTO: conditional matched DELETE, no not-matched arm") {
    val dir = freshDir("sql-merge-cdel")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (200L to 299L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // matched keys 40..59; condition keeps only t.v < 500 ⇒ 40..49 drop
    (40L to 59L).map(k => (k, 0L)).toDF("k", "v")
      .createOrReplaceTempView("cdel_src")
    val stats = spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING cdel_src AS s ON t.k = s.k
         |WHEN MATCHED AND t.v < 500 THEN DELETE""".stripMargin).collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 1L, 1L)), s"candidate file rewritten, disjoint untouched: ${stats.toSeq}")
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got.keySet == ((0L to 39L) ++ (50L to 99L) ++ (200L to 299L)).toSet,
      "only matched rows satisfying the condition deleted")
    assert(got(50L) == 500L && got(299L) == 2990L, "survivors intact")
  }

  test("MERGE INTO: composite-key equality lowers onto upsertKeyed") {
    val dir = freshDir("sql-merge-multikey")
    (0L to 99L).map(k => (k % 5, k, k * 10L)).toDF("a", "b", "v")
      .coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("a", "b"))
    Seq((1L, 6L, -1L), (2L, 7L, -2L), (9L, 9999L, -3L)).toDF("a", "b", "v")
      .createOrReplaceTempView("mk_src")
    spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING mk_src AS s
         |ON t.a = s.a AND t.b = s.b
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val got = spark.read.parquet(dir).as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 101)
    assert(got((1L, 6L)) == -1L && got((2L, 7L)) == -2L, "matched composite keys replaced")
    assert(got((9L, 9999L)) == -3L, "unmatched composite key inserted")
    assert(got((0L, 5L)) == 50L, "non-matched rows intact")
  }

  test("MERGE INTO: conditional matched UPDATE with a both-sides condition") {
    val dir = freshDir("sql-merge-cupd")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // proposals: v := 100 - k, taken only when it beats the sitting v (k < 50)
    (0L to 99L by 10).map(k => (k, 100L - k)).toDF("k", "v")
      .createOrReplaceTempView("cupd_src")
    spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING cupd_src AS s ON t.k = s.k
         |WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got.size == 100)
    (0L to 99L).foreach { k =>
      val expect = if (k % 10 == 0 && (100L - k) > k) 100L - k else k
      assert(got(k) == expect, s"k=$k")
    }
  }

  test("MERGE INTO: insert-if-absent (not-matched arm only)") {
    val dir = freshDir("sql-merge-ins")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    Seq((50L, -1L), (1000L, -2L)).toDF("k", "v").createOrReplaceTempView("ins_src")
    val stats = spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING ins_src AS s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // insert-only: NO existing file may be rewritten — inserts append
    assert(stats.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 0L)),
      s"insert-only merge must not rewrite: ${stats.toSeq}")
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got.size == 101)
    assert(got(50L) == 500L, "matched key untouched (no matched arm)")
    assert(got(1000L) == -2L, "absent key inserted")
  }

  test("MERGE INTO: partial SET over both sides, narrow source; key assignment declines") {
    val dir = freshDir("sql-merge-pset")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // a NARROW source (key + a delta column the table doesn't have) is
    // fine for partial SET — replacement rows are built from the pair
    Seq((10L, 5L), (20L, 7L)).toDF("k", "d").createOrReplaceTempView("pset_src")
    spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING pset_src AS s ON t.k = s.k
         |WHEN MATCHED AND s.d > 6 THEN UPDATE SET v = t.v + s.d""".stripMargin).collect()
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got.size == 100)
    assert(got(20L) == 207L, "assigned from both sides where the condition held")
    assert(got(10L) == 100L, "condition failed: row kept verbatim")
    // assigning a key column declines loudly at the rule
    val ex = intercept[Exception](spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING pset_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET k = s.d""".stripMargin).collect())
    assert(ex.getMessage.contains("key column"), ex.getMessage)
  }

  test("MERGE INTO: multiple matched arms first-match-wins; duplicate-key targets act per ROW") {
    val dir = freshDir("sql-merge-arms")
    // duplicate target key 10: rows (10, 3) and (10, 7)
    ((0L to 9L).map(k => (k, k * 10L)) ++ Seq((10L, 3L), (10L, 7L))).toDF("k", "v")
      .coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    Seq((10L, 100L), (5L, 500L), (77L, 700L)).toDF("k", "v")
      .createOrReplaceTempView("arms_src")
    spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING arms_src AS s ON t.k = s.k
         |WHEN MATCHED AND t.v < 5 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toSeq.sorted
    // (10,3) hit the delete arm; (10,7) fell to the update arm — the
    // SAME source key acting per target row; (5,50) replaced; 77 fresh
    val expect = ((0L to 9L).filterNot(_ == 5L).map(k => (k, k * 10L)) ++
      Seq((5L, 500L), (10L, 100L), (77L, 700L))).sorted
    assert(got == expect, s"got $got")
    // an unconditional arm before another declines (ours or Spark's check)
    val ex = intercept[Exception](spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING arms_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN MATCHED AND t.v < 5 THEN DELETE""".stripMargin).collect())
    assert(ex.getMessage.contains("unreachable") || ex.getMessage.contains("MERGE"),
      ex.getMessage)
  }

  test("MERGE INTO: NOT MATCHED BY SOURCE arms sync the table; source refs decline") {
    val dir = freshDir("sql-merge-sync")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // source: keys 0..49 with new values, plus a fresh 1000
    ((0L to 49L).map(k => (k, -k)) :+ (1000L, -1000L)).toDF("k", "v")
      .createOrReplaceTempView("sync_src")
    spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING sync_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.v >= 900 THEN DELETE""".stripMargin).collect()
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    // matched replaced, fresh inserted, unmatched-by-source rows with
    // v >= 900 (k 90..99) deleted, the rest (k 50..89) kept
    assert(got.size == 91, s"${got.size}")
    assert((0L to 49L).forall(k => got(k) == -k) && got(1000L) == -1000L)
    assert(got(50L) == 500L && !got.contains(95L))
    // a BY SOURCE condition referencing the source fails loudly —
    // Spark's own resolution rejects it (the clause scopes to the
    // target alone) before the rule would decline it
    val ex = intercept[Exception](spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING sync_src AS s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE""".stripMargin).collect())
    assert(ex.getMessage.contains("source") || ex.getMessage.contains("MERGE") ||
      ex.getMessage.contains("cannot be resolved"), ex.getMessage)
  }

  test("MERGE INTO: conditional NOT MATCHED insert filters unmatched source rows") {
    val dir = freshDir("sql-merge-cins")
    (0L to 99L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // matched 50 replaces; unmatched 1000 (v=-2 < 0, filtered out) and
    // 2000 (v=5 >= 0, inserted)
    Seq((50L, -1L), (1000L, -2L), (2000L, 5L)).toDF("k", "v")
      .createOrReplaceTempView("cins_src")
    spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t USING cins_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND s.v >= 0 THEN INSERT *""".stripMargin).collect()
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    assert(got.size == 101, s"only the condition-passing unmatched row inserts: ${got.size}")
    assert(got(50L) == -1L && got(2000L) == 5L && !got.contains(1000L))
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns widen the table; type changes decline") {
    val dir = freshDir("sql-merge-evolve")
    (0L to 99L).map(k => (k, k)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Layout.writeEnvelopes(spark, dir, Seq("k"))
    // the source carries every table column PLUS a new `score` column
    (50L to 109L).map(k => (k, -k, k.toDouble / 2))
      .toDF("k", "v", "score").createOrReplaceTempView("evolve_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO parquet.`$dir` AS t
         |USING evolve_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // the table is WIDENED (metadata commit): snapshot readers see score,
    // old rows null-filled, merged rows carrying the source value
    val snap = Layout.readSnapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("k", "v", "score"))
    val got = snap.as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 110)
    assert(got(10L) == ((10L, None)), "pre-merge rows null-fill the new column")
    assert(got(60L) == ((-60L, Some(30.0))), "matched rows carry the evolved column")
    assert(got(105L) == ((-105L, Some(52.5))), "inserted rows carry it too")
    // re-running the SAME statement is idempotent on the schema
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO parquet.`$dir` AS t
         |USING evolve_src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(Layout.readSnapshot(spark, dir).columns.size == 3)
    // a TYPE CHANGE is not evolution — it fails loudly, never silently:
    // either Spark's own star expansion rejects the mismatched source or
    // our rule's additive gate does, whichever resolution reaches first
    (0L to 9L).map(k => (k.toString, k)).toDF("k", "v")
      .createOrReplaceTempView("evolve_retype")
    intercept[Exception](spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO parquet.`$dir` AS t
         |USING evolve_retype AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
    // the widening verb itself names the additive-only contract
    val ex = intercept[IllegalArgumentException](Layout.addColumnsIfAbsent(spark, dir,
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.StringType))))
    assert(ex.getMessage.contains("additive"), ex.getMessage)
    // WITHOUT the evolution keyword there is NO silent widening: star
    // expansion maps the TARGET's columns only (Spark's own semantics),
    // so the extra source column never reaches the table
    spark.sql(
      s"""MERGE INTO parquet.`$dir` AS t
         |USING (SELECT k, v, score, 1 AS extra FROM evolve_src) AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(Layout.readSnapshot(spark, dir).columns.toSeq == Seq("k", "v", "score"),
      "no evolution keyword, no widening")
  }
}
