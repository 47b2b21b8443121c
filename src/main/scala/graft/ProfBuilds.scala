package graft

import org.apache.spark.sql.SparkSession

/** Profile the bench's fixture-BUILD entries (per-fixture seconds via
  * `SPARK_GRAFT_PROF_BUILDS`, per-entry wall time here) — measurement
  * tooling for the optimization rounds, not part of the driver
  * contract. */
object ProfBuilds {
  def main(args: Array[String]): Unit = {
    val dir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.LayoutQueries
    def t(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[prof-entry] $n%-20s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // warm JIT/codegen once, like Bench's warmup
    t("zorderBuild warm") { LayoutQueries.buildZorder(spark, dir) }
    if (args.contains("drift")) {
      val all = SparkEntry.queries
      val probe = Seq("q132_sql_tf_interval", "q122_sql_asof", "q31_rollup",
        "q140_sql_tf_sessionize", "q130_sql_tf_heavy_hitters")
      def time(tag: String): Unit = probe.foreach { n =>
        val t0 = System.nanoTime()
        all(n)(spark, dir).count()
        System.err.println(f"[drift] $tag $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      probe.foreach(n => try { all(n)(spark, dir).count(); () } catch { case _: Throwable => })
      time("t0-fresh    ")
      time("t0-fresh    ")
      LayoutQueries.buildZorder(spark, dir)
      time("t1-zorder   ")
      LayoutQueries.buildZorder14(spark, dir)
      LayoutQueries.buildZorder15(spark, dir)
      time("t2-build1415")
      LayoutQueries.buildZorder16(spark, dir)
      LayoutQueries.buildZorder17(spark, dir)
      time("t3-build1617")
      LayoutQueries.buildZorder18(spark, dir)
      LayoutQueries.buildZorder19(spark, dir)
      time("t4-build1819")
      time("t4-build1819")
      spark.stop(); return
    }
    if (args.contains("clones")) {
      val all = SparkEntry.queries
      val probe = Seq("q132_sql_tf_interval", "q31_rollup", "q130_sql_tf_heavy_hitters")
      def timeMin(tag: String): Unit = probe.foreach { n =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); all(n)(spark, dir).count(); (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[clones] $tag $n%-28s min ${ts.min}%7.3f s")
      }
      (1 to 4).foreach(_ => probe.foreach(n => all(n)(spark, dir).count()))
      timeMin("pre ")
      val clones = (1 to 6).map(_ => org.apache.spark.sql.GraftBridge.cloneSession(spark))
      clones.foreach(s => s.sql("SELECT 1").count()) // force session state init
      timeMin("post")
      timeMin("post")
      spark.stop(); return
    }
    if (args.contains("updstr")) {
      import org.apache.spark.sql.functions._
      import graft.sources.{Layout, Tables}
      (1 to 2).foreach { i =>
        val out = java.nio.file.Files.createTempDirectory("prof-updstr")
          .resolve("t").toString
        val raw = spark.read.parquet(s"$dir/events.parquet")
        val ev = raw.withColumn("ts_us", Tables.tsToMicros(raw, "ts")).drop("ts")
          .withColumn("ev_key",
            concat(lit("ev-"), lpad(col("event_id").cast("string"), 10, "0")))
        t(s"updstr#$i clusterWrite") { Layout.clusterWrite(ev, Seq("user_id", "ts_us"), 16, out) }
        t(s"updstr#$i bloomEnv") {
          Layout.writeEnvelopes(spark, out, Seq("user_id", "ts_us", "ev_key"),
            bloomCols = Seq("ev_key"))
        }
        val updates = ev.filter(col("event_id") % 10 === 3)
          .withColumn("value", col("value") * 2)
        val env = spark.read.parquet(out.stripSuffix("/") + ".envelopes")
        val pts = updates.select(col("ev_key").as("k_val")).distinct()
        t(s"updstr#$i stab") {
          val iv = env.select(col("file"), col("min_ev_key").as("f_min"),
            col("max_ev_key").as("f_max"), col("bloom_ev_key").as("f_bloom"))
          println("stab files: " + Layout.stringKeyStab(iv, pts)
            .select("file").distinct().count())
        }
        t(s"updstr#$i upsert") { Layout.upsert(spark, out, updates, "ev_key") }
      }
      spark.stop(); return
    }
    val entries: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("manifestBuild14", () => LayoutQueries.buildZorder14(spark, dir),
        () => LayoutQueries.invalidateZorder14(dir)),
      ("partBuild15", () => LayoutQueries.buildZorder15(spark, dir),
        () => LayoutQueries.invalidateZorder15(dir)),
      ("mutBuild16", () => LayoutQueries.buildZorder16(spark, dir),
        () => LayoutQueries.invalidateZorder16(dir)),
      ("mutBuild17", () => LayoutQueries.buildZorder17(spark, dir),
        () => LayoutQueries.invalidateZorder17(dir)),
      ("mutBuild18", () => LayoutQueries.buildZorder18(spark, dir),
        () => LayoutQueries.invalidateZorder18(dir)),
      ("mutBuild19", () => LayoutQueries.buildZorder19(spark, dir),
        () => LayoutQueries.invalidateZorder19(dir)))
    val wanted = if (args.isEmpty) entries.map(_._1).toSet else args.toSet
    entries.filter(e => wanted.contains(e._1)).foreach { case (n, build, inv) =>
      t(s"$n #1") { build() }
      inv()
      t(s"$n #2") { build() }
    }
    spark.stop()
  }
}
