package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[N] and prints ONE JSON line.
  *
  * Headline set = the relational + operator + training-data queries that
  * scale with the sf tables. The CometBFT fixture pipeline is excluded —
  * it benchmarks fixture generation, not engine throughput (it has its own
  * E2E suite).
  */
object Bench {

  /** Queries whose cost scales with the sf tables. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q2_filter_project", "q3_shipping_priority",
    "q4_region_rollup", "q5_order_sequence", "q6_top_customers",
    "q7_distinct_agg", "q8_union_parties", "q9_customers_no_orders",
    "q10_priority_buckets", "q31_rollup", "q32_set_ops",
    "q11_fifo_pairing", "q12_sessions", "q13_exact_percentiles",
    "q19_tumbling_window",
    "q14_step_transitions", "q15_dup_keys", "q16_recovery_flag",
    "q17_json_props", "q18_last_send_first_receive", "q36_salted_join",
    "q39_bpe_tokens", "q20_text_stats", "q21_quality_score", "q22_lang_id", "q23_exact_dedup",
    "q24_ngram_jaccard", "q25_minhash_lsh", "q26_simhash", "q30_fingerprint",
    "q35_dedup_groups", "q38_corpus_clean",
    "q27_cosine_topk", "q28_lsh_ann", "q29_embedding_stats",
    "q33_embedding_neardup", "q34_ivf_ann", "q37_sql_api", "q44_multimodal_resize",
    "q54_multimodal_frames",
    // round 4: corpus-assembly operators (packing, split, repetition, dedup apply)
    "q57_sequence_packing", "q58_stratified_split", "q59_repetition",
    "q60_dedup_apply",
    // round 5: decontamination, k-means IVF training, int8 quantization,
    // training order, domain mixing
    "q62_decontaminate", "q63_kmeans_train", "q64_int8_quant",
    "q65_train_order", "q66_domain_mix",
    // round 6: normalized decontamination, tokenizer-training pair counts,
    // integer tf-idf keywords, boilerplate detection, repeated-span
    // coverage, importance weighting
    "q68_decontaminate_norm", "q71_bpe_merges", "q72_tfidf_keywords",
    "q78_boilerplate_ngrams", "q79_repeated_spans", "q80_importance_weights",
    "q81_semdedup", "q82_source_overlap", "q83_span_decontaminate",
    "q84_source_quality", "q85_bpe_train", "q86_dup_source_matrix",
    // round 7: driver-local BPE merge loop (1 job regardless of merge count),
    // BPE encoding over the distinct-word table
    "q87_bpe_train_local", "q88_bpe_encode", "q89_chunk_windows",
    "q90_oov_rate", "q91_token_packing", "q92_length_percentiles",
    "q93_incremental_dedup",
    // round 7 (late): product quantization (encode + ADC search + IVF-PQ),
    // bigram LM familiarity scoring
    "q94_pq_encode", "q95_pq_ann", "q96_lm_familiarity", "q97_ivfpq_ann",
    "q98_ivfpq_residual",
    // round 7 (late): the composed corpus-curation decision table
    "q99_curation_decisions",
    // round 8: trained PQ codebooks, multiprobe IVF-PQ, and the stored-
    // index serving + incremental-add paths (index build timed separately
    // as q103_index_build, the q25_sig_build pattern)
    "q100_pq_train", "q101_pq_ann_trained", "q102_ivfpq_multiprobe",
    "q103_ivfpq_stored", "q104_ivfpq_incremental",
    // round 8: DSIR importance resampling and target-proportion mixing —
    // the sampling steps that turn scores/recipes into the kept corpus
    "q105_importance_resample", "q106_mix_plan",
    // round 8: exact-substring dedup apply (cut cross-doc repeated spans,
    // rebuild text)
    "q107_cut_repeated_spans",
    // round 9: ADC-then-exact ANN refine and token-budget corpus selection
    "q108_ivfpq_refine", "q109_budget_select",
    // round 9: as-of join, bucketized interval join, sketch-pruned exact
    // heavy hitters
    "q110_asof_join", "q111_interval_join", "q112_heavy_hitters",
    "q113_overlap_join", "q114_ngram_novelty", "q115_prev_order",
    "q116_source_heavy_hitters", "q117_next_order", "q118_asof_tolerance",
    // round 10: left interval join, chunked tolerance as-of, the naive-
    // as-of optimizer rewrite (the REWRITTEN plan is what's timed), and
    // the SQL-surface verbs
    "q119_interval_left", "q120_chunked_tolerance", "q121_naive_asof_rewrite",
    "q122_sql_asof", "q123_sql_interval", "q124_sql_heavy_hitters",
    "q125_naive_interval_rewrite", "q126_naive_overlap_rewrite",
    "q127_naive_asof_left_maxby",
    // round 11: right-outer as-of normalization, pure-SQL table functions,
    // and the outer interval rewrite (rewritten plans are what's timed)
    "q128_naive_asof_right", "q129_sql_tf_asof", "q130_sql_tf_heavy_hitters",
    "q131_naive_interval_left", "q132_sql_tf_interval", "q133_sql_tf_overlap",
    "q134_dedup_groups_stars", "q135_sql_tf_cc",
    "q136_naive_interval_left_residual",
    // round 12: multi-dimensional box scans over the Z-ORDERED table
    // copies (the rewrite is timed separately as q137_zorder_build), and
    // the interval-preserved naive outer rewrite
    "q137_zorder_events_box", "q138_zorder_lineitem_box",
    "q139_naive_interval_iv_left", "q140_sql_tf_sessionize",
    "q141_sql_tf_zorder", "q142_zorder_pruned_read",
    "q143_sql_tf_pruned_read",
    // round 13: automatic envelope pruning of plain read.filter scans,
    // quantile-scaled layout, partitioned-table composed pruning, and
    // timestamp-literal pruned reads (builds timed as q144_zorder_build13)
    "q144_envelope_auto_prune", "q145_quantile_zorder_box",
    "q146_partitioned_pruned_box", "q147_sql_tf_pruned_read_ts",
    "q148_partitioned_auto_prune", "q149_sql_tf_read_healed",
    // round 14: manifest-committed snapshot read (the cross-process
    // reader for swap-maintained tables) and file-level CDC between
    // snapshots (build timed as q151_manifest_build)
    "q150_sql_tf_read_snapshot", "q151_sql_tf_read_changes",
    // round 14: stats-only aggregates answered from the .envelopes index
    // (metadata-scale instead of table-scale)
    "q152_envelope_stats_agg", "q153_envelope_grouped_agg",
    "q154_envelope_filtered_agg",
    // round 14: time travel — the box over a historical manifest commit
    "q155_sql_tf_time_travel", "q156_envelope_sum_agg",
    // round 14: PII scrubbing and C4-style cross-corpus line dedup
    "q157_pii_scrub", "q158_line_dedup", "q172_gopher_signals",
    "q174_url_dedup",
    // round 14: box over the small-file table rolled up by
    // compactPartitions (build timed inside q151_manifest_build)
    "q159_compacted_box",
    // round 14: boxes over deleteWhere/upsert-mutated copies (mutations
    // timed inside q151_manifest_build)
    "q160_delete_where_box", "q161_upsert_box",
    // round 14: URL/domain blocklist filtering + table-stats introspection
    "q162_domain_filter", "q163_table_stats",
    // round 14: the partitioned-table mutation path
    "q164_delete_partitioned_box",
    // round 15: row-level CDC of the q160 delete; avg + path-synthesized
    // partition grouping from the index (q167's build timed as
    // q167_part_build)
    "q165_cdc_delete_rows", "q166_envelope_avg_agg", "q167_part_group_agg",
    // SQL mutation surface (fixtures built in q167_part_build)
    "q168_sql_delete_box", "q169_sql_merge_box", "q170_sql_update_box",
    "q171_append_box", "q173_bloom_lookup",
    // round 16: string-keyed upsert (prefix stab + bloom refinement) and
    // the additively-widened table snapshot (fixtures built in
    // q175_mut_build16)
    "q175_string_upsert_box", "q176_widened_append_box",
    // round 16: the general MERGE shapes (conditional matched delete /
    // update, composite key — mutations inside q175_mut_build16), paired
    // update-image CDC, the 100-value bloom IN, and the full Gopher
    // duplicate-n-gram fractions (one explode for all nine sizes)
    "q177_merge_cond_delete", "q178_merge_multikey", "q179_merge_cond_update",
    "q180_cdc_update_images", "q181_bloom_in100", "q182_gopher_ngram_fracs",
    "q183_merge_partial_set", "q184_merge_sync",
    // round 17: merge-on-read deletion vectors (snapshot box over the
    // un-rewritten candidates, row-level CDC of a DV commit, the reified
    // twin) and the per-column composite-key stab (mutations inside
    // q185_mut_build17)
    "q185_dv_delete_box", "q186_dv_cdc_rows", "q187_dv_reified_box",
    "q188_merge_lowcard_key", "q189_merge_sync_cond", "q190_merge_evolution",
    "q191_sql_compact_box", "q192_dv_upsert_box", "q193_dv_upsert_cdc",
    "q194_restore_box", "q195_cdc_token_delta",
    // round 18: the merge-on-read GENERAL merge (full arm matrix), the
    // auto-materialize-threshold delete, and the catalog-named read
    // (mutations inside q196_mut_build18)
    "q196_dv_general_merge", "q197_dv_threshold_box", "q198_named_table_box",
    "q199_sql_insert_box",
    // round 19: DV-aware metadata count (no data scan), the SQL-DDL
    // named read, and VERSION AS OF over a name (fixture inside
    // q200_mut_build19; q201/q202 reuse round-18/14 tables)
    "q200_dv_count_meta", "q201_ddl_named_box", "q202_sql_version_as_of",
    // round 19 (optimization round): the two declared round-19 queries the
    // interrupted build round left un-benched — the ALTER TABLE lifecycle
    // box and the graft_tables() listing (fixtures inside q200_mut_build19)
    "q203_sql_alter_box", "q204_graft_tables")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // box-load evidence: a co-tenant run (test suite, profiler) inflates
    // numbers up to ~1.4x run-to-run (BASELINE.md round-13 adjudication);
    // emitting the 1-min load average at start lets the driver and judge
    // gate cross-round comparisons mechanically instead of by prose
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries
    // Steady-state warmup: run the whole headline set once at the smallest
    // SF before timing. At bench scale most per-query cost is one-time
    // Catalyst planning + whole-stage-codegen compilation + JIT (sf0.001
    // and sf0.1 per-query times are near-identical cold); warming on the
    // tiny tables fills those caches for ~1/25th of the data cost.
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))) d else sfDir
    }
    // SPARK_GRAFT_WARM_PASSES (default 1 — the methodology every round has
    // used): how many untimed passes of the headline set fill the caches
    // before timing. The knob exists because round 19's warmup
    // investigation needed it (OPTIMIZATION_r19.md): a 3-pass run measured
    // NO serving-side improvement over 1 pass, so the default stays 1 and
    // per-entry numbers remain directly comparable across rounds.
    val warmPasses = sys.env.getOrElse("SPARK_GRAFT_WARM_PASSES", "1").toInt
    (1 to warmPasses).foreach { _ =>
      headline.foreach { name =>
        try all(name)(spark, warmDir).count()
        catch { case _: Throwable => }
      }
    }

    // Two timed iterations, min per query: single-shot numbers on a shared
    // box carry up to 2-3x scheduler/GC noise (observed round 1); the min
    // of two runs is the standard steady-state estimator.
    // A failing query must NOT be timed as a near-zero success (min-of-two
    // would then report the fast failure): failures are recorded explicitly
    // and surface as -1 with a "failed" list in the JSON.
    def timeOnce(name: String): (Double, Boolean) = {
      val fn = all(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      val t = (System.nanoTime() - t0) / 1e9
      // drop this query's localCheckpoint blocks so dead RDDs from one
      // query don't occupy the block manager during the next
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (t, ok)
    }
    // The MinHash sketch table is materialized once per dir and consumed
    // by q25's band+verify AND the pair-graph build. Time ITS build first
    // (min-of-two, cache dropped in between) so the timed q25 runs below
    // measure consumption only and neither number hides the other.
    val sigBuild = {
      def once(): (Double, Boolean) = {
        graft.queries.TextQueries.invalidateSigTable(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.TextQueries.buildSigTable(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q25_sig_build FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // Same honesty split for the stored ANN index: q103/q104 time
    // CONSUMPTION of the materialized index; its build is its own
    // min-of-two entry with the cache dropped in between. The
    // incremental variant's build (same scan shape) is pre-built
    // untimed so q104's timed runs also measure serving only.
    val annBuild = {
      def once(): (Double, Boolean) = {
        graft.queries.VectorQueries.invalidateAnnIndex(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.VectorQueries.buildAnnIndex(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q103_index_build FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    try graft.queries.VectorQueries.buildAnnIndexIncr(spark, sfDir)
    catch { case _: Throwable => }
    // Z-order layout rewrite: same honesty split — q137/q138 serve from
    // the cached clustered copies; the rewrite (two clusterWrites, each
    // one stats job + one range shuffle) is its own min-of-two entry.
    val zorderBuild = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q137_zorder_build FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // round-13 layout builds (quantile lineitem, timestamp events,
    // week-partitioned + per-leaf-OPTIMIZEd events): same min-of-two
    // honesty split; q145/q146/q147 then serve from the cached copies.
    val zorderBuild13 = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder13(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder13(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q144_zorder_build13 FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // round-14 build (the two-commit incremental events table): same
    // min-of-two honesty split; q151 then times CDC serving only.
    val manifestBuild = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder14(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder14(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q151_manifest_build FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // round-15 build (the wk-unindexed partitioned copy): min-of-two
    // honesty split; q167 then times metadata-scale serving only.
    val partBuild15 = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder15(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder15(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q167_part_build FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // round-16 build (string-keyed mutation fixtures): min-of-two honesty
    // split; q175+ then time serving only.
    val mutBuild16 = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder16(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder16(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q175_mut_build16 FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // round-17 build (deletion-vector + low-cardinality-key fixtures):
    // min-of-two honesty split; q185+ then time serving only.
    val mutBuild17 = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder17(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder17(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q185_mut_build17 FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // round-18 build (dv general merge, threshold delete, named copy):
    // min-of-two honesty split; q196+ then time serving only.
    val mutBuild18 = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder18(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder18(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q196_mut_build18 FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // round-19 build (the indexed live-DV fixture): min-of-two honesty
    // split; q200 then times the metadata count serving only.
    val mutBuild19 = {
      def once(): (Double, Boolean) = {
        graft.queries.LayoutQueries.invalidateZorder19(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.LayoutQueries.buildZorder19(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q200_mut_build19 FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    val present = headline.filter(all.contains)
    val run1 = present.map(n => n -> timeOnce(n)).toMap
    val run2 = present.map { n =>
      val (t1, ok1) = run1(n)
      val (t2, ok2) = timeOnce(n)
      n -> (if (ok1 && ok2) math.min(t1, t2) else -1.0)
    }
    // q35 reports cluster-only time (the pair graph is materialized once
    // per dir, so min-of-two always hits the cached graph). The build is a
    // real cost at any scale — time it as its OWN entry, min-of-two with
    // the cache dropped in between, so neither number hides the other.
    val pairBuild = {
      def once(): (Double, Boolean) = {
        graft.queries.TextQueries.invalidatePairGraph(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.TextQueries.buildPairGraph(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q35_pair_graph_build FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // Same honesty split for the connected-components LABEL build (q35 and
    // q60 read the materialized label table; the CC iteration itself is
    // timed here, with the pair graph already built so it measures
    // labeling only).
    val labelBuild = {
      def once(): (Double, Boolean) = {
        graft.queries.TextQueries.invalidateDedupLabels(sfDir)
        val t0 = System.nanoTime()
        val ok =
          try { graft.queries.TextQueries.buildDedupLabels(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] q35_cc_label_build FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    // CometBFT end-to-end: the fixture pipeline (q40-q53) is otherwise
    // invisible to BENCH, so an Analytics-suite performance regression
    // would never show up. Fixture GENERATION happens once outside the
    // timer (it benchmarks nothing); each timed run ingests the same logs
    // into a FRESH warehouse (build uncached), min-of-two.
    val cometbftE2e = {
      val logDir = java.nio.file.Files.createTempDirectory("graft-bench-cbft-logs").toString
      graft.cometbft.Fixtures.writeScenario(logDir, heights = 5)
      // same steady-state treatment as the headline queries (which warm
      // on sf0.001 before timing): one untimed pipeline run fills the
      // Catalyst/codegen/JIT caches for the 9 analytic plans — the entry
      // is fixed-overhead dominated, and a cold first run would otherwise
      // make min-of-two report half-warmed compilation time.
      try {
        val warmWh = java.nio.file.Files.createTempDirectory("graft-bench-cbft-warm").toString
        graft.cometbft.Pipeline.run(spark, logDir, warmWh)
      } catch { case _: Throwable => }
      def once(): (Double, Boolean) = {
        val wh = java.nio.file.Files.createTempDirectory("graft-bench-cbft-wh").toString
        val t0 = System.nanoTime()
        val ok =
          try { graft.cometbft.Pipeline.run(spark, logDir, wh); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] cometbft_e2e_pipeline FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (b1, ok1) = once(); val (b2, ok2) = once()
      if (ok1 && ok2) math.min(b1, b2) else -1.0
    }
    val results = run2 :+ ("q25_sig_build" -> sigBuild) :+
      ("q137_zorder_build" -> zorderBuild) :+
      ("q144_zorder_build13" -> zorderBuild13) :+
      ("q151_manifest_build" -> manifestBuild) :+
      ("q167_part_build" -> partBuild15) :+
      ("q175_mut_build16" -> mutBuild16) :+
      ("q185_mut_build17" -> mutBuild17) :+
      ("q196_mut_build18" -> mutBuild18) :+
      ("q200_mut_build19" -> mutBuild19) :+
      ("q103_index_build" -> annBuild) :+
      ("q35_pair_graph_build" -> pairBuild) :+
      ("q35_cc_label_build" -> labelBuild) :+
      ("cometbft_e2e_pipeline" -> cometbftE2e)
    val failed = results.collect { case (n, t) if t < 0 => "\"" + n + "\"" }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // "total" stays the sf-SCALED throughput sum (comparable across rounds
    // modulo documented set growth); the fixture E2E entry is fixed
    // many-small-jobs overhead on constant-size data, reported per-query
    // only (BASELINE.md round-6 note).
    val total = results.collect {
      case (n, v) if v >= 0 && n != "cometbft_e2e_pipeline" => v
    }.sum
    val loadEnd = osBean.getSystemLoadAverage
    val nCores = Runtime.getRuntime.availableProcessors
    // co-tenant heuristic: something else already had >25% of the cores
    // busy when this run STARTED (our own load shows up in loadEnd only)
    val coTenant = loadStart > 0.25 * nCores
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"load_avg_start":$loadStart,"load_avg_end":$loadEnd,"cores":$nCores,"co_tenant":$coTenant,"sf":"$sfDir"}""")
    spark.stop()
  }
}
