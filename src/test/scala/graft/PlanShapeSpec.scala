package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards: the properties the 100 TB design hinges on
  * must survive refactors — filters reaching the scan, pruned read
  * schemas, broadcast dimension joins, and sketch-table materialization.
  * (These assert on plan text, not timings, so they are load-independent.)
  */
class PlanShapeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)

  test("q2 pushes all predicates into the parquet scan and prunes columns") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    // pruned read schema: no l_comment / l_tax in the scan
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("l_comment") && !read.contains("l_tax"), read)
  }

  test("q3 joins dimensions by broadcast, not shuffle") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast dim joins")
    assert(!p.contains("SortMergeJoin"), "dim join degraded to sort-merge")
  }

  test("q34 assigns cells via the literal centroid matrix and never windows the corpus") {
    val p = plan("q34_ivf_ann")
    assert(p.contains("LessThan(vec_id,20)"), "query-side filter not pushed")
    // centroids are gated driver-side model state, literal in the
    // codegen'd argmax — there is no centroid-side scan or join at all
    assert(p.contains("nearest_cell_long_arrays"), "literal-matrix assignment missing")
    assert(p.contains("BroadcastHashJoin"), "cell equi-join should broadcast at this SF")
    assert(!p.contains("Window"), "assignment/ranking must not use a window")
  }

  test("q36 shuffles on the salted key, not the bare hot key") {
    val p = plan("q36_salted_join")
    assert(p.contains("__salt"), "salt column missing from the physical plan")
  }

  test("q27 brute-force baseline broadcasts the bounded query side and rejects unbounded ones") {
    val p = plan("q27_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), "query side not broadcast")
    // ranking is the bounded max-k aggregate: nothing of the |Q|x|C|
    // product may be sorted or rank-windowed
    assert(!p.contains("Window"), s"brute-force must not rank via a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "bounded top-k aggregate missing from the plan")
    // the gate: a query side over maxQueries fails loudly instead of exploding
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", lit(true), k = 5, maxQueries = 10).count()
    }
    assert(ex.getMessage.contains("maxQueries"))
  }

  test("q89 chunking is narrow: zero exchanges, chunks never shuffle") {
    val p = plan("q89_chunk_windows")
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
    assert(exchanges == 0, s"chunking must be embarrassingly parallel, saw $exchanges exchanges:\n$p")
    assert(!p.contains("Join"), "chunking must not join")
  }

  test("q90 broadcasts the top-V vocabulary, never shuffles the token stream for the join") {
    val p = plan("q90_oov_rate")
    assert(p.contains("BroadcastHashJoin"), "vocabulary join must broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-V cut must be a bounded heap, not a global sort")
  }

  test("q24 materializes the shingle-set table once") {
    val p = plan("q24_ngram_jaccard")
    // after localCheckpoint the four consumers read the materialized RDD:
    // no parquet scan of documents may remain in the plan
    assert(!p.contains("Scan parquet"), "sketch table recomputed from scan")
  }

  test("q58 stratified split is a pure narrow projection - no exchange at all") {
    val p = plan("q58_stratified_split")
    assert(!p.contains("Exchange"), "split assignment must not shuffle")
  }

  test("q57 packing shuffles exactly once, on the shard key") {
    val p = plan("q57_sequence_packing")
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
    assert(exchanges == 1, s"expected 1 shard exchange, saw $exchanges:\n$p")
    assert(p.contains("hashpartitioning(shard"), "window not partitioned by shard")
  }

  test("q65 train order shuffles exactly once, on the shard key") {
    // each shard is ONE window partition (dense pos), so nShards must
    // scale >= cluster parallelism; the plan must not add a second
    // exchange on top of the shard one
    val p = plan("q65_train_order")
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
    assert(exchanges == 1, s"expected 1 shard exchange, saw $exchanges:\n$p")
    assert(p.contains("hashpartitioning(shard"), "window not partitioned by shard")
  }

  test("q59 repetition is narrow per-row work - no exchange") {
    val p = plan("q59_repetition")
    assert(!p.contains("Exchange hashpartitioning"), "repetition score must not shuffle")
  }

  test("q62 decontamination joins the benchmark shingle index by broadcast") {
    val p = plan("q62_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "benchmark index not broadcast")
  }

  test("q66 domain mixing broadcasts the domain-counts dimension") {
    val p = plan("q66_domain_mix")
    assert(p.contains("BroadcastHashJoin"), "domain counts not broadcast")
  }

  test("q78 boilerplate top-k is a bounded heap, not a global sort") {
    val p = plan("q78_boilerplate_ngrams")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k degraded to a global Sort of the n-gram table")
  }

  test("q79 repeated spans materialize the span table once") {
    val p = plan("q79_repeated_spans")
    // the frequency aggregate and the join side must both read the
    // localCheckpoint, so exactly one documents scan (the left-join back
    // onto doc ids) may remain. FormattedMode prints each node twice
    // (tree + detail header); count the detail headers "(n) Scan parquet".
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans <= 1, s"span table recomputed from scan ($scans parquet scans):\n$p")
  }

  test("q80 importance weights join the bounded feature table by broadcast") {
    val p = plan("q80_importance_weights")
    assert(p.contains("BroadcastHashJoin"), "feature table not broadcast")
  }

  test("q105 resampling: the 1x1 scale row joins by broadcast, never a shuffle") {
    val p = plan("q105_importance_resample")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "scale row not broadcast")
    assert(!p.contains("CartesianProduct"), "scale attach degraded to a cartesian product")
  }

  test("q106 mix plan broadcasts the per-domain rate table") {
    val p = plan("q106_mix_plan")
    assert(p.contains("BroadcastHashJoin"), "domain rate table not broadcast")
    assert(!p.contains("CartesianProduct"), "plan attach degraded to a cartesian product")
  }

  test("q107 span cut materializes the position-kept span table once") {
    val p = plan("q107_cut_repeated_spans")
    // doc-frequency aggregate and match join must both read the
    // checkpoint; the token explode + final stats each scan documents ->
    // at most 2 parquet scans may remain, never a span-pipeline recompute
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans <= 2, s"span table recomputed from scan ($scans parquet scans):\n$p")
  }

  test("q82 source overlap reads the materialized shingle set and broadcasts totals") {
    val p = plan("q82_source_overlap")
    // the distinct (src, hash) set is checkpointed once; no parquet
    // re-scan may remain, and the per-source totals join by broadcast
    assert(!p.linesIterator.exists(_.matches("""\(\d+\) Scan parquet\s*""")),
      "shingle set recomputed from scan")
    assert(p.contains("BroadcastHashJoin"), "per-source totals not broadcast")
  }

  test("q110 as-of: one window, zero joins, event_type filters pushed to both scans") {
    val p = plan("q110_asof_join")
    assert(p.contains("Window"), "as-of core window missing")
    assert(!p.contains("Join"), "as-of must not plan any join")
    assert(p.contains("EqualTo(event_type,purchase)") &&
      p.contains("EqualTo(event_type,click)"), "side filters not pushed to scans")
  }

  test("q111 interval join: the range predicate became an equi-join (no BNLJ/cartesian)") {
    val p = plan("q111_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degraded to a nested-loop product")
    assert(p.contains("EqualTo(event_type,error)"), "point-side filter not pushed")
  }

  test("q112 heavy hitters: candidates reach the verify scan as a literal IN-set") {
    val p = plan("q112_heavy_hitters")
    // below spark.sql.optimizer.inSetConversionThreshold (default 10) the
    // same literal pruning plans as In(...) rather than InSet — accept both
    assert(p.contains("INSET") || p.linesIterator.exists(_.matches(""".*\bitem#\d+ IN \(.*""")),
      "candidate pruning not planned as a literal IN-set")
    assert(!p.contains("Join"), "verify pass must filter, not join")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("text") && !read.contains("source"), s"scan not pruned to text: $read")
  }

  test("q121: the naive as-of SQL optimizes to the join-free union+window plan") {
    val df = SparkEntry.queries("q121_naive_asof_rewrite")(spark, dir)
    val logicalJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(logicalJoins.isEmpty, "naive as-of SQL kept its join — the rewrite did not fire")
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("Window"), "rewritten plan should resolve through one per-key window")
  }

  test("q125: the naive BETWEEN SQL optimizes to the bucketized cell join") {
    val df = SparkEntry.queries("q125_naive_interval_rewrite")(spark, dir)
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "naive BETWEEN join was not bucketized — the rewrite did not fire")
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "rewritten interval join degraded to a nested-loop product")
  }

  test("q127: the naive LEFT + band + max_by SQL optimizes to the join-free union+window plan") {
    val df = SparkEntry.queries("q127_naive_asof_left_maxby")(spark, dir)
    val logicalJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(logicalJoins.isEmpty, "naive left as-of SQL kept its join — the rewrite did not fire")
  }

  test("q128: the RIGHT OUTER naive as-of normalizes and optimizes to the join-free plan") {
    val df = SparkEntry.queries("q128_naive_asof_right")(spark, dir)
    val logicalJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(logicalJoins.isEmpty, "right-outer naive as-of kept its join — the rewrite did not fire")
  }

  test("q131: the naive LEFT BETWEEN SQL optimizes to the bucketized left-outer plan") {
    val df = SparkEntry.queries("q131_naive_interval_left")(spark, dir)
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "naive LEFT BETWEEN join was not bucketized — the outer rewrite did not fire")
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "rewritten outer interval join degraded to a nested-loop product")
  }

  test("q136: LEFT BETWEEN + strict bound + residual still optimizes to the bucketized plan") {
    val df = SparkEntry.queries("q136_naive_interval_left_residual")(spark, dir)
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty,
      "strict/residual outer shape was not bucketized — the innerFilter outer rewrite did not fire")
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "rewritten outer interval join degraded to a nested-loop product")
  }

  test("q126: the naive overlap SQL optimizes to the canonical-cell join") {
    val df = SparkEntry.queries("q126_naive_overlap_rewrite")(spark, dir)
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "naive overlap join was not bucketized — the rewrite did not fire")
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "rewritten overlap join degraded to a nested-loop product")
  }

  test("q158 line dedup: first occurrence is a map-side-combinable aggregate, never a window") {
    val p = plan("q158_line_dedup")
    // the hot-key hazard: a row_number window over line content puts
    // every occurrence of one boilerplate line into ONE task; the
    // min(struct)+semi-join plan combines map-side (partial_min visible)
    assert(!p.contains("Window"), s"lineDedup regressed to a per-line-content window:\n$p")
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"first-occurrence min is not map-side combining:\n$p")
  }

  test("q173 bloom lookup opens few files although every min/max hull matches") {
    val df = SparkEntry.queries("q173_bloom_lookup")(spark, dir)
    val scanned = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }.sum
    // the fixture interleaves event_id across 16 files (every hull spans
    // the domain); 3 lookup keys live in <= 3 files + bloom fp slack
    assert(scanned <= 8, s"bloom prune opened $scanned files:\n${df.queryExecution.optimizedPlan}")
  }

  test("q182 gopher n-gram fractions: all nine sizes ride ONE explode, not one pass per size") {
    val df = SparkEntry.queries("q182_gopher_ngram_fracs")(spark, dir)
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    // one Generate for the line split (reached via gopherSignals) and
    // ONE for every n-gram size together — a per-size regression shows
    // up as 9+ explodes here
    assert(gens.size <= 2, s"expected <= 2 explodes (lines + all-size grams), got ${gens.size}")
  }

  test("q81 semdedup: pairwise check reads the materialized cell index, never a cartesian product") {
    val p = plan("q81_semdedup")
    // the broadcast-centroid assignment runs once inside the eager
    // localCheckpoint; the visible plan must consume ONLY that cell index
    // (no parquet re-scan) and join within cells, never all-pairs
    assert(p.contains("Scan ExistingRDD"), "cell index not materialized")
    assert(!p.linesIterator.exists(_.matches("""\(\d+\) Scan parquet\s*""")),
      "cell index recomputed from scan")
    assert(!p.contains("CartesianProduct"),
      "within-cell pair check degraded to a corpus-wide cartesian product")
  }
}
