package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.operators.{CorpusOps, Dedup}

/** Text-analysis + deduplication queries over the `documents` table —
  * the training-data-pipeline surface (BASELINE.json north star), each
  * with a DuckDB oracle built from the same md5-derived hashing and
  * scaled-integer ratios.
  */
object TextQueries {

  // ---------------------------------------------------------------- q20
  /** Token statistics per document (token counting for data pipelines). */
  def q20TextStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .withColumn("toks", tokens($"text"))
      .select(
        $"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        size(array_distinct($"toks")).cast("long").as("n_distinct_tokens"),
        length($"text").cast("long").as("len_chars"),
        (length($"text") === $"n_chars").as("chars_match"),
        ppm(aggregate($"toks", lit(0L), (acc, t) => acc + length(t)), size($"toks").cast("long"))
          .as("mean_tok_len_ppm")
      )
  }

  // ---------------------------------------------------------------- q21
  /** Quality scoring: exact scaled-integer character-class and stopword
    * ratios plus a composite keep/drop flag. */
  /** The q21 feature columns over a frame that already has `toks` /
    * `n_tokens` — shared verbatim by q21 and the fused q38 so the two can
    * never drift. */
  private def qualityCols(df: DataFrame): DataFrame = df
    .withColumn("alpha_ppm", ppm(charClassCount(col("text"), "[a-z]"), length(col("text")).cast("long")))
    .withColumn("space_ppm", ppm(charClassCount(col("text"), "[ ]"), length(col("text")).cast("long")))
    .withColumn("digit_ppm", ppm(charClassCount(col("text"), "[0-9]"), length(col("text")).cast("long")))
    .withColumn("stopword_ppm", ppm(vocabHits(col("toks"), stopwords("en")), col("n_tokens")))
    .withColumn("quality_ok",
      col("alpha_ppm") >= 500000L && col("n_tokens") >= 5L && col("digit_ppm") <= 100000L)

  private def withToks(df: DataFrame): DataFrame = df
    .withColumn("toks", tokens(col("text")))
    .withColumn("n_tokens", size(col("toks")).cast("long"))

  def q21QualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityCols(withToks(Tables(spark, dir).documents))
      .select($"doc_id", $"n_tokens", $"alpha_ppm", $"space_ppm", $"digit_ppm",
        $"stopword_ppm", $"quality_ok")
  }

  // ---------------------------------------------------------------- q22
  /** Language-ID heuristic: CJK-codepoint check, then stopword-hit argmax
    * with fixed precedence (en > de > fr > es). */
  /** The q22 lang-id columns over a frame that already has `toks` —
    * shared verbatim by q22 and the fused q38. */
  private def langIdCols(df: DataFrame): DataFrame = df
    .withColumn("hits_en", vocabHits(col("toks"), stopwords("en")).cast("long"))
    .withColumn("hits_de", vocabHits(col("toks"), stopwords("de")).cast("long"))
    .withColumn("hits_fr", vocabHits(col("toks"), stopwords("fr")).cast("long"))
    .withColumn("hits_es", vocabHits(col("toks"), stopwords("es")).cast("long"))
    .withColumn("pred_lang",
      when(hasCjk(col("text")), "zh")
        .when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr") && col("hits_en") >= col("hits_es") && col("hits_en") > 0, "en")
        .when(col("hits_de") >= col("hits_fr") && col("hits_de") >= col("hits_es") && col("hits_de") > 0, "de")
        .when(col("hits_fr") >= col("hits_es") && col("hits_fr") > 0, "fr")
        .when(col("hits_es") > 0, "es")
        .otherwise("unknown"))

  def q22LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    langIdCols(withToks(Tables(spark, dir).documents))
      .select($"doc_id", $"lang", $"pred_lang", $"hits_en", $"hits_de", $"hits_fr", $"hits_es")
  }

  // ---------------------------------------------------------------- q23
  /** Exact content dedup by md5 hash-groupBy. */
  def q23ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables(spark, dir).documents, "doc_id", "text")

  // ---------------------------------------------------------------- q24
  /** N-gram Jaccard near-dup pairs (word 3-grams, >= 0.8). */
  def q24NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables(spark, dir).documents, "doc_id", "text",
      n = 3, minJaccardPpm = 800000L)

  // ---------------------------------------------------------------- q25
  /** MinHash+LSH near-dup pairs (16 hashes, 4-row bands, verified), off
    * the per-dir materialized sketch table. */
  def q25MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairsFromSig(materializedSigs(spark, dir),
      k = 16, bandSize = 4, minJaccardPpm = 800000L)

  /** Per-JVM, per-dir materialization of the MinHash SKETCH table
    * (doc, shingles, mh0..15, ns): the most expensive stage of the
    * near-dup pipeline (corpus scan + shingle window + 17-aggregate
    * rollup), consumed by q25's band+verify AND the pair-graph build —
    * previously each re-ran it from the corpus. On a cluster this is the
    * signature table a production dedup pipeline stores next to the
    * corpus. Build cost is its own bench entry (q25_sig_build). */
  private val sigsLock = new Object
  private var sigsCache: Map[String, String] = Map.empty

  /** Cheap fingerprint of the documents parquet under `dir` (part file
    * names, lengths, mtimes): the per-JVM materialization caches key on
    * (dir, fingerprint), so regenerating the data in place invalidates
    * them automatically instead of silently serving a stale sketch
    * (round-7 ADVICE). One directory listing — no data scan. */
  private def docsFingerprint(dir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    val h = java.security.MessageDigest.getInstance("MD5")
    walk(new java.io.File(dir, "documents.parquet")).foreach { f =>
      h.update(s"${f.getPath}:${f.length}:${f.lastModified}|".getBytes("UTF-8"))
    }
    h.digest().map("%02x".format(_)).mkString
  }

  private def cacheKey(dir: String): String = s"$dir|${docsFingerprint(dir)}"

  /** Temp dirs backing the per-JVM materializations, removed on JVM exit
    * (round-7 ADVICE: they were never cleaned up). */
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val cleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempDirs.forEach { p =>
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del))
          f.delete(); ()
        }
        del(p.toFile)
      }
    }))
  }

  private[queries] def newTempDir(prefix: String): java.nio.file.Path = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(p)
    p
  }

  private def materializedSigs(spark: SparkSession, dir: String): DataFrame =
    sigsLock.synchronized {
      val key = cacheKey(dir)
      val path = sigsCache.getOrElse(key, {
        val out = newTempDir("graft-minhash-sigs").resolve("sigs").toString
        Dedup.minhashSigTable(Tables(spark, dir).documents, "doc_id", "text",
          n = 3, k = 16).write.mode("overwrite").parquet(out)
        sigsCache += key -> out
        out
      })
      spark.read.parquet(path)
    }

  def buildSigTable(spark: SparkSession, dir: String): Unit = {
    materializedSigs(spark, dir); ()
  }
  def invalidateSigTable(dir: String): Unit = sigsLock.synchronized {
    sigsCache = sigsCache.filterNot(_._1.startsWith(s"$dir|"))
  }

  /** Per-JVM, per-dir materialization of q25's pair graph for consumers
    * of the PAIRS (q35 clustering): the production shape is "build the
    * near-dup pair graph once, then cluster it", not recompute the whole
    * minhash pipeline per consumer (the judged 2x recompute). Parquet on
    * local disk, not localCheckpoint — Bench unpersists all persistent
    * RDDs between queries, and on a cluster the materialization would be
    * a real table anyway. */
  private val pairsLock = new Object
  private var pairsCache: Map[String, String] = Map.empty

  private def materializedPairs(spark: SparkSession, dir: String): DataFrame =
    pairsLock.synchronized {
      val key = cacheKey(dir)
      val path = pairsCache.getOrElse(key, {
        val out = newTempDir("graft-minhash-pairs").resolve("pairs").toString
        q25MinhashLsh(spark, dir).write.mode("overwrite").parquet(out)
        pairsCache += key -> out
        out
      })
      spark.read.parquet(path)
    }

  /** Bench hooks: force / drop the materialized pair graph so its build
    * can be timed as its own bench entry (q35_pair_graph_build) instead of
    * hiding inside q35's first run — min-of-two timing would otherwise
    * silently report cluster-only time for q35 while the build cost
    * vanished from the totals. */
  def buildPairGraph(spark: SparkSession, dir: String): Unit = {
    materializedPairs(spark, dir); ()
  }
  def invalidatePairGraph(dir: String): Unit = pairsLock.synchronized {
    pairsCache = pairsCache.filterNot(_._1.startsWith(s"$dir|"))
  }

  /** Per-JVM, per-dir materialization of the connected-components LABELS
    * (id, comp, n_members) over the pair graph — the same
    * label-once-consume-many shape as [[materializedPairs]]: both the
    * cluster report (q35) and the keep/drop apply (q60) read the one
    * label table instead of re-running the CC iteration each (the
    * round-6 profile had each paying ~1.2 s at sf0.1 for identical
    * labels; at 100 TB the iteration is a multi-job graph computation a
    * production pipeline runs exactly once). Build cost is its own bench
    * entry (q35_cc_label_build), so min-of-two q35/q60 numbers stay
    * honest. */
  private val labelsLock = new Object
  private var labelsCache: Map[String, String] = Map.empty

  private def materializedLabels(spark: SparkSession, dir: String): DataFrame =
    labelsLock.synchronized {
      val key = cacheKey(dir)
      val path = labelsCache.getOrElse(key, {
        val out = newTempDir("graft-cc-labels").resolve("labels").toString
        Dedup.connectedComponents(materializedPairs(spark, dir), "d1", "d2")
          .withColumn("n_members",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("comp"))))
          .write.mode("overwrite").parquet(out)
        labelsCache += key -> out
        out
      })
      spark.read.parquet(path)
    }

  def buildDedupLabels(spark: SparkSession, dir: String): Unit = {
    materializedLabels(spark, dir); ()
  }
  def invalidateDedupLabels(dir: String): Unit = labelsLock.synchronized {
    labelsCache = labelsCache.filterNot(_._1.startsWith(s"$dir|"))
  }

  // ---------------------------------------------------------------- q26
  /** SimHash near-dup pairs (48-bit, 12-bit bands, Hamming <= 8). */
  def q26Simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables(spark, dir).documents, "doc_id", "text", maxHamming = 8)

  // ---------------------------------------------------------------- q30
  /** Document fingerprinting: min-md5 over character 8-grams
    * (winnowing-lite), grouped by source to spot template reuse. */
  def q30Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .withColumn("fp", fingerprint($"text"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_distinct_fp"),
        min($"fp").as("min_fp")
      )
  }

  // ---------------------------------------------------------------- q35
  /** Near-dup cluster resolution: connected components over the
    * MinHash+LSH pair graph (q25's exact-verified pairs), labeling every
    * clustered doc with its canonical (min-id) representative and the
    * cluster size — the "which copy do we keep" step of corpus dedup. */
  def q35DedupGroups(spark: SparkSession, dir: String): DataFrame =
    materializedLabels(spark, dir)

  // ---------------------------------------------------------------- q134
  /** q35's cluster report recomputed LIVE with the alternating
    * large-star/small-star components
    * ([[Dedup.connectedComponentsStars]], Kiveris et al.) over the same
    * materialized pair graph — the extreme-scale CC formulation must
    * label identically to the propagation one, so it shares q35's
    * recursive-CTE oracle (and q35's pair-graph build hook, so bench
    * timing is cluster-only on both). */
  def q134DedupGroupsStars(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponentsStars(materializedPairs(spark, dir), "d1", "d2")
      .withColumn("n_members",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("comp"))))

  // ---------------------------------------------------------------- q135
  /** q35's cluster report with the operator call in PURE SQL — the
    * `graft_connected_components` table function over the materialized
    * pair graph registered as a view, cluster sizes added by plain SQL
    * window over the function's output. Same labels, same oracle. */
  def q135SqlTfCc(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftTableFunctions.ensure(spark)
    materializedPairs(spark, dir).createOrReplaceTempView("g_dedup_pairs")
    spark.sql(
      """SELECT id, comp,
        |       CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS n_members
        |FROM graft_connected_components('g_dedup_pairs', 'd1', 'd2')""".stripMargin)
  }

  // ---------------------------------------------------------------- q38
  /** Composed corpus-cleaning pipeline — the end-to-end filter a
    * training-data user actually runs: exact-dedup survivors (canonical
    * min-id per content hash) that pass the quality gate and are
    * language-identified as English. Pure composition of q21/q22/q23's
    * operators; at scale each input is one aggregation over the same
    * documents scan and the joins are on doc_id. */
  def q38CorpusClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // One scan instead of three: q21's quality gate, q22's lang-id argmax
    // and q23's canonical-keep rule all derive from the same documents
    // row, so the composition-by-join (3 text scans, tokens computed
    // twice, 2 doc_id shuffles) collapses to one projection + one window
    // over the content hash. Row-for-row equal to the joined form: each
    // doc_id is unique in documents, so the doc_id inner joins were pure
    // column concat, and `keeps` membership (q23's keep_id = min(doc_id)
    // per md5 group) is exactly `doc_id == min(doc_id) OVER (PARTITION BY
    // md5(text))`. The feature expressions are q21/q22's own column
    // builders (qualityCols/langIdCols), so the three queries cannot
    // drift. Oracle-verified identical (rows, schema, hash).
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"__h")
    langIdCols(qualityCols(withToks(Tables(spark, dir).documents)))
      .withColumn("__h", md5($"text"))
      .withColumn("__keep_id", min($"doc_id").over(w))
      .filter($"doc_id" === $"__keep_id" &&
        $"quality_ok" && $"pred_lang" === "en")
      .select($"doc_id", $"n_tokens", $"stopword_ppm", $"pred_lang")
  }

  // ---------------------------------------------------------------- q39
  /** BPE-ish subword token counting: a GPT-2-style pretokenizer regex
    * (contractions, space-prefixed letter/digit runs, punctuation runs —
    * simplified to the RE2-portable subset, no lookahead) counted
    * identically by Spark's and DuckDB's regex engines. The
    * tokens-per-whitespace-word ratio is the usual fertility metric. */
  def q39BpeTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // \s spelled out ([ \t\n\r\f\x0B]): Java regex \s includes \x0B,
    // RE2's excludes it — the oracle uses the identical explicit class.
    val bpeRe = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]+|[ \\t\\n\\r\\f\\x0B]+"
    Tables(spark, dir).documents
      .withColumn("n_ws_tokens", size(tokens($"text")).cast("long"))
      .withColumn("n_bpe_tokens", size(regexp_extract_all($"text", lit(bpeRe), lit(0))).cast("long"))
      .withColumn("fertility_ppm", ppm($"n_bpe_tokens", $"n_ws_tokens"))
      .select($"doc_id", $"n_ws_tokens", $"n_bpe_tokens", $"fertility_ppm")
  }

  // ---------------------------------------------------------------- q57
  /** GPT-style sequence packing: whitespace-token streams laid head-to-tail
    * per shard and chunked at a 2048-token budget (CorpusOps.packSequences).
    * 8 shards here; the parameter scales with the cluster. */
  def q57SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.packSequences(Tables(spark, dir).documents, "doc_id",
      size(tokens($"text")).cast("long"), budget = 2048L, nShards = 8)
  }

  // ---------------------------------------------------------------- q58
  /** Deterministic md5-keyed stratified train/val/test split (80/10/10),
    * stratified by source — reproducible membership, no RNG. */
  def q58StratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.stratifiedSplit(Tables(spark, dir).documents, "doc_id",
      $"source", salt = "graft", trainPm = 800, valPm = 100)
  }

  // ---------------------------------------------------------------- q59
  /** Intra-document repetition: repeated word-3-gram fraction in exact ppm
    * — the boilerplate/degenerate-text pretraining filter. */
  def q59Repetition(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.repetitionScore(Tables(spark, dir).documents, "doc_id", "text", n = 3)

  // ---------------------------------------------------------------- q60
  /** Dedup materialization: every document labeled with its near-dup
    * cluster canonical (q35's connected components over the q25 pair
    * graph) and a kept flag — the actual corpus-shrinking step. */
  def q60DedupApply(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.dedupApply(Tables(spark, dir).documents, "doc_id",
      materializedLabels(spark, dir))

  // ---------------------------------------------------------------- q62
  /** Benchmark decontamination: every 50th document acts as the eval set;
    * each corpus document is scored by how many of its distinct word
    * 3-grams appear in the eval set's shingle index — the "did the
    * training set leak the benchmark" filter. */
  def q62Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.decontaminate(Tables(spark, dir).documents, "doc_id", "text",
      isBenchmark = $"doc_id" % 50 === 0, n = 3)
  }

  // ---------------------------------------------------------------- q68
  /** Decontamination with canonicalization: same eval-set split as q62 but
    * shingling lowercase/punctuation-stripped text, so cosmetic edits in a
    * leaked benchmark document still register as contamination. */
  def q68DecontaminateNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.decontaminate(Tables(spark, dir).documents, "doc_id", "text",
      isBenchmark = $"doc_id" % 50 === 0, n = 3, normalize = true)
  }

  // ---------------------------------------------------------------- q71
  /** Tokenizer training, first merge round: top-20 adjacent character
    * pairs inside words, weighted by word frequency — the argmax is BPE's
    * first merge rule. */
  def q71BpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.VocabOps.bpePairCounts(Tables(spark, dir).documents, "text", topK = 20)

  // ---------------------------------------------------------------- q72
  /** Integer TF-IDF keywords: each document's top-3 tokens by
    * `tf * 1e6 // df`, ties on the token string. */
  def q72TfidfKeywords(spark: SparkSession, dir: String): DataFrame =
    graft.operators.VocabOps.tfidfKeywords(Tables(spark, dir).documents, "doc_id", "text", k = 3)

  // ---------------------------------------------------------------- q65
  /** Deterministic training order: md5-keyed global shuffle into 8 shards
    * with a dense in-shard position — the reproducible "shuffle once, read
    * in order" corpus layout. */
  def q65TrainOrder(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.trainOrder(Tables(spark, dir).documents, "doc_id",
      salt = "ord", nShards = 8)

  // ---------------------------------------------------------------- q66
  /** Temperature-based domain mixing (alpha = 0.5): per-source sampling
    * rates that flatten the corpus toward balanced domains, md5-bucketed
    * keep decisions, aggregated per domain. */
  def q66DomainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.domainMix(Tables(spark, dir).documents, "doc_id", $"source",
      salt = "mix")
  }

  // ---------------------------------------------------------------- q78
  /** Corpus-wide boilerplate detection: top-25 word 3-grams by occurrence
    * count (ties on the gram text) with their document frequency. */
  def q78BoilerplateNgrams(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.boilerplateNgrams(Tables(spark, dir).documents, "doc_id", "text",
      n = 3, k = 25)

  // ---------------------------------------------------------------- q79
  /** Repeated-span coverage: per document, the word-5-gram positions
    * covered by a span occurring more than once corpus-wide (counting
    * multiplicity), in exact ppm. */
  def q79RepeatedSpans(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.repeatedSpanCoverage(Tables(spark, dir).documents, "doc_id", "text",
      n = 5)

  // ---------------------------------------------------------------- q80
  /** DSIR-style importance weights: every non-src0 document scored by the
    * Laplace-smoothed hashed-unigram affinity of its tokens to the src0
    * slice, exact integer ppm. */
  def q80ImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.importanceWeights(Tables(spark, dir).documents, "doc_id", "text",
      isTarget = $"source" === "src0")
  }

  // ---------------------------------------------------------------- q105
  /** DSIR importance RESAMPLING: q80's weights turned into deterministic
    * keep/drop decisions calibrated so the expected kept token mass is
    * 8 000 tokens — the sampling step that actually builds the selected
    * corpus. */
  def q105ImportanceResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.importanceResample(Tables(spark, dir).documents, "doc_id", "text",
      isTarget = $"source" === "src0", budgetTokens = 8000L, salt = "dsir")
  }

  // ---------------------------------------------------------------- q106
  /** Target-proportion data mixing: an explicit six-source recipe (ppm of
    * an 3 000-token budget), per-domain deterministic keep rates, realized
    * sample sizes. Sources outside the recipe are dropped (share 0). */
  val q106Shares: Seq[(String, Long)] = Seq(
    "src1" -> 300000L, "src2" -> 250000L, "src3" -> 200000L,
    "src4" -> 150000L, "src5" -> 60000L, "src6" -> 40000L)
  def q106MixPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.mixPlan(Tables(spark, dir).documents, "doc_id", "text",
      domain = $"source", targetSharesPpm = q106Shares,
      budgetTokens = 3000L, salt = "mixp")
  }

  // ---------------------------------------------------------------- q107
  /** Exact-substring dedup APPLY: every word 3-gram span appearing in >= 2
    * distinct documents is cut everywhere, text rebuilt from the
    * surviving tokens — the Lee et al. removal step on top of q79's
    * measurement. */
  def q107CutRepeatedSpans(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.cutRepeatedSpans(Tables(spark, dir).documents, "doc_id", "text",
      n = 3, minDocs = 2L)

  // ---------------------------------------------------------------- q109
  /** Token-budget corpus selection: the best-scoring prefix (alpha-ratio
    * ppm DESC, doc_id ASC) whose cumulative token count fits a 10k-token
    * training budget — the data-selection step after scoring, computed
    * without a global ordered window ([[graft.operators.CorpusOps
    * .budgetSelect]]: bounded score-class offsets + per-class windows). */
  def q109BudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables(spark, dir).documents
      .withColumn("n_tokens", size(tokens($"text")).cast("long"))
      .withColumn("score", ppm(charClassCount($"text", "[a-z]"), length($"text").cast("long")))
    CorpusOps.budgetSelect(scored, "doc_id", $"n_tokens", $"score",
      budgetTokens = 10000L)
  }

  // ---------------------------------------------------------------- q82
  /** Cross-source contamination matrix: shared distinct 3-gram shingles
    * and shingle-set Jaccard (ppm) for every overlapping source pair. */
  def q82SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.sourceOverlap(Tables(spark, dir).documents, "doc_id", "text",
      source = $"source", n = 3)
  }

  // ---------------------------------------------------------------- q83
  /** Span-level decontamination: same eval split as q62, but measuring the
    * exact token coverage of benchmark-matching 3-gram spans (interval
    * union) per document — the cut-the-span accounting. */
  def q83SpanDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.spanDecontaminate(Tables(spark, dir).documents, "doc_id", "text",
      isBenchmark = $"doc_id" % 50 === 0, n = 3)
  }

  // ---------------------------------------------------------------- q84
  /** Per-source quality report: the q21 scoring rolled up by provenance —
    * "which crawl slices are garbage" in one table (doc counts, token
    * mass, quality-pass share, mean alpha ratio; all exact integers). */
  def q84SourceQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("alpha_ppm", ppm(charClassCount($"text", "[a-z]"), length($"text").cast("long")))
      .withColumn("digit_ppm", ppm(charClassCount($"text", "[0-9]"), length($"text").cast("long")))
      .withColumn("quality_ok",
        $"alpha_ppm" >= 500000L && $"n_tokens" >= 5L && $"digit_ppm" <= 100000L)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        intDiv(sum($"n_tokens"), count(lit(1))).as("mean_tokens"),
        sum(when($"quality_ok", 1L).otherwise(0L)).as("n_quality_ok"),
        ppm(sum(when($"quality_ok", 1L).otherwise(0L)), count(lit(1))).as("quality_ok_ppm"),
        intDiv(sum($"alpha_ppm"), count(lit(1))).as("mean_alpha_ppm"))
  }

  // ---------------------------------------------------------------- q85
  /** Full iterative BPE training, 3 merge rounds: adjacent-pair argmax →
    * leftmost-non-overlapping merge → recount, emitting the merge table
    * (the artifact a BPE tokenizer ships). */
  def q85BpeTrain(spark: SparkSession, dir: String): DataFrame =
    graft.operators.VocabOps.bpeTrain(Tables(spark, dir).documents, "text", nMerges = 3)

  // ---------------------------------------------------------------- q87
  /** Driver-local BPE training, 8 merge rounds: identical semantics to
    * q85's distributed loop, but the merge iteration runs on the
    * gate-collected distinct-word frequency table (model state) — 1 Spark
    * job regardless of merge count, the production shape for the 30k-merge
    * artifacts real tokenizers ship. */
  def q87BpeTrainLocal(spark: SparkSession, dir: String): DataFrame =
    graft.operators.VocabOps.bpeTrainLocal(Tables(spark, dir).documents, "text", nMerges = 8)

  // ---------------------------------------------------------------- q88
  /** BPE encoding: train 8 merges driver-locally (q87's path), apply the
    * merge table to the corpus on the distinct-word table, and report
    * per-document subword counts + fertility — the full
    * train-then-tokenize lifecycle in two jobs. */
  def q88BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val merges = graft.operators.VocabOps.bpeTrainLocal(docs, "text", nMerges = 8)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    graft.operators.VocabOps.bpeEncode(docs, "doc_id", "text", merges)
  }

  // ---------------------------------------------------------------- q91
  /** Tokenized sequence packing: q57's per-shard concat-and-chunk layout,
    * but budgeted by the REAL tokenizer's subword counts (q88's encoder)
    * instead of whitespace words — pack boundaries land where the model's
    * context window actually fills. */
  def q91TokenPacking(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val merges = graft.operators.VocabOps.bpeTrainLocal(docs, "text", nMerges = 8)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = graft.operators.VocabOps.bpeEncode(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_subwords"))
    CorpusOps.packSequences(docs.join(enc, Seq("doc_id")), "doc_id",
      col("n_subwords"), budget = 512L, nShards = 8)
  }

  // ---------------------------------------------------------------- q92
  /** Per-source document-length distribution: the exact-percentile
    * histogram (reference index formulas, q13's machinery) over token
    * counts grouped by provenance — the curation dashboard's "what do
    * documents from this slice look like" table. */
  def q92LengthPercentiles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ExactPercentiles.histogram(
      Tables(spark, dir).documents
        .select(col("source"), size(tokens(col("text"))).cast("long").as("n_tokens")),
      Seq("source"), col("n_tokens"))

  // ---------------------------------------------------------------- q93
  /** Incremental near-dup matching: the doc_id%5==0 slice plays "today's
    * batch", the rest the stored corpus; both sides read the one
    * materialized sketch table (slice filters push into its scan) and the
    * batch bands join the corpus bands — candidate volume scales with the
    * batch, the corpus is touched only through its stored sketch. */
  def q93IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val sigs = materializedSigs(spark, dir)
    Dedup.minhashMatchesAgainst(
      sigs.filter(col("doc") % 5 === 0),
      sigs.filter(col("doc") % 5 =!= 0),
      k = 16, bandSize = 4, minJaccardPpm = 800000L)
  }

  // ---------------------------------------------------------------- q89
  /** Context-window chunking: 50-token windows advancing by 25 (50%
    * overlap) — one row per training example with its reassembled text. */
  def q89ChunkWindows(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.chunkWindows(Tables(spark, dir).documents, "doc_id", "text",
      window = 50, stride = 25)

  // ---------------------------------------------------------------- q90
  /** OOV rate under a 1000-word frequency-truncated vocabulary: per-doc
    * token coverage of the corpus's own top-1k words. */
  def q90OovRate(spark: SparkSession, dir: String): DataFrame =
    graft.operators.VocabOps.oovRate(Tables(spark, dir).documents, "doc_id", "text",
      vocabSize = 1000)

  // ---------------------------------------------------------------- q86
  /** Near-dup provenance matrix: q25's verified near-dup pairs attributed
    * to (source, source) — intra-source rows measure internal duplication,
    * cross rows measure mirroring between slices. Reads the materialized
    * pair graph (build timed separately as q35_pair_graph_build) and joins
    * the column-pruned (doc_id, source) map twice on doc id. */
  def q86DupSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docsrc = Tables(spark, dir).documents.select(col("doc_id"), col("source"))
    materializedPairs(spark, dir)
      .select(col("d1"), col("d2"))
      .join(docsrc.select(col("doc_id").as("d1"), col("source").as("s1")), Seq("d1"))
      .join(docsrc.select(col("doc_id").as("d2"), col("source").as("s2")), Seq("d2"))
      .select(least(col("s1"), col("s2")).as("src_a"),
        greatest(col("s1"), col("s2")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  // ---------------------------------------------------------------- q96
  /** Bigram LM familiarity: each document scored by the truncating mean
    * corpus document-frequency (ppm) of its word-bigram instances — the
    * exact-integer analog of the CCNet/KenLM perplexity quality filter
    * (low familiarity = never-seen-elsewhere phrasing = noise candidate). */
  def q96LmFamiliarity(spark: SparkSession, dir: String): DataFrame =
    graft.operators.VocabOps.lmFamiliarity(Tables(spark, dir).documents,
      "doc_id", "text", n = 2)

  // ---------------------------------------------------------------- q99
  /** The composed corpus-curation decision table: per document, every
    * gate's flag (quality, language agreement, exact-dup canonicality,
    * benchmark contamination, bigram familiarity) and the first-failing
    * reason code — the keep/drop table a production filter materializes.
    * Each flag reuses its standalone operator's exact formulation
    * (spec-pinned against q21/q22/q62/q96 on this corpus). */
  def q99CurationDecisions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.curationDecisions(Tables(spark, dir).documents, "doc_id", "text",
      declaredLang = $"lang", isBenchmark = $"doc_id" % 50 === 0,
      n = 3, minFamiliarityPpm = 100000L)
  }

  // ---------------------------------------------------------------- q157
  /** PII scrubbing over the documents corpus with DETERMINISTICALLY
    * PLANTED PII (the synthetic text has none): every 7th document gains
    * an email + an IPv4, every 11th a phone number — the same
    * construction the oracle applies — and [[CorpusOps.piiScrub]] must
    * mask all three classes and count them exactly. Patterns are written
    * in the Java-regex ∩ RE2 common dialect so both engines agree on
    * spans. */
  def q157PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = Tables(spark, dir).documents.select($"doc_id",
      concat($"text",
        when($"doc_id" % 7 === 0,
          concat(lit(" contact user"), $"doc_id".cast("string"),
            lit("@example.com or 10.0."), ($"doc_id" % 250).cast("string"),
            lit(".7 now"))).otherwise(lit("")),
        when($"doc_id" % 11 === 0, lit(" call +1 555 123 4567"))
          .otherwise(lit(""))).as("text"))
    CorpusOps.piiScrub(planted, "doc_id", "text")
  }

  // ---------------------------------------------------------------- q158
  /** C4-style cross-corpus line deduplication: lines are synthesized by
    * splitting each document at the word " merge " (the corpus is
    * single-line word soup, so the line structure is planted the same
    * way in the oracle), then every repeated non-blank line survives
    * only at its first (doc_id, position) occurrence and documents are
    * rebuilt from surviving lines. */
  def q158LineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lined = Tables(spark, dir).documents.select($"doc_id",
      replace($"text", lit(" merge "), lit("\n")).as("text"))
    CorpusOps.lineDedup(lined, "doc_id", "text")
  }

  // ---------------------------------------------------------------- q172
  /** Gopher-style repetition quality signals over documents with PLANTED
    * structure: lines synthesized by splitting at " merge " (as q158),
    * and every 3rd document gains a duplicated boilerplate line, a
    * bullet line, and an ellipsis line — so the duplicate/bullet/
    * ellipsis fractions have deterministic non-trivial values; the
    * top-n-gram fractions come from the word soup's natural repetition.
    * The oracle recomputes every signal relationally with the identical
    * tie-break (count, then coverage, packed into one integer key). */
  def q172GopherSignals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lined = Tables(spark, dir).documents.select($"doc_id",
      concat(replace($"text", lit(" merge "), lit("\n")),
        when($"doc_id" % 3 === 0,
          lit("\nSUBSCRIBE NOW\nSUBSCRIBE NOW\n- bullet item\nread more..."))
          .otherwise(lit(""))).as("text"))
    // the legacy sizes (and so the legacy cost) — q182 oracles the
    // remaining top-4 and duplicate-n-gram columns
    CorpusOps.gopherSignals(lined, "doc_id", "text", topNs = Seq(2, 3), dupNs = Nil)
  }

  // ---------------------------------------------------------------- q182
  /** The REMAINING Gopher n-gram fractions over q172's fixture plus a
    * PLANTED repeated 12-token sentence on every 4th document (so the
    * duplicate 5..10-gram character fractions have deterministic
    * non-trivial mass): most-frequent-gram coverage for n=4, all
    * duplicated-gram coverage for n=5..10. The oracle recomputes every
    * size relationally with the identical shingling, tie-break, and
    * ≥2-occurrence rule. */
  def q182GopherNgramFracs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lined = Tables(spark, dir).documents.select($"doc_id",
      concat(replace($"text", lit(" merge "), lit("\n")),
        when($"doc_id" % 3 === 0,
          lit("\nSUBSCRIBE NOW\nSUBSCRIBE NOW\n- bullet item\nread more..."))
          .otherwise(lit("")),
        when($"doc_id" % 4 === 0, lit(GopherPlantRepeat)).otherwise(lit(""))).as("text"))
    CorpusOps.gopherSignals(lined, "doc_id", "text")
      .select(Seq($"doc_id", $"frac_top_4gram_chars") ++
        (5 to 10).map(n => col(s"frac_dup_${n}gram_chars")): _*)
  }

  /** q182's planted repetition: one 12-token sentence twice — a
    * duplicated n-gram source for every n ≤ 12. */
  private val GopherPlantRepeat =
    "\nthe quick brown fox jumps over the lazy dog again and again" +
      "\nthe quick brown fox jumps over the lazy dog again and again"

  // ---------------------------------------------------------------- q174
  /** URL canonicalization + URL-level dedup over DETERMINISTICALLY
    * SYNTHESIZED re-crawl variants: every document gets a URL whose
    * scheme case, default port, tracking params, and fragment vary by
    * doc_id residues while the canonical form collides across documents
    * (path = doc_id % 50 per source) — the RefinedWeb pre-pass. The
    * oracle replays the identical regex passes and the min-id keep
    * rule. */
  def q174UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urled = Tables(spark, dir).documents.select($"doc_id",
      concat(
        when($"doc_id" % 4 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        $"source", lit(".example.com"),
        when($"doc_id" % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"), ($"doc_id" % 50).cast("string"),
        when($"doc_id" % 3 === 0, lit("?utm_source=feed&ref=1"))
          .when($"doc_id" % 3 === 1, lit("?ref=1")).otherwise(lit("")),
        when($"doc_id" % 7 === 0, lit("#frag")).otherwise(lit(""))).as("url"))
    CorpusOps.urlDedup(urled, "doc_id", "url")
  }

  // ---------------------------------------------------------------- q162
  /** URL/domain blocklist filtering with DETERMINISTICALLY SYNTHESIZED
    * URLs (the corpus has none): every document gets
    * `https://[ads.]<source>.example.com/p/<id>`, and
    * [[CorpusOps.domainFilter]] must extract the host and apply
    * registrable-domain semantics — blocking `src3.example.com` also
    * blocks `ads.src3.example.com`, never a lookalike suffix. The
    * oracle reconstructs host + first-match decision relationally. */
  def q162DomainFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urled = Tables(spark, dir).documents.select($"doc_id",
      concat(lit("https://"),
        when($"doc_id" % 5 === 0, lit("ads.")).otherwise(lit("")),
        $"source", lit(".example.com/p/"), $"doc_id".cast("string")).as("url"))
    CorpusOps.domainFilter(urled, "doc_id", "url",
      Seq("src3.example.com", "ads.src7.example.com"))
  }

  /** DuckDB shingle expression for word n-grams of size `n` over the
    * `tk` token list — the relational twin of
    * [[graft.functions.TextFunctions.wordShingles]]. */
  private def duckGram(n: Int): String = {
    val parts = (0 until n).map(j => if (j == 0) "tk[i]" else s"tk[i+$j]").mkString(", ")
    s"CASE WHEN len(tk) >= $n THEN list_transform(generate_series(1, len(tk) - ${n - 1}), " +
      s"i -> concat_ws(' ', $parts)) ELSE [] END"
  }

  private val Q182OracleSql: String = {
    val plant = "chr(10) || 'the quick brown fox jumps over the lazy dog again and again'" +
      " || chr(10) || 'the quick brown fox jumps over the lazy dog again and again'"
    val gramCtes = (4 to 10).map { n =>
      s"""g$n AS (SELECT doc_id, unnest(${duckGram(n)}) AS g FROM tok),
         |c$n AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt FROM g$n GROUP BY 1, 2)""".stripMargin
    }
    val aggCtes =
      Seq("t4 AS (SELECT doc_id, max(cnt * 1000000000000 + cnt * length(g)) " +
        "% 1000000000000 AS cov4 FROM c4 GROUP BY 1)") ++
      (5 to 10).map(n =>
        s"d$n AS (SELECT doc_id, CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(g) " +
          s"ELSE 0 END) AS BIGINT) AS dup$n FROM c$n GROUP BY 1)")
    val dupSelects = (5 to 10).map(n =>
      s"  CASE WHEN length(s.t) = 0 THEN 0.0 ELSE CAST(coalesce(d$n.dup$n, 0) AS DOUBLE)" +
        s" / CAST(length(s.t) AS DOUBLE) END AS frac_dup_${n}gram_chars")
    val dupJoins = (5 to 10).map(n => s"LEFT JOIN d$n USING (doc_id)").mkString(" ")
    s"""WITH src AS (SELECT doc_id,
       |    replace(text, ' merge ', chr(10)) ||
       |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'SUBSCRIBE NOW' ||
       |      chr(10) || 'SUBSCRIBE NOW' || chr(10) || '- bullet item' ||
       |      chr(10) || 'read more...' ELSE '' END ||
       |    CASE WHEN doc_id % 4 = 0 THEN $plant ELSE '' END AS t
       |  FROM documents),
       |tok AS (SELECT doc_id,
       |    list_filter(string_split_regex(trim(t), '[ \\t\\n\\r\\f\\x0B]+'), w -> w <> '') AS tk
       |  FROM src),
       |${gramCtes.mkString(",\n")},
       |${aggCtes.mkString(",\n")}
       |SELECT s.doc_id,
       |  CASE WHEN length(s.t) = 0 THEN 0.0
       |    ELSE CAST(coalesce(t4.cov4, 0) AS DOUBLE) / CAST(length(s.t) AS DOUBLE)
       |  END AS frac_top_4gram_chars,
       |${dupSelects.mkString(",\n")}
       |FROM src s LEFT JOIN t4 USING (doc_id) $dupJoins""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_gopher_signals" -> q172GopherSignals _,
    "q182_gopher_ngram_fracs" -> q182GopherNgramFracs _,
    "q174_url_dedup"     -> q174UrlDedup _,
    "q162_domain_filter" -> q162DomainFilter _,
    "q157_pii_scrub"  -> q157PiiScrub _,
    "q158_line_dedup" -> q158LineDedup _,
    "q99_curation_decisions" -> q99CurationDecisions _,
    "q96_lm_familiarity"   -> q96LmFamiliarity _,
    "q93_incremental_dedup" -> q93IncrementalDedup _,
    "q92_length_percentiles" -> q92LengthPercentiles _,
    "q91_token_packing"    -> q91TokenPacking _,
    "q90_oov_rate"         -> q90OovRate _,
    "q89_chunk_windows"    -> q89ChunkWindows _,
    "q88_bpe_encode"       -> q88BpeEncode _,
    "q87_bpe_train_local"  -> q87BpeTrainLocal _,
    "q86_dup_source_matrix" -> q86DupSourceMatrix _,
    "q85_bpe_train"        -> q85BpeTrain _,
    "q84_source_quality"   -> q84SourceQuality _,
    "q83_span_decontaminate" -> q83SpanDecontaminate _,
    "q82_source_overlap"   -> q82SourceOverlap _,
    "q78_boilerplate_ngrams" -> q78BoilerplateNgrams _,
    "q79_repeated_spans"   -> q79RepeatedSpans _,
    "q80_importance_weights" -> q80ImportanceWeights _,
    "q105_importance_resample" -> q105ImportanceResample _,
    "q106_mix_plan"        -> q106MixPlan _,
    "q107_cut_repeated_spans" -> q107CutRepeatedSpans _,
    "q109_budget_select"      -> q109BudgetSelect _,
    "q62_decontaminate"    -> q62Decontaminate _,
    "q68_decontaminate_norm" -> q68DecontaminateNorm _,
    "q71_bpe_merges"       -> q71BpeMerges _,
    "q72_tfidf_keywords"   -> q72TfidfKeywords _,
    "q65_train_order"      -> q65TrainOrder _,
    "q66_domain_mix"       -> q66DomainMix _,
    "q57_sequence_packing" -> q57SequencePacking _,
    "q58_stratified_split" -> q58StratifiedSplit _,
    "q59_repetition"       -> q59Repetition _,
    "q60_dedup_apply"      -> q60DedupApply _,
    "q39_bpe_tokens"    -> q39BpeTokens _,
    "q38_corpus_clean"  -> q38CorpusClean _,
    "q20_text_stats"    -> q20TextStats _,
    "q21_quality_score" -> q21QualityScore _,
    "q22_lang_id"       -> q22LangId _,
    "q23_exact_dedup"   -> q23ExactDedup _,
    "q24_ngram_jaccard" -> q24NgramJaccard _,
    "q25_minhash_lsh"   -> q25MinhashLsh _,
    "q26_simhash"       -> q26Simhash _,
    "q30_fingerprint"   -> q30Fingerprint _,
    "q35_dedup_groups"  -> q35DedupGroups _,
    "q134_dedup_groups_stars" -> q134DedupGroupsStars _,
    "q135_sql_tf_cc"    -> q135SqlTfCc _
  )

  private val toksSql = """list_filter(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+'), t -> t <> '')"""
  /** q68's canonicalized tokenizer: DuckDB mirror of
    * [[graft.functions.TextFunctions.normalizeText]] feeding the same
    * whitespace split. */
  private val normToksSql =
    """list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 \t\n\r\f\x0B]+', ' ', 'g')), '[ \t\n\r\f\x0B]+'), t -> t <> '')"""
  private def vocabSql(lang: String): String =
    stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** q80's full oracle, factored so q105 can reuse it as a CTE. */
  private lazy val q80Sql: String =
    s"""WITH tok AS (SELECT doc_id, (source = 'src0') AS is_target, unnest($toksSql) AS tok
       |  FROM documents),
       |ft AS (SELECT doc_id, is_target,
       |  CAST(CAST(concat('0x', substr(md5(tok), 1, 15)) AS UBIGINT) % 262144 AS BIGINT) AS f
       |  FROM tok),
       |feat AS (SELECT f,
       |  CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tgt,
       |  CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS raw
       |  FROM ft GROUP BY f),
       |tot AS (SELECT CAST(sum(tgt) AS BIGINT) AS tgt_total,
       |  CAST(sum(raw) AS BIGINT) AS raw_total FROM feat),
       |sc AS (SELECT ft.doc_id,
       |  least(1000000000000, CAST(floor(1000000.0
       |    * (CAST(feat.tgt + 1 AS DOUBLE) / CAST(tot.tgt_total + 262144 AS DOUBLE))
       |    / (CAST(feat.raw + 1 AS DOUBLE) / CAST(tot.raw_total + 262144 AS DOUBLE))) AS BIGINT)) AS affinity_ppm
       |  FROM ft JOIN feat USING (f) CROSS JOIN tot WHERE NOT ft.is_target)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(affinity_ppm) // count(*) AS BIGINT) AS score_ppm
       |FROM sc GROUP BY doc_id""".stripMargin

  private lazy val q21Sql: String =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |m AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars_t,
       |  CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |  CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS n_space,
       |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
       |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("en")}, x))) AS BIGINT) AS sw
       |  FROM t)
       |SELECT doc_id, n_tokens,
       |  CAST(CASE WHEN n_chars_t = 0 THEN 0 ELSE n_alpha * 1000000 // n_chars_t END AS BIGINT) AS alpha_ppm,
       |  CAST(CASE WHEN n_chars_t = 0 THEN 0 ELSE n_space * 1000000 // n_chars_t END AS BIGINT) AS space_ppm,
       |  CAST(CASE WHEN n_chars_t = 0 THEN 0 ELSE n_digit * 1000000 // n_chars_t END AS BIGINT) AS digit_ppm,
       |  CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE sw * 1000000 // n_tokens END AS BIGINT) AS stopword_ppm,
       |  (CASE WHEN n_chars_t = 0 THEN 0 ELSE n_alpha * 1000000 // n_chars_t END >= 500000
       |   AND n_tokens >= 5
       |   AND CASE WHEN n_chars_t = 0 THEN 0 ELSE n_digit * 1000000 // n_chars_t END <= 100000) AS quality_ok
       |FROM m""".stripMargin

  private lazy val q22Sql: String =
    s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents),
       |h AS (SELECT doc_id, lang, text,
       |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("en")}, x))) AS BIGINT) AS hits_en,
       |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("de")}, x))) AS BIGINT) AS hits_de,
       |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("fr")}, x))) AS BIGINT) AS hits_fr,
       |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("es")}, x))) AS BIGINT) AS hits_es
       |  FROM t)
       |SELECT doc_id, lang,
       |  CASE WHEN length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) > 0 THEN 'zh'
       |       WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
       |       WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de > 0 THEN 'de'
       |       WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
       |       WHEN hits_es > 0 THEN 'es'
       |       ELSE 'unknown' END AS pred_lang,
       |  hits_en, hits_de, hits_fr, hits_es
       |FROM h""".stripMargin

  /** The shared minhash CTE prefix (tok → sh → sig → bands) behind the
    * q25 and q93 oracles. */
  private lazy val minhashBandsCtes: String =
    s"""tok AS (SELECT doc_id, $toksSql AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
       |                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles FROM tok
       |  ),
       |sh2 AS (SELECT * FROM sh WHERE len(shingles) > 0),
       |hb AS (SELECT doc_id, shingles,
       |  list_transform(shingles, s ->
       |    CAST(CAST(concat('0x', substr(md5(s), 1, 8)) AS UBIGINT) AS BIGINT) & 2147483647) AS h31
       |  FROM sh2),
       |sig AS (SELECT doc_id, shingles,
       |  list_transform(generate_series(0, 15), i ->
       |    list_min(list_transform(h31, h ->
       |      (${(0 until 16).map(graft.operators.Dedup.minhashA).mkString("[", ", ", "]")}[i+1] * h +
       |       ${(0 until 16).map(graft.operators.Dedup.minhashB).mkString("[", ", ", "]")}[i+1]) % 2147483647))) AS mh
       |  FROM hb),
       |bands AS (SELECT doc_id, shingles, b.band_idx, md5(concat_ws('|',
       |    CAST(mh[b.band_idx*4+1] AS VARCHAR), CAST(mh[b.band_idx*4+2] AS VARCHAR),
       |    CAST(mh[b.band_idx*4+3] AS VARCHAR), CAST(mh[b.band_idx*4+4] AS VARCHAR))) AS band_hash
       |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band_idx) b)""".stripMargin

  /** q25's oracle, shared: q35's recursive-CTE oracle clusters its pairs. */
  private lazy val q25Sql: String =
    s"""WITH $minhashBandsCtes,
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared_bands,
       |    any_value(a.shingles) AS sh1, any_value(b.shingles) AS sh2
       |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |v AS (SELECT d1, d2, n_shared_bands,
       |    CAST(len(list_intersect(sh1, sh2)) AS BIGINT) AS shared,
       |    CAST(len(sh1) AS BIGINT) AS n1, CAST(len(sh2) AS BIGINT) AS n2
       |  FROM cand)
       |SELECT d1, d2, n_shared_bands, shared,
       |  CAST(shared * 1000000 // (n1 + n2 - shared) AS BIGINT) AS jaccard_ppm
       |FROM v WHERE shared * 1000000 // (n1 + n2 - shared) >= 800000""".stripMargin

  /** q93's oracle: the same band chain, joined NEW-slice × EXISTING-slice
    * (no d1<d2 — the pairing is cross-set). */
  private lazy val q93Sql: String =
    s"""WITH $minhashBandsCtes,
       |cand AS (
       |  SELECT a.doc_id AS d_new, b.doc_id AS d_old, count(*) AS n_shared_bands,
       |    any_value(a.shingles) AS sh1, any_value(b.shingles) AS sh2
       |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
       |  GROUP BY a.doc_id, b.doc_id),
       |v AS (SELECT d_new, d_old, n_shared_bands,
       |    CAST(len(list_intersect(sh1, sh2)) AS BIGINT) AS shared,
       |    CAST(len(sh1) AS BIGINT) AS n1, CAST(len(sh2) AS BIGINT) AS n2
       |  FROM cand)
       |SELECT d_new, d_old, n_shared_bands, shared,
       |  CAST(shared * 1000000 // (n1 + n2 - shared) AS BIGINT) AS jaccard_ppm
       |FROM v WHERE shared * 1000000 // (n1 + n2 - shared) >= 800000""".stripMargin

  /** Unrolled DuckDB replication of [[graft.operators.VocabOps.bpeTrain]]:
    * per round, pair counts off the previous symbol table, the argmax
    * merge, and the leftmost-non-overlapping rewrite as a `list_reduce`
    * string fold (the '|' delimiter is excluded from words on both
    * engines; the retroactive rewrite-last-token fold is equivalent to
    * the operator's pending-symbol fold because a merged symbol `a+b`
    * can never equal `a`). */
  /** The greedy leftmost-non-overlapping merge application as a DuckDB
    * `list_reduce` string fold (the '|' delimiter is excluded from words
    * on both engines; the retroactive rewrite-last-token fold is
    * equivalent to the operator's pending-symbol fold because a merged
    * symbol `a+b` can never equal `a`). `src` is the CTE holding `syms`,
    * `m` the single-row merge CTE. */
  private def bpeApplyFold(srcAlias: String): String =
    s"""string_split(list_reduce($srcAlias.syms, (acc, x) -> CASE
       |    WHEN string_split(acc, '|')[-1] = m.a AND x = m.b
       |    THEN substr(acc, 1, length(acc) - length(string_split(acc, '|')[-1])) || m.merged
       |    ELSE acc || '|' || x END), '|')""".stripMargin

  /** The training CTE chain p1/m1/s1 .. p{n}/m{n}/s{n}: per round, pair
    * counts off the previous symbol table, the argmax merge, and the
    * merge applied across the vocabulary. Requires `s0 (cnt, syms)`. */
  private def bpeTrainingCtes(nMerges: Int): String =
    (1 to nMerges).map { r =>
      s"""p$r AS (SELECT t.e.a AS a, t.e.b AS b, CAST(sum(t.cnt) AS BIGINT) AS total
         |  FROM (SELECT cnt, unnest(list_transform(generate_series(1, len(syms) - 1),
         |    i -> {'a': syms[i], 'b': syms[i+1]})) AS e
         |    FROM s${r - 1} WHERE len(syms) >= 2) t
         |  GROUP BY t.e.a, t.e.b),
         |m$r AS (SELECT a, b, a || b AS merged, total FROM p$r
         |  ORDER BY total DESC, a ASC, b ASC LIMIT 1),
         |s$r AS (SELECT s.cnt, ${bpeApplyFold("s")} AS syms
         |  FROM s${r - 1} s CROSS JOIN m$r m)""".stripMargin
    }.mkString(",\n")

  /** Unrolled DuckDB replication of [[graft.operators.VocabOps.bpeTrain]]. */
  private def bpeOracle(nMerges: Int): String = {
    val out = (1 to nMerges).map(r =>
      s"SELECT CAST($r AS INTEGER) AS round, a AS sym_a, b AS sym_b, merged, total AS pair_count FROM m$r")
      .mkString("\nUNION ALL\n")
    s"""WITH tok AS (SELECT unnest($toksSql) AS word FROM documents),
       |w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM tok
       |  WHERE word NOT LIKE '%|%' GROUP BY word),
       |s0 AS (SELECT cnt, list_transform(generate_series(1, length(word)),
       |  i -> substr(word, i, 1)) AS syms FROM w0),
       |${bpeTrainingCtes(nMerges)}
       |$out""".stripMargin
  }

  /** DuckDB replication of q88: train `nMerges` rounds (identical CTEs to
    * [[bpeOracle]]), then ENCODE — apply each merge in rank order to the
    * distinct-word table, join subword counts back to per-doc word
    * occurrences, roll up with zero-word documents preserved. */
  /** The shared CTE chain behind q88 and q91: training rounds + the
    * rank-order encode chain, ending at `agg (doc_id, n_words,
    * n_subwords)`. */
  private def bpeEncodeCtes(nMerges: Int): String = {
    val encodeRounds = (1 to nMerges).map { r =>
      s"""e$r AS (SELECT e.word, ${bpeApplyFold("e")} AS syms
         |  FROM e${r - 1} e CROSS JOIN m$r m)""".stripMargin
    }.mkString(",\n")
    s"""t0 AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |tw AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS n_occ FROM t0
       |  WHERE word NOT LIKE '%|%' GROUP BY doc_id, word),
       |w0 AS (SELECT word, CAST(sum(n_occ) AS BIGINT) AS cnt FROM tw GROUP BY word),
       |s0 AS (SELECT cnt, list_transform(generate_series(1, length(word)),
       |  i -> substr(word, i, 1)) AS syms FROM w0),
       |${bpeTrainingCtes(nMerges)},
       |e0 AS (SELECT word, list_transform(generate_series(1, length(word)),
       |  i -> substr(word, i, 1)) AS syms FROM w0),
       |$encodeRounds,
       |enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_sub FROM e$nMerges),
       |agg AS (SELECT tw.doc_id, CAST(sum(tw.n_occ) AS BIGINT) AS n_words,
       |  CAST(sum(tw.n_occ * enc.n_sub) AS BIGINT) AS n_subwords
       |  FROM tw JOIN enc USING (word) GROUP BY tw.doc_id)""".stripMargin
  }

  private def bpeEncodeOracle(nMerges: Int): String = {
    s"""WITH ${bpeEncodeCtes(nMerges)}
       |SELECT d.doc_id,
       |  CAST(COALESCE(agg.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(COALESCE(agg.n_subwords, 0) AS BIGINT) AS n_subwords,
       |  CAST(CASE WHEN COALESCE(agg.n_words, 0) = 0 THEN 0
       |    ELSE agg.n_subwords * 1000000 // agg.n_words END AS BIGINT) AS fertility_ppm
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q162_domain_filter" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'https://' || CASE WHEN doc_id % 5 = 0 THEN 'ads.' ELSE '' END
         |      || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '${CorpusOps.UrlHostPattern}', 1)) AS host
         |  FROM u),
         |d AS (
         |  SELECT doc_id, host,
         |    CASE
         |      WHEN host = 'src3.example.com'
         |        OR host LIKE '%.src3.example.com' THEN 'src3.example.com'
         |      WHEN host = 'ads.src7.example.com'
         |        OR host LIKE '%.ads.src7.example.com' THEN 'ads.src7.example.com'
         |    END AS blocked_by
         |  FROM h)
         |SELECT doc_id, host, blocked_by, blocked_by IS NULL AS kept FROM d""".stripMargin,
    "q157_pii_scrub" -> {
      val em = CorpusOps.EmailPattern
      val ip = CorpusOps.Ipv4Pattern
      val ph = CorpusOps.PhonePattern
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 7 = 0
         |      THEN ' contact user' || CAST(doc_id AS VARCHAR)
         |        || '@example.com or 10.0.' || CAST(doc_id % 250 AS VARCHAR)
         |        || '.7 now' ELSE '' END
         |      || CASE WHEN doc_id % 11 = 0
         |      THEN ' call +1 555 123 4567' ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g')
         |    AS text_clean,
         |  CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phones
         |FROM planted""".stripMargin
    },
    "q174_url_dedup" ->
      s"""WITH u AS (SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://' ELSE 'https://' END
         |    || source || '.example.com'
         |    || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
         |    || '/p/' || CAST(doc_id % 50 AS VARCHAR)
         |    || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=1'
         |            WHEN doc_id % 3 = 1 THEN '?ref=1' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS url
         |  FROM documents),
         |f AS (SELECT doc_id, regexp_replace(url, '#.*$$', '', 'g') AS s FROM u),
         |t AS (SELECT doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(s,
         |      '&(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*', '', 'g'),
         |      '\\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*&', '?', 'g'),
         |      '\\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*$$', '', 'g') AS s
         |  FROM f),
         |p AS (SELECT doc_id,
         |    regexp_replace(regexp_replace(s,
         |      '^([Hh][Tt][Tt][Pp]://[^/:?#]+):80([/?#]|$$)', '\\1\\2', 'g'),
         |      '^([Hh][Tt][Tt][Pp][Ss]://[^/:?#]+):443([/?#]|$$)', '\\1\\2', 'g') AS s
         |  FROM t),
         |c AS (SELECT doc_id,
         |    lower(regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0))
         |      || substr(s, length(regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1)
         |      AS url_canonical
         |  FROM p)
         |SELECT doc_id, url_canonical,
         |  doc_id = min(doc_id) OVER (PARTITION BY url_canonical) AS kept
         |FROM c""".stripMargin,
    "q182_gopher_ngram_fracs" -> Q182OracleSql,
    "q172_gopher_signals" ->
      s"""WITH src AS (SELECT doc_id,
         |    replace(text, ' merge ', chr(10)) ||
         |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'SUBSCRIBE NOW' ||
         |      chr(10) || 'SUBSCRIBE NOW' || chr(10) || '- bullet item' ||
         |      chr(10) || 'read more...' ELSE '' END AS t
         |  FROM documents),
         |l AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS ln FROM src),
         |nb AS (SELECT doc_id, ln FROM l WHERE trim(ln) <> ''),
         |pl AS (SELECT doc_id, ln, CAST(count(*) AS BIGINT) AS n FROM nb GROUP BY 1, 2),
         |ls AS (SELECT doc_id,
         |    CAST(sum(n) AS BIGINT) AS nl,
         |    CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT) AS dl,
         |    CAST(sum(n * length(ln)) AS BIGINT) AS lc,
         |    CAST(sum(CASE WHEN n >= 2 THEN n * length(ln) ELSE 0 END) AS BIGINT) AS dc,
         |    CAST(sum(CASE WHEN trim(ln) LIKE '-%' OR trim(ln) LIKE '*%'
         |      OR trim(ln) LIKE '•%' THEN n ELSE 0 END) AS BIGINT) AS bl,
         |    CAST(sum(CASE WHEN trim(ln) LIKE '%...' OR trim(ln) LIKE '%…'
         |      THEN n ELSE 0 END) AS BIGINT) AS el
         |  FROM pl GROUP BY 1),
         |tok AS (SELECT doc_id,
         |    list_filter(string_split_regex(trim(t), '[ \\t\\n\\r\\f\\x0B]+'), w -> w <> '') AS tk
         |  FROM src),
         |g2 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
         |    THEN list_transform(generate_series(1, len(tk) - 1),
         |      i -> concat_ws(' ', tk[i], tk[i+1]))
         |    ELSE [] END) AS g FROM tok),
         |c2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt FROM g2 GROUP BY 1, 2),
         |t2 AS (SELECT doc_id,
         |    max(cnt * 1000000000000 + cnt * length(g)) % 1000000000000 AS cov2
         |  FROM c2 GROUP BY 1),
         |g3 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
         |    THEN list_transform(generate_series(1, len(tk) - 2),
         |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
         |    ELSE [] END) AS g FROM tok),
         |c3 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt FROM g3 GROUP BY 1, 2),
         |t3 AS (SELECT doc_id,
         |    max(cnt * 1000000000000 + cnt * length(g)) % 1000000000000 AS cov3
         |  FROM c3 GROUP BY 1)
         |SELECT s.doc_id,
         |  coalesce(ls.nl, 0) AS n_lines,
         |  CASE WHEN coalesce(ls.nl, 0) = 0 THEN 0.0
         |    ELSE CAST(ls.dl AS DOUBLE) / CAST(ls.nl AS DOUBLE) END AS frac_dup_lines,
         |  CASE WHEN coalesce(ls.lc, 0) = 0 THEN 0.0
         |    ELSE CAST(ls.dc AS DOUBLE) / CAST(ls.lc AS DOUBLE) END AS frac_dup_line_chars,
         |  CASE WHEN coalesce(ls.nl, 0) = 0 THEN 0.0
         |    ELSE CAST(ls.bl AS DOUBLE) / CAST(ls.nl AS DOUBLE) END AS frac_bullet_lines,
         |  CASE WHEN coalesce(ls.nl, 0) = 0 THEN 0.0
         |    ELSE CAST(ls.el AS DOUBLE) / CAST(ls.nl AS DOUBLE) END AS frac_ellipsis_lines,
         |  CASE WHEN length(s.t) = 0 THEN 0.0
         |    ELSE CAST(coalesce(t2.cov2, 0) AS DOUBLE) / CAST(length(s.t) AS DOUBLE)
         |  END AS frac_top_2gram_chars,
         |  CASE WHEN length(s.t) = 0 THEN 0.0
         |    ELSE CAST(coalesce(t3.cov3, 0) AS DOUBLE) / CAST(length(s.t) AS DOUBLE)
         |  END AS frac_top_3gram_chars
         |FROM src s LEFT JOIN ls USING (doc_id)
         |LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)""".stripMargin,
    "q158_line_dedup" ->
      s"""WITH src AS (
         |  SELECT doc_id, replace(text, ' merge ', chr(10)) AS t FROM documents),
         |l AS (
         |  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS ln
         |  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM src)),
         |nb AS (
         |  SELECT doc_id, pos, ln,
         |    row_number() OVER (PARTITION BY ln ORDER BY doc_id, pos) AS rn
         |  FROM l WHERE trim(ln) <> ''),
         |kept AS (
         |  SELECT doc_id, pos, ln FROM nb WHERE rn = 1
         |  UNION ALL SELECT doc_id, pos, ln FROM l WHERE trim(ln) = ''),
         |agg AS (
         |  SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text_dedup,
         |    CAST(count(*) AS BIGINT) AS n_lines_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT s.doc_id, coalesce(a.text_dedup, '') AS text_dedup,
         |  coalesce(a.n_lines_kept, 0) AS n_lines_kept
         |FROM src s LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "q86_dup_source_matrix" ->
      s"""WITH pairs AS ($q25Sql),
         |ds AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS src_a,
         |  greatest(a.source, b.source) AS src_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs
         |JOIN ds a ON pairs.d1 = a.doc_id
         |JOIN ds b ON pairs.d2 = b.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "q85_bpe_train" -> bpeOracle(3),
    "q87_bpe_train_local" -> bpeOracle(8),
    "q88_bpe_encode" -> bpeEncodeOracle(8),
    "q93_incremental_dedup" -> q93Sql,
    "q91_token_packing" ->
      s"""WITH ${bpeEncodeCtes(8)},
         |pk AS (SELECT d.doc_id, CAST(d.doc_id % 8 AS BIGINT) AS shard,
         |  CAST(COALESCE(agg.n_subwords, 0) AS BIGINT) AS n_tokens
         |  FROM (SELECT doc_id FROM documents) d LEFT JOIN agg USING (doc_id)),
         |w AS (SELECT doc_id, shard, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM pk)
         |SELECT doc_id, shard, n_tokens, start_offset,
         |  CAST(start_offset // 512 AS BIGINT) AS first_pack,
         |  CAST(greatest(start_offset + n_tokens - 1, start_offset) // 512 AS BIGINT) AS last_pack,
         |  (greatest(start_offset + n_tokens - 1, start_offset) // 512 > start_offset // 512) AS spans_boundary
         |FROM w""".stripMargin,
    "q92_length_percentiles" ->
      s"""WITH g AS (
         |  SELECT source,
         |    list(v ORDER BY v) AS vals, count(*) AS cnt,
         |    CAST(sum(v) AS BIGINT) AS sum_v,
         |    min(v) AS min_v, max(v) AS max_v
         |  FROM (SELECT source, CAST(len($toksSql) AS BIGINT) AS v FROM documents)
         |  GROUP BY source),
         |p AS (
         |  SELECT source, cnt, min_v, max_v,
         |    CAST(sum_v // cnt AS BIGINT) AS mean_v,
         |    CAST(CASE WHEN cnt % 2 = 0
         |      THEN (vals[CAST(cnt//2 AS INT)] + vals[CAST(cnt//2 + 1 AS INT)]) // 2
         |      ELSE vals[CAST(cnt//2 + 1 AS INT)] END AS BIGINT) AS median_v,
         |    vals[CAST(floor(cnt * CAST(0.95 AS DOUBLE)) AS INT) + 1] AS p95_v,
         |    vals[CAST(floor(cnt * CAST(0.99 AS DOUBLE)) AS INT) + 1] AS p99_v,
         |    vals
         |  FROM g)
         |SELECT source, cnt, min_v, max_v, mean_v, median_v, p95_v, p99_v,
         |  CAST(len(list_filter(vals, x -> x < median_v)) AS BIGINT) AS below_p50,
         |  CAST(len(list_filter(vals, x -> x >= median_v AND x < p95_v)) AS BIGINT) AS p50_to_p95,
         |  CAST(len(list_filter(vals, x -> x >= p95_v AND x < p99_v)) AS BIGINT) AS p95_to_p99,
         |  CAST(len(list_filter(vals, x -> x >= p99_v)) AS BIGINT) AS above_p99
         |FROM p""".stripMargin,
    "q89_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
         |c AS (SELECT doc_id, toks, n,
         |  unnest(generate_series(0, CAST(CASE WHEN n = 0 THEN 0
         |    ELSE 1 + (greatest(n - 50, 0) + 24) // 25 END AS BIGINT) - 1)) AS k
         |  FROM m)
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
         |  CAST(k * 25 AS BIGINT) AS chunk_start,
         |  CAST(least(50, n - k * 25) AS BIGINT) AS chunk_len,
         |  array_to_string(list_slice(toks, k * 25 + 1, k * 25 + least(50, n - k * 25)), ' ') AS chunk_text
         |FROM c""".stripMargin,
    "q90_oov_rate" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |v AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM tok GROUP BY w)
         |  ORDER BY cnt DESC, w ASC LIMIT 1000),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |  FROM tok LEFT JOIN v ON tok.w = v.w GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(pd.n_oov, 0) AS BIGINT) AS n_oov,
         |  CAST(CASE WHEN COALESCE(pd.n_tokens, 0) = 0 THEN 0
         |    ELSE pd.n_oov * 1000000 // pd.n_tokens END AS BIGINT) AS oov_ppm
         |FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)""".stripMargin,
    "q84_source_quality" ->
      s"""WITH t AS (SELECT source, text, $toksSql AS toks FROM documents),
         |m AS (SELECT source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN length(text) = 0 THEN 0
         |    ELSE (length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))) * 1000000 // length(text)
         |    END AS BIGINT) AS alpha_ppm,
         |  CAST(CASE WHEN length(text) = 0 THEN 0
         |    ELSE (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1000000 // length(text)
         |    END AS BIGINT) AS digit_ppm
         |  FROM t),
         |q AS (SELECT source, n_tokens, alpha_ppm,
         |  (alpha_ppm >= 500000 AND n_tokens >= 5 AND digit_ppm <= 100000) AS ok FROM m)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens,
         |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
         |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS quality_ok_ppm,
         |  CAST(sum(alpha_ppm) // count(*) AS BIGINT) AS mean_alpha_ppm
         |FROM q GROUP BY source""".stripMargin,
    "q107_cut_repeated_spans" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g0 AS (SELECT doc_id,
         |  unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |    i -> {'pos': i, 's': concat_ws(' ', t[i], t[i+1], t[i+2])})) AS e FROM tok),
         |g AS (SELECT doc_id, e.pos AS pos,
         |  CAST(CAST(concat('0x', substr(md5(e.s), 1, 15)) AS UBIGINT) AS BIGINT) AS h FROM g0),
         |rep AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM g GROUP BY h)
         |  WHERE nd >= 2),
         |cov AS (SELECT DISTINCT doc_id, pos + i AS p
         |  FROM (SELECT g.doc_id, g.pos FROM g JOIN rep USING (h)) m,
         |  (SELECT unnest(generate_series(0, 2)) AS i) off),
         |tk AS (SELECT doc_id, e.p AS p, e.tok AS tok FROM (SELECT doc_id,
         |  unnest(list_transform(generate_series(1, len(t)),
         |    i -> {'p': i, 'tok': t[i]})) AS e FROM tok) t0),
         |kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
         |  LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.p = cov.p
         |  WHERE cov.p IS NULL),
         |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_clean
         |  FROM kept GROUP BY doc_id),
         |nc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut FROM cov GROUP BY doc_id)
         |SELECT tok.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(nc.n_cut, 0) AS BIGINT) AS n_cut,
         |  CAST(CASE WHEN len(t) = 0 THEN 0
         |    ELSE COALESCE(nc.n_cut, 0) * 1000000 // len(t) END AS BIGINT) AS cut_ppm,
         |  COALESCE(reb.text_clean, '') AS text_clean
         |FROM tok LEFT JOIN nc USING (doc_id) LEFT JOIN reb USING (doc_id)""".stripMargin,
    "q109_budget_select" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_t,
         |  CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS n_alpha
         |  FROM t),
         |s AS (SELECT doc_id, n_tokens,
         |  CAST(CASE WHEN n_chars_t = 0 THEN 0 ELSE n_alpha * 1000000 // n_chars_t END AS BIGINT) AS score
         |  FROM m),
         |c AS (SELECT doc_id, score, n_tokens,
         |  sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM s)
         |SELECT doc_id, score, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
         |FROM c WHERE cum <= 10000""".stripMargin,
    "q83_span_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g0 AS (SELECT doc_id,
         |  unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |    i -> {'pos': i, 's': concat_ws(' ', t[i], t[i+1], t[i+2])})) AS e FROM tok),
         |g AS (SELECT doc_id, e.pos AS pos, e.s AS s FROM g0),
         |bench AS (SELECT DISTINCT s FROM g WHERE doc_id % 50 = 0),
         |m AS (SELECT g.doc_id, g.pos FROM g JOIN bench USING (s) WHERE g.doc_id % 50 <> 0),
         |c AS (SELECT doc_id, pos,
         |  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM m),
         |cov AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN prev IS NULL THEN 3 ELSE least(3, pos - prev) END) AS BIGINT) AS n_covered
         |  FROM c GROUP BY doc_id),
         |nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM tok WHERE doc_id % 50 <> 0)
         |SELECT nt.doc_id, n_tokens,
         |  CAST(COALESCE(cov.n_covered, 0) AS BIGINT) AS n_covered,
         |  CAST(CASE WHEN n_tokens = 0 THEN 0
         |    ELSE COALESCE(cov.n_covered, 0) * 1000000 // n_tokens END AS BIGINT) AS covered_ppm
         |FROM nt LEFT JOIN cov USING (doc_id)""".stripMargin,
    "q82_source_overlap" ->
      s"""WITH tok AS (SELECT doc_id, source, $toksSql AS t FROM documents
         |  WHERE source IS NOT NULL),
         |g AS (SELECT source, unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gram FROM tok),
         |sh AS (SELECT DISTINCT source AS src,
         |  CAST(CAST(concat('0x', substr(md5(gram), 1, 15)) AS UBIGINT) AS BIGINT) AS h FROM g),
         |tot AS (SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY src),
         |shared AS (SELECT a.src AS src_a, b.src AS src_b, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.src < b.src
         |  GROUP BY a.src, b.src)
         |SELECT src_a, src_b, n_shared, ta.n_sh AS n_a, tb.n_sh AS n_b,
         |  CAST(n_shared * 1000000 // (ta.n_sh + tb.n_sh - n_shared) AS BIGINT) AS jaccard_ppm
         |FROM shared
         |JOIN tot ta ON ta.src = shared.src_a
         |JOIN tot tb ON tb.src = shared.src_b""".stripMargin,
    "q99_curation_decisions" ->
      s"""WITH tok AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents),
         |flags AS (SELECT doc_id, lang, text,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN length(text) = 0 THEN 0
         |    ELSE (length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))) * 1000000 // length(text) END AS BIGINT) AS alpha_ppm,
         |  CAST(CASE WHEN length(text) = 0 THEN 0
         |    ELSE (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1000000 // length(text) END AS BIGINT) AS digit_ppm,
         |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("en")}, x))) AS BIGINT) AS hits_en,
         |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("de")}, x))) AS BIGINT) AS hits_de,
         |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("fr")}, x))) AS BIGINT) AS hits_fr,
         |  CAST(len(list_filter(toks, x -> list_contains(${vocabSql("es")}, x))) AS BIGINT) AS hits_es
         |  FROM tok),
         |lp AS (SELECT doc_id, lang, n_tokens,
         |  (alpha_ppm >= 500000 AND n_tokens >= 5 AND digit_ppm <= 100000) AS quality_ok,
         |  CASE WHEN length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) > 0 THEN 'zh'
         |       WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
         |       WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de > 0 THEN 'de'
         |       WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
         |       WHEN hits_es > 0 THEN 'es'
         |       ELSE 'unknown' END AS pred_lang
         |  FROM flags),
         |canon AS (SELECT doc_id,
         |  (doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))) AS canonical FROM documents),
         |sh3 AS (SELECT doc_id,
         |  list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
         |  FROM (SELECT doc_id, $toksSql AS t FROM documents)),
         |bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh3 WHERE doc_id % 50 = 0),
         |hits AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_cont
         |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh3 WHERE doc_id % 50 <> 0) c
         |  JOIN bench USING (s) GROUP BY c.doc_id),
         |contam AS (SELECT doc_id, (COALESCE(n_cont, 0) > 0) AS contaminated
         |  FROM sh3 LEFT JOIN hits USING (doc_id) WHERE doc_id % 50 <> 0),
         |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t)-1, 0)),
         |  i -> concat_ws(' ', t[i], t[i+1]))) AS s
         |  FROM (SELECT doc_id, $toksSql AS t FROM documents)),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |dfq AS (SELECT s, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM g GROUP BY s),
         |dfp AS (SELECT s, CAST(CASE WHEN n_docs = 0 THEN 0 ELSE df * 1000000 // n_docs END AS BIGINT) AS df_ppm
         |  FROM dfq, nd),
         |fam AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         |  CAST(CAST(SUM(df_ppm) AS BIGINT) // count(*) AS BIGINT) AS familiarity_ppm
         |  FROM g JOIN dfp USING (s) GROUP BY doc_id)
         |SELECT d.doc_id, lp.n_tokens, lp.quality_ok,
         |  (lp.pred_lang = lp.lang) AS lang_ok, c.canonical,
         |  COALESCE(ct.contaminated, FALSE) AS contaminated,
         |  CAST(COALESCE(f.familiarity_ppm, 0) AS BIGINT) AS familiarity_ppm,
         |  (NOT (d.doc_id % 50 = 0) AND c.canonical AND lp.quality_ok
         |    AND lp.pred_lang = lp.lang AND NOT COALESCE(ct.contaminated, FALSE)
         |    AND COALESCE(f.familiarity_ppm, 0) >= 100000) AS keep,
         |  CASE WHEN d.doc_id % 50 = 0 THEN 'benchmark'
         |       WHEN NOT c.canonical THEN 'exact_dup'
         |       WHEN NOT lp.quality_ok THEN 'low_quality'
         |       WHEN lp.pred_lang <> lp.lang THEN 'lang_mismatch'
         |       WHEN COALESCE(ct.contaminated, FALSE) THEN 'contaminated'
         |       WHEN COALESCE(f.familiarity_ppm, 0) < 100000 THEN 'unfamiliar'
         |       ELSE 'keep' END AS reason
         |FROM documents d
         |JOIN lp USING (doc_id)
         |JOIN canon c USING (doc_id)
         |LEFT JOIN contam ct USING (doc_id)
         |LEFT JOIN fam f USING (doc_id)""".stripMargin,
    "q96_lm_familiarity" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t)-1, 0)),
         |  i -> concat_ws(' ', t[i], t[i+1]))) AS s FROM tok),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |dfq AS (SELECT s, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM g GROUP BY s),
         |dfp AS (SELECT s, CAST(CASE WHEN n_docs = 0 THEN 0 ELSE df * 1000000 // n_docs END AS BIGINT) AS df_ppm
         |  FROM dfq, nd),
         |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         |  CAST(SUM(df_ppm) AS BIGINT) AS sdf, MIN(df_ppm) AS mn, MAX(df_ppm) AS mx
         |  FROM g JOIN dfp USING (s) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
         |  CAST(CASE WHEN COALESCE(p.n_ngrams, 0) = 0 THEN 0 ELSE p.sdf // p.n_ngrams END AS BIGINT) AS familiarity_ppm,
         |  CAST(COALESCE(p.mn, 0) AS BIGINT) AS min_df_ppm,
         |  CAST(COALESCE(p.mx, 0) AS BIGINT) AS max_df_ppm
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,
    "q78_boilerplate_ngrams" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gram FROM tok)
         |SELECT gram, CAST(count(*) AS BIGINT) AS occurrences,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
         |FROM g GROUP BY gram
         |ORDER BY occurrences DESC, gram ASC LIMIT 25""".stripMargin,
    "q79_repeated_spans" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t)-4, 0)),
         |  i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) AS gram FROM tok),
         |h AS (SELECT doc_id,
         |  CAST(CAST(concat('0x', substr(md5(gram), 1, 15)) AS UBIGINT) AS BIGINT) AS h FROM g),
         |freq AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt FROM h GROUP BY h),
         |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
         |  FROM h JOIN freq USING (h) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(COALESCE(p.n_repeated, 0) AS BIGINT) AS n_repeated,
         |  CAST(CASE WHEN COALESCE(p.n_spans, 0) = 0 THEN 0
         |    ELSE COALESCE(p.n_repeated, 0) * 1000000 // p.n_spans END AS BIGINT) AS repeated_ppm
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)""".stripMargin,
    "q80_importance_weights" -> q80Sql,
    "q105_importance_resample" ->
      s"""WITH w AS ($q80Sql),
         |tot AS (SELECT sum(CAST(n_tokens AS HUGEINT) * CAST(score_ppm AS HUGEINT)) AS mass FROM w),
         |sc AS (SELECT CASE
         |    WHEN mass IS NULL OR CAST(8000 AS HUGEINT) >= mass THEN CAST(1000000000000000000 AS BIGINT)
         |    ELSE CAST(CAST(8000 AS HUGEINT) * CAST(1000000000000000000 AS HUGEINT) // mass AS BIGINT)
         |  END AS scale_ppt FROM tot)
         |SELECT w.doc_id, w.n_tokens, w.score_ppm,
         |  least(1000000, CAST(CAST(w.score_ppm AS HUGEINT) * CAST(sc.scale_ppt AS HUGEINT) // 1000000000000 AS BIGINT)) AS keep_ppm,
         |  (CAST(CAST(concat('0x', substr(md5(concat('dsir:', CAST(w.doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) % 1000000 AS BIGINT)
         |    < least(1000000, CAST(CAST(w.score_ppm AS HUGEINT) * CAST(sc.scale_ppt AS HUGEINT) // 1000000000000 AS BIGINT))) AS sampled
         |FROM w CROSS JOIN sc""".stripMargin,
    "q106_mix_plan" ->
      s"""WITH shares(domain, share_ppm) AS (VALUES
         |  ('src1', CAST(300000 AS BIGINT)), ('src2', CAST(250000 AS BIGINT)),
         |  ('src3', CAST(200000 AS BIGINT)), ('src4', CAST(150000 AS BIGINT)),
         |  ('src5', CAST(60000 AS BIGINT)), ('src6', CAST(40000 AS BIGINT))),
         |per_doc AS (SELECT doc_id, source AS domain,
         |  CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents),
         |plan AS (SELECT p.domain,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(min(s.share_ppm), 0) AS BIGINT) AS share_ppm,
         |  CASE WHEN sum(n_tok) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE least(1000000, CAST(CAST(3000 AS HUGEINT) * CAST(COALESCE(min(s.share_ppm), 0) AS HUGEINT) // CAST(sum(n_tok) AS HUGEINT) AS BIGINT))
         |  END AS keep_ppm
         |  FROM per_doc p LEFT JOIN shares s USING (domain) GROUP BY p.domain)
         |SELECT pl.domain, pl.n_docs, pl.n_tokens, pl.share_ppm, pl.keep_ppm,
         |  CAST(sum(CASE WHEN CAST(CAST(concat('0x', substr(md5(concat('mixp:', CAST(p.doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) % 1000000 AS BIGINT) < pl.keep_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN CAST(CAST(concat('0x', substr(md5(concat('mixp:', CAST(p.doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) % 1000000 AS BIGINT) < pl.keep_ppm THEN p.n_tok ELSE 0 END) AS BIGINT) AS sampled_tokens
         |FROM per_doc p JOIN plan pl USING (domain)
         |GROUP BY pl.domain, pl.n_docs, pl.n_tokens, pl.share_ppm, pl.keep_ppm""".stripMargin,
    "q20_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         |  CAST(length(text) AS BIGINT) AS len_chars,
         |  (length(text) = n_chars) AS chars_match,
         |  CASE WHEN len(toks) = 0 THEN 0
         |       ELSE CAST(list_sum(list_transform(toks, t -> length(t))) * 1000000 // len(toks) AS BIGINT)
         |  END AS mean_tok_len_ppm
         |FROM (SELECT doc_id, text, n_chars, $toksSql AS toks FROM documents)""".stripMargin,
    "q39_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]+|[ \\t\\n\\r\\f\\x0B]+')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(CASE WHEN len($toksSql) = 0 THEN 0
         |       ELSE CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]+|[ \\t\\n\\r\\f\\x0B]+')) AS BIGINT) * 1000000 // len($toksSql)
         |  END AS BIGINT) AS fertility_ppm
         |FROM documents""".stripMargin,
    "q21_quality_score" -> q21Sql,
    "q38_corpus_clean" ->
      s"""WITH q21 AS ($q21Sql),
         |q22 AS ($q22Sql),
         |keeps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT q21.doc_id, q21.n_tokens, q21.stopword_ppm, q22.pred_lang
         |FROM q21 JOIN q22 USING (doc_id) JOIN keeps USING (doc_id)
         |WHERE q21.quality_ok AND q22.pred_lang = 'en'""".stripMargin,
    "q22_lang_id" -> q22Sql,
    "q23_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q24_ngram_jaccard" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles FROM tok),
         |ex AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n, unnest(shingles) AS s FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared,
         |    any_value(a.n) AS n1, any_value(b.n) AS n2
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT d1, d2, shared, CAST(shared * 1000000 // (n1 + n2 - shared) AS BIGINT) AS jaccard_ppm
         |FROM pairs WHERE shared * 1000000 // (n1 + n2 - shared) >= 800000""".stripMargin,
    "q25_minhash_lsh" -> q25Sql,
    // q134 recomputes q35's labels with the star-rounds CC, q135 routes
    // them through the pure-SQL table function — identical contract,
    // identical oracle
    "q135_sql_tf_cc" ->
      s"""WITH RECURSIVE pairs AS ($q25Sql),
         |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |verts AS (SELECT DISTINCT a AS id FROM e),
         |cc AS (
         |  SELECT id, id AS comp FROM verts
         |  UNION
         |  SELECT e.b AS id, cc.comp FROM cc JOIN e ON cc.id = e.a
         |),
         |lab AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id)
         |SELECT l.id, l.comp, CAST(c.n AS BIGINT) AS n_members
         |FROM lab l JOIN (SELECT comp, count(*) AS n FROM lab GROUP BY comp) c USING (comp)""".stripMargin,
    "q134_dedup_groups_stars" ->
      s"""WITH RECURSIVE pairs AS ($q25Sql),
         |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |verts AS (SELECT DISTINCT a AS id FROM e),
         |cc AS (
         |  SELECT id, id AS comp FROM verts
         |  UNION
         |  SELECT e.b AS id, cc.comp FROM cc JOIN e ON cc.id = e.a
         |),
         |lab AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id)
         |SELECT l.id, l.comp, CAST(c.n AS BIGINT) AS n_members
         |FROM lab l JOIN (SELECT comp, count(*) AS n FROM lab GROUP BY comp) c USING (comp)""".stripMargin,
    "q35_dedup_groups" ->
      s"""WITH RECURSIVE pairs AS ($q25Sql),
         |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |verts AS (SELECT DISTINCT a AS id FROM e),
         |cc AS (
         |  SELECT id, id AS comp FROM verts
         |  UNION
         |  SELECT e.b AS id, cc.comp FROM cc JOIN e ON cc.id = e.a
         |),
         |lab AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id)
         |SELECT l.id, l.comp, CAST(c.n AS BIGINT) AS n_members
         |FROM lab l JOIN (SELECT comp, count(*) AS n FROM lab GROUP BY comp) c USING (comp)""".stripMargin,
    "q26_simhash" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |hs AS (SELECT doc_id,
         |  list_transform(toks, t ->
         |    CAST(CAST(concat('0x', substr(md5(t), 1, 12)) AS UBIGINT) AS BIGINT)) AS hashes
         |  FROM tok),
         |sg AS (SELECT doc_id,
         |  CAST(list_sum(list_transform(generate_series(0, 47), b ->
         |    CASE WHEN list_sum(list_transform(hashes, h ->
         |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |         THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS sig
         |  FROM hs),
         |bands AS (SELECT doc_id, sig, b.band_idx, (sig >> (b.band_idx*12)) & 4095 AS band_val
         |  FROM sg, (SELECT unnest(generate_series(0, 3)) AS band_idx) b),
         |cand AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2,
         |    any_value(a.sig) AS sig1, any_value(b.sig) AS sig2
         |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |    AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT d1, d2, sig1, sig2, CAST(bit_count(xor(sig1, sig2)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sig1, sig2)) <= 8""".stripMargin,
    "q30_fingerprint" ->
      """WITH fp AS (SELECT source,
        |  list_min(list_transform(generate_series(1, greatest(length(text)-7, 1)),
        |            i -> md5(substr(text, i, 8)))) AS fp
        |  FROM documents)
        |SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_distinct_fp, min(fp) AS min_fp
        |FROM fp GROUP BY source""".stripMargin,
    "q57_sequence_packing" ->
      s"""WITH t AS (SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |w AS (SELECT doc_id, shard, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM t)
         |SELECT doc_id, shard, n_tokens, start_offset,
         |  CAST(start_offset // 2048 AS BIGINT) AS first_pack,
         |  CAST(greatest(start_offset + n_tokens - 1, start_offset) // 2048 AS BIGINT) AS last_pack,
         |  (greatest(start_offset + n_tokens - 1, start_offset) // 2048 > start_offset // 2048) AS spans_boundary
         |FROM w""".stripMargin,
    "q58_stratified_split" ->
      """SELECT doc_id, source AS stratum,
        |  CAST(CAST(concat('0x', substr(md5(concat('graft:', CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) % 1000 AS BIGINT) AS bucket_pm,
        |  CASE WHEN CAST(CAST(concat('0x', substr(md5(concat('graft:', CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) % 1000 AS BIGINT) < 800 THEN 'train'
        |       WHEN CAST(CAST(concat('0x', substr(md5(concat('graft:', CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) % 1000 AS BIGINT) < 900 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q59_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |  i -> concat_ws(' ', t[i], t[i+1], t[i+2])) AS grams FROM t)
         |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_ngrams,
         |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_ngrams,
         |  CAST(CASE WHEN len(grams) = 0 THEN 0
         |    ELSE (len(grams) - len(list_distinct(grams))) * 1000000 // len(grams) END AS BIGINT) AS rep_ppm
         |FROM g""".stripMargin,
    "q62_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles FROM tok),
         |bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0),
         |corpus AS (SELECT doc_id, shingles, CAST(len(shingles) AS BIGINT) AS n_ngrams
         |  FROM sh WHERE doc_id % 50 <> 0),
         |hits AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_cont
         |  FROM (SELECT doc_id, unnest(shingles) AS s FROM corpus) c
         |  JOIN bench USING (s) GROUP BY c.doc_id)
         |SELECT corpus.doc_id, n_ngrams,
         |  CAST(COALESCE(h.n_cont, 0) AS BIGINT) AS n_contaminated,
         |  CAST(CASE WHEN n_ngrams = 0 THEN 0
         |       ELSE COALESCE(h.n_cont, 0) * 1000000 // n_ngrams END AS BIGINT) AS contam_ppm,
         |  (COALESCE(h.n_cont, 0) > 0) AS contaminated
         |FROM corpus LEFT JOIN hits h USING (doc_id)""".stripMargin,
    "q68_decontaminate_norm" ->
      s"""WITH tok AS (SELECT doc_id, $normToksSql AS t FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
         |                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles FROM tok),
         |bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0),
         |corpus AS (SELECT doc_id, shingles, CAST(len(shingles) AS BIGINT) AS n_ngrams
         |  FROM sh WHERE doc_id % 50 <> 0),
         |hits AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_cont
         |  FROM (SELECT doc_id, unnest(shingles) AS s FROM corpus) c
         |  JOIN bench USING (s) GROUP BY c.doc_id)
         |SELECT corpus.doc_id, n_ngrams,
         |  CAST(COALESCE(h.n_cont, 0) AS BIGINT) AS n_contaminated,
         |  CAST(CASE WHEN n_ngrams = 0 THEN 0
         |       ELSE COALESCE(h.n_cont, 0) * 1000000 // n_ngrams END AS BIGINT) AS contam_ppm,
         |  (COALESCE(h.n_cont, 0) > 0) AS contaminated
         |FROM corpus LEFT JOIN hits h USING (doc_id)""".stripMargin,
    "q71_bpe_merges" ->
      s"""WITH w AS (SELECT unnest($toksSql) AS w FROM documents),
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n_occ FROM w GROUP BY w),
         |p AS (SELECT unnest(list_transform(generate_series(1, length(w)-1),
         |                i -> substr(w, i, 2))) AS pair, n_occ
         |  FROM wc WHERE length(w) >= 2),
         |pc AS (SELECT pair, CAST(SUM(n_occ) AS BIGINT) AS cnt FROM p GROUP BY pair),
         |r AS (SELECT pair, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rank FROM pc)
         |SELECT pair, cnt, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 20""".stripMargin,
    "q72_tfidf_keywords" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |s AS (SELECT doc_id, tok, tf, df, CAST(tf * 1000000 // df AS BIGINT) AS score_ppm
         |  FROM tf JOIN df USING (tok)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_ppm DESC, tok ASC) AS rank
         |  FROM s)
         |SELECT doc_id, tok, tf, df, score_ppm, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 3""".stripMargin,
    "q65_train_order" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(CAST(concat('0x', substr(md5(concat('ord:', CAST(doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) AS BIGINT) AS h
        |  FROM documents),
        |s AS (SELECT doc_id, h, CAST(h % 8 AS BIGINT) AS shard FROM t)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS BIGINT) AS pos
        |FROM s""".stripMargin,
    "q66_domain_mix" ->
      """WITH c AS (SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |r AS (SELECT domain, n_docs,
        |  CAST(floor(1000000.0 * sqrt(CAST((SELECT min(n_docs) FROM c) AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS BIGINT) AS keep_ppm
        |  FROM c),
        |d AS (SELECT doc_id, source AS domain,
        |  CAST(CAST(concat('0x', substr(md5(concat('mix:', CAST(doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) % 1000000 AS BIGINT) AS bucket_ppm
        |  FROM documents)
        |SELECT r.domain, r.n_docs, r.keep_ppm,
        |  CAST(SUM(CASE WHEN d.bucket_ppm < r.keep_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM d JOIN r USING (domain) GROUP BY r.domain, r.n_docs, r.keep_ppm""".stripMargin,
    "q60_dedup_apply" ->
      s"""WITH RECURSIVE pairs AS ($q25Sql),
         |e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |verts AS (SELECT DISTINCT a AS id FROM e),
         |cc AS (
         |  SELECT id, id AS comp FROM verts
         |  UNION
         |  SELECT e.b AS id, cc.comp FROM cc JOIN e ON cc.id = e.a
         |),
         |lab AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id),
         |sized AS (SELECT l.id, l.comp, CAST(c.n AS BIGINT) AS n_members
         |  FROM lab l JOIN (SELECT comp, count(*) AS n FROM lab GROUP BY comp) c USING (comp))
         |SELECT d.doc_id, COALESCE(s.comp, d.doc_id) AS canonical_id,
         |  COALESCE(s.n_members, CAST(1 AS BIGINT)) AS cluster_size,
         |  (COALESCE(s.comp, d.doc_id) = d.doc_id) AS kept
         |FROM documents d LEFT JOIN sized s ON s.id = d.doc_id""".stripMargin
  )
}
