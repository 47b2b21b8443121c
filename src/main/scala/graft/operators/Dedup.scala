package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import Checkpoints.CheckpointOps

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison. Exact
  * dedup is a hash groupBy; the near-dup variants (n-gram Jaccard, MinHash
  * LSH, SimHash LSH) generate bounded candidate pairs via inverted-index /
  * bucket joins — the classic shingle→sketch→band→bucket pipeline — and
  * verify only candidates. All hashing is md5-derived and engine-portable,
  * so each operator has a DuckDB oracle.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct content,
    * keeping the smallest id as canonical representative. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies")
      )

  /** df + a `shingles` column: distinct word n-gram shingles of `textCol`. */
  def withShingles(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.withColumn("shingles", array_distinct(wordShingles(tokens(col(textCol)), n)))

  /** Relational shingle table: one row per DISTINCT (id, shingle), plus the
    * doc's distinct-shingle count. posexplode + window `lead`s instead of a
    * higher-order transform chain: HOFs run interpreted (no codegen) and
    * profile ~6x slower per row; the window formulation stays inside
    * whole-stage codegen and its shuffle on `id` is reused by the
    * downstream per-doc aggregations. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc").orderBy("pos")
    val withLeads = (1 until n).foldLeft(toks) { case (d, i) =>
      d.withColumn(s"t$i", lead(col("tok"), i).over(w))
    }
    val shingle = concat_ws(" ", (col("tok") +: (1 until n).map(i => col(s"t$i"))): _*)
    withLeads
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc"), shingle.as("s"))
      .distinct()
      .withColumn("n_shingles",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc")))
  }

  /** Raw (doc[, carry...][, pos], s) shingle rows — NOT deduplicated — via
    * posexplode + window leads (codegen'd; see [[shingleTable]] for why
    * not HOFs). One shuffle on doc (the window), reused by any downstream
    * per-doc aggregation. Shared with the corpus-hygiene operators
    * (boilerplate detection, repeated-span coverage, span-level
    * decontamination, source overlap) — `keepPos` keeps the 0-based start
    * position, `carry` threads extra per-document columns of `df` through
    * the window (they must be functionally determined by the document). */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int,
                  keepPos: Boolean = false, carry: Seq[String] = Nil): DataFrame = {
    val toks = df.select(
      (col(idCol).as("doc") +: carry.map(col)) :+
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")): _*)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc").orderBy("pos")
    val withLeads = (1 until n).foldLeft(toks) { case (d, i) =>
      d.withColumn(s"t$i", lead(col("tok"), i).over(w))
    }
    val shingle = concat_ws(" ", (col("tok") +: (1 until n).map(i => col(s"t$i"))): _*)
    val keep = (col("doc") +: carry.map(col)) ++
      (if (keepPos) Seq(col("pos")) else Nil) :+ shingle.as("s")
    withLeads.filter(col(s"t${n - 1}").isNotNull).select(keep: _*)
  }

  /** Per-doc distinct shingle sets, hash-ordered: (doc, sh:
    * array<struct<h,s>> sorted by (h, s), ns). Single aggregation pass —
    * the collect_set dedups, sort_array is a native (non-lambda) sort,
    * and md5 runs once per raw shingle row. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleRows(df, idCol, textCol, n)
      .withColumn("hs", struct(hash60(col("s")).as("h"), col("s").as("s")))
      .groupBy(col("doc"))
      .agg(sort_array(collect_set(col("hs"))).as("sh"))
      .withColumn("ns", size(col("sh")).cast("long"))

  /** Exact n-gram Jaccard near-dup pairs with AllPairs prefix filtering
    * (Bayardo et al.): each doc's distinct shingles carry a deterministic
    * global order (md5 hash, then the string); only the first
    * `n - ceil(t*n) + 1` are indexed for the candidate self-join — if two
    * sets' prefixes are disjoint their overlap is provably below the
    * Jaccard-t requirement, so the prune is LOSSLESS. Candidates are then
    * verified exactly against the full shingle-set arrays. Compared to a
    * full inverted index this cuts the index ~(1-t)x and the candidate
    * pairs quadratically; every step is an equi-join or a per-doc
    * aggregation, so the plan shape survives 100 TB.
    *
    * A length-ratio band (J >= t forces |S1|/|S2| in [t, 1/t]) prunes
    * candidates before the distinct. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int, minJaccardPpm: Long): DataFrame = {
    // The per-doc set table feeds FOUR plan branches (both prefix-join
    // sides + both verify joins); without materialization Catalyst
    // re-executes the explode+window+aggregate pipeline per branch
    // (exchange reuse can't apply — each branch projects differently
    // above the aggregate). One localCheckpoint = one compute. At
    // cluster scale this is the materialize-the-sketch-table pattern
    // (persist to reliable storage there).
    val sets = shingleSets(df, idCol, textCol, n).stageCheckpoint()
    // ceil(t*ns) in exact integer ppm math
    val prefLen = col("ns") - intDiv(col("ns") * minJaccardPpm + 999999L, lit(1000000L)) + 1L
    val pref = sets
      .select(col("doc"), col("ns"), explode(slice(col("sh"), lit(1), prefLen)).as("e"))
      .select(col("doc"), col("ns"), col("e.h").as("h"))
    val a = pref.select(col("doc").as("d1"), col("ns").as("pn1"), col("h"))
    val b = pref.select(col("doc").as("d2"), col("ns").as("pn2"), col("h"))
    // Candidacy on the 60-bit hash alone: a collision can only ADD a
    // candidate, and every candidate is exactly verified below — lossless.
    val cand = a.join(b, Seq("h"))
      .filter(col("d1") < col("d2"))
      .filter(col("pn1") * 1000000L >= col("pn2") * minJaccardPpm &&
              col("pn2") * 1000000L >= col("pn1") * minJaccardPpm)
      .select(col("d1"), col("d2")).distinct()
    // Verify against the 60-bit hash LONG arrays (`sh.h` field
    // extraction): array_intersect has a hash-set fast path for atomic
    // element types but falls back to brute-force pairwise struct
    // equality otherwise (~20x slower here), and long probes beat string
    // probes. Distinct shingles map 1:1 to distinct h values for any
    // realistic corpus (md5-60 collision odds ~1e-10 across this join).
    cand
      .join(sets.select(col("doc").as("d1"), col("sh.h").as("sh1"), col("ns").as("n1")), Seq("d1"))
      .join(sets.select(col("doc").as("d2"), col("sh.h").as("sh2"), col("ns").as("n2")), Seq("d2"))
      .withColumn("shared", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard_ppm", intDiv(col("shared") * 1000000L, col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("d1"), col("d2"), col("shared"), col("jaccard_ppm"))
  }

  /** Universal-hash MinHash family: ONE md5 per shingle (31-bit base hash),
    * then `k` cheap integer permutations `(a_i*h + b_i) mod (2^31-1)`.
    * Constants are deterministic so the DuckDB oracle can inline them. */
  val MinhashP: Long = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = ((2L * i + 1) * 2654435761L % MinhashP) | 1L
  def minhashB(i: Int): Long = (i + 1L) * 40503L * 65537L % MinhashP

  /** 31-bit md5-derived base hash (8 hex digits, sign bit cleared). */
  def hash31(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long").bitwiseAND(lit(0x7fffffffL))

  /** MinHash signature column: `k` min-hashes over the distinct shingle
    * set. One fold over the base-hash array (md5 per shingle computed
    * exactly once — the array is referenced a single time, so projection
    * collapse can't re-inline it k times). */
  def withMinhashSignature(df: DataFrame, k: Int): DataFrame = {
    val as = typedlit((0 until k).map(minhashA))
    val bs = typedlit((0 until k).map(minhashB))
    df.withColumn("base_hashes", transform(col("shingles"), s => hash31(s)))
      .withColumn(
        "minhash",
        aggregate(
          col("base_hashes"),
          array_repeat(lit(Long.MaxValue), k),
          (acc, h) =>
            zip_with(acc, sequence(lit(0), lit(k - 1)),
              (m, i) => least(m, (element_at(as, i + 1) * h + element_at(bs, i + 1)) % MinhashP))
        )
      )
      .drop("base_hashes")
  }

  /** MinHash + LSH near-dup candidates: signatures are cut into
    * `k / bandSize` bands; docs sharing any band hash become candidates;
    * candidates are verified with exact Jaccard (no false positives
    * survive). Fully relational single pass: the k min-hashes are k plain
    * `min()` aggregates over the exploded shingle table (codegen'd,
    * map-side combined) — no per-row lambda folds — and the shingle set
    * for verification is collected in the same aggregation.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, bandSize: Int, minJaccardPpm: Long): DataFrame =
    minhashLshPairsFromSig(
      // Materialized once: the signature table feeds both band-join sides
      // and both verify joins; Catalyst would otherwise recompute the
      // shingle+aggregate pipeline per branch.
      minhashSigTable(df, idCol, textCol, n, k).stageCheckpoint(),
      k, bandSize, minJaccardPpm)

  /** The MinHash sketch table behind [[minhashLshPairs]]: one row per doc
    * with its distinct shingle set and the `k` min-hashes —
    * `(doc, shingles, mh0..mh{k-1}, ns)`. Split out so the sketch can be
    * materialized ONCE per corpus (it is the IVF-index analogue for
    * near-dup work: q25's pair finding, the q35/q60/q86 pair graph, and
    * any future band tuning all consume the same table instead of
    * re-running the shingle+aggregate pipeline per consumer). */
  def minhashSigTable(df: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int): DataFrame = {
    // Raw (not distinct) shingle rows: min() is duplicate-insensitive and
    // collect_set dedups, so the pre-aggregation distinct pass (an extra
    // shuffle) is unnecessary.
    shingleRows(df, idCol, textCol, n)
      .withColumn("h31", hash31(col("s")))
      .groupBy(col("doc"))
      .agg(
        collect_set(col("s")).as("shingles"),
        (0 until k).map(i =>
          min((lit(minhashA(i)) * col("h31") + lit(minhashB(i))) % MinhashP).as(s"mh$i")): _*)
      .withColumn("ns", size(col("shingles")).cast("long"))
  }

  /** The LSH band rows of a [[minhashSigTable]] frame:
    * (doc, ns, band_idx, band_hash). Band rows carry only (doc, ns) ints —
    * the shingle arrays attach AFTER any rollup, once per surviving
    * candidate pair, instead of riding every band-collision row through
    * the count shuffle. */
  def sigBands(sig: DataFrame, k: Int, bandSize: Int): DataFrame = {
    val bandCols = (0 until k / bandSize).map { bIdx =>
      md5(concat_ws("|",
        (0 until bandSize).map(j => col(s"mh${bIdx * bandSize + j}").cast("string")): _*))
    }
    sig.select(
      col("doc"), col("ns"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Band + verify over a pre-built [[minhashSigTable]] frame (already
    * materialized by the caller — checkpointed or read back from storage).
    * Output is order-insensitive in the sketch's shingle-array order, so a
    * parquet round-trip of the sketch changes nothing. */
  def minhashLshPairsFromSig(sig: DataFrame, k: Int, bandSize: Int,
                             minJaccardPpm: Long): DataFrame = {
    val bands = sigBands(sig, k, bandSize)
    val a = bands.select(col("band_idx"), col("band_hash"), col("doc").as("d1"), col("ns").as("n1"))
    val b = bands.select(col("band_idx"), col("band_hash"), col("doc").as("d2"), col("ns").as("n2"))
    val cand = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("d1") < col("d2"))
      // Exact length-ratio prune (J >= t forces |S1|/|S2| in [t, 1/t]).
      .filter(col("n1") * 1000000L >= col("n2") * minJaccardPpm &&
              col("n2") * 1000000L >= col("n1") * minJaccardPpm)
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_shared_bands"), first(col("n1")).as("n1"), first(col("n2")).as("n2"))
    cand
      .join(sig.select(col("doc").as("d1"), col("shingles").as("sh1")), Seq("d1"))
      .join(sig.select(col("doc").as("d2"), col("shingles").as("sh2")), Seq("d2"))
      .withColumn("shared", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard_ppm",
        intDiv(col("shared") * 1000000L, col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("d1"), col("d2"), col("n_shared_bands"), col("shared"), col("jaccard_ppm"))
  }

  /** INCREMENTAL near-dup matching — the production shape for continuous
    * ingestion: match a NEW batch's sketch table against the STORED corpus
    * sketch ([[minhashSigTable]], the table a 100 TB pipeline keeps next
    * to the corpus) without recomputing or re-pairing the existing corpus.
    * "Which of today's crawl is already in the corpus" costs one band
    * equi-join of batch-bands × corpus-bands — candidate volume scales
    * with the BATCH, never corpus², and the corpus side is touched only
    * through its stored sketch.
    *
    * Output: every (new doc, existing doc) pair sharing >= 1 LSH band
    * whose exact verified Jaccard clears `minJaccardPpm` —
    * (d_new, d_old, n_shared_bands, shared, jaccard_ppm). Within-batch
    * duplicates are [[minhashLshPairsFromSig]] on the batch sketch alone;
    * the two compose into the full incremental-dedup decision. */
  def minhashMatchesAgainst(newSig: DataFrame, existingSig: DataFrame,
                            k: Int, bandSize: Int, minJaccardPpm: Long): DataFrame = {
    val a = sigBands(newSig, k, bandSize)
      .select(col("band_idx"), col("band_hash"), col("doc").as("d_new"), col("ns").as("n1"))
    val b = sigBands(existingSig, k, bandSize)
      .select(col("band_idx"), col("band_hash"), col("doc").as("d_old"), col("ns").as("n2"))
    val cand = a.join(b, Seq("band_idx", "band_hash"))
      // Exact length-ratio prune (J >= t forces |S1|/|S2| in [t, 1/t]).
      .filter(col("n1") * 1000000L >= col("n2") * minJaccardPpm &&
              col("n2") * 1000000L >= col("n1") * minJaccardPpm)
      .groupBy(col("d_new"), col("d_old"))
      .agg(count(lit(1)).as("n_shared_bands"), first(col("n1")).as("n1"), first(col("n2")).as("n2"))
    cand
      .join(newSig.select(col("doc").as("d_new"), col("shingles").as("sh1")), Seq("d_new"))
      .join(existingSig.select(col("doc").as("d_old"), col("shingles").as("sh2")), Seq("d_old"))
      .withColumn("shared", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard_ppm",
        intDiv(col("shared") * 1000000L, col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("d_new"), col("d_old"), col("n_shared_bands"), col("shared"), col("jaccard_ppm"))
  }

  /** SimHash (48-bit) over the token multiset: per bit, tokens vote
    * +1/−1 by their hash bit; the sign of the vote sets the bit.
    * One fold over the token-hash array accumulating all 48 bit counters —
    * md5 per token is computed exactly once (a per-bit formulation would
    * re-inline the hash array into 48 aggregates and recompute md5 48x). */
  def simhash48(toks: Column): Column = {
    val hashes = transform(toks, t => hash48(t))
    val bitSums = aggregate(
      hashes,
      array_repeat(lit(0L), 48),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(47)),
          (a, b) => a + when(shr(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
    )
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(47)), (s, b) => when(s > 0, shl(lit(1L), b)).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x)
    )
  }

  /** SimHash LSH near-dup pairs: 48-bit simhash, bucketed on 4 12-bit
    * bands (any equal band → candidate), verified by Hamming distance.
    * Relational signature: explode the token multiset, hash once per
    * token, then 48 plain conditional-sum aggregates per doc (codegen'd,
    * map-side combined) — same math as [[simhash48]], none of the
    * interpreted lambda-fold overhead. */
  /** Relational 48-bit simhash per id — same math as [[simhash48]]
    * (cross-checked in CatalystNativeSpec), executed as 48 codegen'd
    * conditional-sum aggregates over the exploded token multiset. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", hash48(col("tok")))
    val bitAggs = (0 until 48).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$b")
    }
    val sums = toks.groupBy("doc").agg(bitAggs.head, bitAggs.tail: _*)
    val sigExpr = (0 until 48)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _) // bits are disjoint: sum == bitwise OR
    sums.select(col("doc"), sigExpr.as("sig"))
  }

  /** Connected components over an undirected pair graph — the cluster
    * step of near-dup resolution (every doc in a component keeps one
    * canonical representative: the min id). Iterative min-label
    * propagation: each round every vertex takes the min of its own label
    * and its neighbors' labels; converges in O(component diameter)
    * rounds (near-dup clusters are shallow — a handful of rounds).
    * Each round is one equi-join + one aggregation, both distributed;
    * the per-round checkpoint ([[Checkpoints.stage]]) truncates the
    * growing lineage so Catalyst re-plans per round instead of
    * re-analyzing the whole history (on a real cluster flip
    * `graft.checkpoint.reliable=true` to route it to reliable storage —
    * executor loss under localCheckpoint forfeits the partiality). At
    * extreme scale [[connectedComponentsStars]] is the alternative: edge
    * set only as state, no |V| label table riding every round. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .stageCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).stageCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy(edges("dst").as("nid"))
        .agg(min(col("comp")).as("nbr_comp"))
      // prev rides along so convergence needs no re-join against the old
      // labels; comp1 is the post-propagation label.
      val propagated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp1"))
      // Pointer-jumping shortcut (comp := comp's comp): labels always point
      // at real vertex ids, so one extra self-join halves the remaining
      // propagation distance — O(log diameter) rounds total instead of
      // O(diameter).
      val nextWithPrev = propagated.as("l")
        .join(propagated.select(col("id").as("cid"), col("comp1").as("ccomp")),
          col("l.comp1") === col("cid"))
        .select(col("l.id").as("id"), col("prev"),
          least(col("l.comp1"), col("ccomp")).as("comp"))
      // Convergence detection rides the checkpoint-materialization job
      // itself (CollectMetrics accumulators via observe()) — no separate
      // join+count job per round. Round 1 always changes labels when
      // edges exist, so its metric is not even read.
      val observed = nextWithPrev.observe(s"cc_iter_$iter",
        sum(when(col("comp") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
        .drop("prev")
      val next = observed.stageCheckpoint()
      // A missing metric KEY must fail loudly, not read as converged —
      // defaulting to 0 would silently terminate with wrong labels if the
      // observe() plumbing ever broke. A present key with a NULL value is
      // different: sum() over zero rows, i.e. an empty label frame, which
      // genuinely is convergence.
      val changed =
        if (iter == 0) 1L
        else {
          val row = observed.queryExecution.observedMetrics.getOrElse(s"cc_iter_$iter",
            throw new IllegalStateException(
              s"connectedComponents: observed metric cc_iter_$iter missing after materialization"))
          Option(row.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
        }
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Connected components via ALTERNATING large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SOCC'14 — public algorithm, independently implemented) — the
    * extreme-scale alternative [[connectedComponents]]'s scaladoc
    * reserves. Same output contract: one (id, comp) row per vertex, comp
    * = the component's min id.
    *
    * Why a second formulation: label propagation keeps TWO tables alive
    * every round (the full |V| label table AND the static edge set) and
    * runs three joins per round (neighbor-min, label update, pointer
    * jump). The star rounds keep ONLY the edge set — each round rewrites
    * it in place, monotonically shrinking total edge length — with one
    * groupBy + one same-key join per phase (the join reuses the groupBy's
    * partitioning, so each phase is ~2 shuffles, both on the vertex id).
    * Rounds are O(log² n) worst-case, O(log n) observed; at convergence
    * every component is a star: each non-root vertex carries exactly one
    * edge, pointing at the component min.
    *
    *  - large-star: every vertex u connects its LARGER neighbors to
    *    m(u) = min(N(u) ∪ u) — emitted as (v, m) for v ∈ N(u), v > u.
    *  - small-star: edges canonicalized larger→smaller; every vertex u
    *    connects its (all smaller) neighbors and itself to m(u).
    *
    * Both phases preserve connectivity and never invent it (edges only
    * ever connect vertices already in one component). Convergence is
    * detected with a FREE per-round fingerprint — (edge count,
    * xor of xxhash64(u,v)) observed on the checkpoint-materialization job
    * itself, the [[connectedComponents]] observe() discipline — and then
    * CONFIRMED exactly with one `except` check before the loop exits, so
    * a fingerprint collision can stall a round but never return wrong
    * labels. Fails loudly if `maxIter` rounds pass without convergence —
    * never silently-partial labels. */
  def connectedComponentsStars(pairs: DataFrame, aCol: String, bCol: String,
                               maxIter: Int = 50): DataFrame = {
    val nodes = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id"))).distinct().stageCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val canon = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val mins = canon.groupBy(col("u")).agg(min(col("v")).as("m"))
      val viaNbr = canon.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val self = mins.select(col("u"), col("m").as("v"))
      viaNbr.union(self).filter(col("u") =!= col("v")).distinct()
    }

    var edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v")).distinct().stageCheckpoint()
    var prevFingerprint: Option[(Long, Long)] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prev = edges
      val observed = smallStar(largeStar(edges)).observe(s"ccs_iter_$iter",
        count(lit(1)).as("cnt"),
        expr("bit_xor(xxhash64(u, v))").as("fp"))
      val next = observed.stageCheckpoint()
      val row = observed.queryExecution.observedMetrics.getOrElse(s"ccs_iter_$iter",
        throw new IllegalStateException(
          s"connectedComponentsStars: observed metric ccs_iter_$iter missing after materialization"))
      val cnt = Option(row.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val fp = Option(row.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      // fingerprint repeat is only the TRIGGER; equality is confirmed
      // exactly (both frames are materialized distinct sets with equal
      // counts, so one empty `except` proves set equality)
      if (prevFingerprint.contains((cnt, fp)))
        converged = next.except(prev).isEmpty
      prevFingerprint = Some((cnt, fp))
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStars: no convergence after $maxIter rounds - raise maxIter")
    nodes.join(edges, nodes("id") === edges("u"), "left")
      .select(nodes("id"), coalesce(edges("v"), nodes("id")).as("comp"))
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    // Materialized once — consumed by both band-join sides (see q25).
    val sigs = simhashTable(df, idCol, textCol).stageCheckpoint()
    val bands = sigs.select(
      col("doc"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(3)), b => shr(col("sig"), b * 12).bitwiseAND(lit(0xfffL)))
      ).as(Seq("band_idx", "band_val"))
    )
    val a = bands.select(col("band_idx"), col("band_val"), col("doc").as("d1"), col("sig").as("sig1"))
    val b = bands.select(col("band_idx"), col("band_val"), col("doc").as("d2"), col("sig").as("sig2"))
    // First-matching-band dedup: a pair is emitted only from the lowest
    // band index where the signatures agree — every earlier band must
    // differ. Replaces the per-pair groupBy rollup (a 200k+-group shuffle
    // at sf0.1) with a codegen'd integer filter on the join output.
    def bandOf(sig: Column, j: Int): Column = shr(sig, lit(j * 12)).bitwiseAND(lit(0xfffL))
    val firstMatch = (0 until 4).map { i =>
      (col("band_idx") === i) && (0 until i)
        .map(j => bandOf(col("sig1"), j) =!= bandOf(col("sig2"), j))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("d1") < col("d2"))
      .filter(firstMatch)
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("sig1"), col("sig2"), col("hamming"))
  }
}
