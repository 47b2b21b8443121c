package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases for the corpus-assembly operators that the sf documents
  * tables don't exercise: empty documents inside a pack stream, documents
  * larger than the pack budget, split-boundary buckets, single-doc
  * "clusters", and shard-local offset isolation.
  */
class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("piiScrub: masks emails/IPs/phones with exact counts; clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (0L, "mail a.b-c_1@sub.example.org and x@y.io today"),
      (1L, "server 10.0.200.7 and 192.168.1.1 up"),
      (2L, "call +1 555 123 4567 or +44 (20) 1234-5678 now"),
      (3L, "plain text, no pii at all"),
      (4L, "")).toDF("doc_id", "text")
    val out = CorpusOps.piiScrub(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "mail <EMAIL> and <EMAIL> today")
    assert(out(0).getLong(2) == 2L && out(0).getLong(3) == 0L && out(0).getLong(4) == 0L)
    assert(out(1).getString(1) == "server <IP> and <IP> up")
    assert(out(1).getLong(3) == 2L)
    assert(out(2).getString(1) == "call <PHONE> or <PHONE> now")
    assert(out(2).getLong(4) == 2L)
    assert(out(3).getString(1) == "plain text, no pii at all")
    assert((out(3).getLong(2), out(3).getLong(3), out(3).getLong(4)) == ((0L, 0L, 0L)))
    assert(out(4).getString(1) == "")
  }

  test("canonicalizeUrl + urlDedup: case/port/fragment/tracking variants collapse; path case kept") {
    import spark.implicits._
    val docs = Seq(
      (0L, "HTTPS://Ex.com:443/Path?utm_source=x&id=2#top"),
      (1L, "https://ex.com/Path?id=2"),
      (2L, "https://ex.com/path?id=2"), // path case DIFFERS -> distinct
      (3L, "http://a.org:80/?utm_a=1&utm_b=2"),
      (4L, "http://a.org/"),
      (5L, "http://a.org/?fbclid=zz&keep=1&gclid=q")).toDF("doc_id", "url")
    val out = CorpusOps.urlDedup(docs, "doc_id", "url").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "https://ex.com/Path?id=2", out(0).getString(1))
    assert(out(1).getString(1) == "https://ex.com/Path?id=2")
    assert(out(2).getString(1) == "https://ex.com/path?id=2")
    assert(out(3).getString(1) == "http://a.org/")
    assert(out(5).getString(1) == "http://a.org/?keep=1", out(5).getString(1))
    // kept = first doc per canonical group
    assert(out.map(_.getBoolean(2)).toSeq ==
      Seq(true, false, true, true, false, true))
  }

  test("canonicalizeUrl: port stripping is scheme-aware — :443 on http / :80 on https kept") {
    import spark.implicits._
    val docs = Seq(
      (0L, "http://b.org:443/x"),  // NOT http's default port: a real resource
      (1L, "http://b.org/x"),
      (2L, "https://b.org:80/x"),  // NOT https' default port either
      (3L, "https://b.org/x")).toDF("doc_id", "url")
    val out = CorpusOps.urlDedup(docs, "doc_id", "url").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "http://b.org:443/x", out(0).getString(1))
    assert(out(2).getString(1) == "https://b.org:80/x", out(2).getString(1))
    // four DISTINCT resources: nothing merges, every doc kept
    assert(out.map(_.getString(1)).distinct.length == 4)
    assert(out.forall(_.getBoolean(2)))
  }

  test("gopherSignals: duplicate-line, bullet/ellipsis, and top-ngram fractions, hand-checked") {
    import spark.implicits._
    val docs = Seq(
      // 4 lines: "a b" twice (dup), a bullet, an ellipsis; text len 28
      (0L, "a b\na b\n- item\nwait for it..."),
      // no duplicates, no markers; top 2-gram "x y" occurs 2x
      (1L, "x y z x y"),
      (2L, "")).toDF("doc_id", "text")
    val out = CorpusOps.gopherSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val d0 = out(0)
    assert(d0.getLong(1) == 4L, "n_lines")
    assert(d0.getDouble(2) == 0.5, "2 of 4 lines are duplicates")
    assert(d0.getDouble(4) == 0.25, "one bullet line")
    assert(d0.getDouble(5) == 0.25, "one ellipsis line")
    val d1 = out(1)
    assert(d1.getLong(1) == 1L)
    assert(d1.getDouble(2) == 0.0 && d1.getDouble(4) == 0.0)
    // "x y" occurs 2x, len 3, text len 9 -> 6/9
    assert(d1.getDouble(6) == 6.0 / 9.0, s"top-2gram frac: ${d1.getDouble(6)}")
    val d2 = out(2)
    assert(d2.getLong(1) == 0L && (2 to 7).forall(i => d2.getDouble(i) == 0.0),
      "empty doc -> all-zero signals")
  }

  test("piiScrub: out-of-range octets are not IPs; 255 boundary is; over-mask trade pinned") {
    import spark.implicits._
    val docs = Seq(
      (0L, "bogus 999.999.999.999 and 256.1.1.1 stay"),
      (1L, "edge 255.255.255.255 and 0.0.0.0 go"),
      (2L, "version 1.2.3.4.5 over-masks its head")).toDF("doc_id", "text")
    val out = CorpusOps.piiScrub(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "bogus 999.999.999.999 and 256.1.1.1 stay")
    assert(out(0).getLong(3) == 0L, "invalid octets must not count as IPs")
    assert(out(1).getString(1) == "edge <IP> and <IP> go")
    assert(out(1).getLong(3) == 2L)
    // documented trade: the leading 4 octets of a longer dotted string
    // still mask (safe direction; see Ipv4Pattern's scaladoc)
    assert(out(2).getString(1) == "version <IP>.5 over-masks its head")
  }

  test("lineDedup: first (id, pos) occurrence wins; blanks always kept; all-dup doc empties") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha\nbeta\n\nalpha"),   // in-doc repeat of alpha at pos 3
      (1L, "beta\ngamma"),            // beta already seen in doc 0
      (2L, "alpha\nbeta")             // fully duplicated -> only blanks survive (none)
    ).toDF("doc_id", "text")
    val out = CorpusOps.lineDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "alpha\nbeta\n")  // trailing blank line kept
    assert(out(0).getLong(2) == 3L)
    assert(out(1).getString(1) == "gamma" && out(1).getLong(2) == 1L)
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 0L)
  }

  test("domainFilter: registrable-domain semantics, lookalikes kept, non-URLs kept") {
    import spark.implicits._
    val docs = Seq(
      (0L, "https://bad.com/x"),                    // exact block
      (1L, "https://a.b.bad.com/x?q=1"),            // subdomain blocked
      (2L, "https://notbad.com/x"),                 // lookalike suffix kept
      (3L, "HTTPS://user:pw@BAD.COM:8443/path"),    // case/userinfo/port stripped
      (4L, "plain text, not a url"),                // no host -> kept
      (5L, "https://ok.org/y")
    ).toDF("doc_id", "url")
    val out = CorpusOps.domainFilter(docs, "doc_id", "url", Seq("bad.com"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("bad.com", "a.b.bad.com", "notbad.com", "bad.com", "", "ok.org"))
    assert(out.map(r => Option(r.getString(2))).toSeq ==
      Seq(Some("bad.com"), Some("bad.com"), None, Some("bad.com"), None, None))
    assert(out.map(_.getBoolean(3)).toSeq ==
      Seq(false, false, true, false, true, true))
    intercept[IllegalArgumentException] {
      CorpusOps.domainFilter(docs, "doc_id", "url", Seq("Bad.com"))
    }
  }

  test("packSequences: offsets, boundary spans, empty and oversize docs") {
    import spark.implicits._
    // one shard (nShards=1) so the stream is fully deterministic here:
    // tokens 3, 0, 10, 2  with budget 4
    val docs = Seq((0L, 3L), (1L, 0L), (2L, 10L), (3L, 2L)).toDF("doc_id", "n")
    val out = CorpusOps.packSequences(docs, "doc_id", $"n", budget = 4L, nShards = 1)
      .orderBy("doc_id")
      .select("n_tokens", "start_offset", "first_pack", "last_pack", "spans_boundary")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out(0) == ((3L, 0L, 0L, 0L, false)))   // tokens [0,2] in pack 0
    assert(out(1) == ((0L, 3L, 0L, 0L, false)))   // empty doc occupies no tokens
    assert(out(2) == ((10L, 3L, 0L, 3L, true)))   // [3,12]: spans packs 0..3
    assert(out(3) == ((2L, 13L, 3L, 3L, false)))  // [13,14] in pack 3
  }

  test("budgetSelect: hand-computed prefix, boundary stop, class tie-break") {
    import spark.implicits._
    // (id, score, tokens): global order by (score DESC, id ASC) is
    // 4(9,3) 1(7,4) 3(7,5) 0(5,10) 2(1,1); cumsums 3,7,12,22,23.
    val docs = Seq((0L, 5L, 10L), (1L, 7L, 4L), (2L, 1L, 1L), (3L, 7L, 5L), (4L, 9L, 3L))
      .toDF("doc_id", "score", "n")
    val got = CorpusOps.budgetSelect(docs, "doc_id", $"n", $"score", budgetTokens = 12L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // budget 12 admits 4, 1, 3 (cum 3, 7, 12); doc 0 would hit 22 — and
    // nothing after the boundary re-enters (prefix semantics: doc 2 with
    // 1 token is NOT picked up even though 12 + 1 <= budget fails anyway;
    // with budget 13 doc 0 still overflows and doc 2 stays excluded)
    assert(got == Set((4L, 9L, 3L, 3L), (1L, 7L, 4L, 7L), (3L, 7L, 5L, 12L)))
    val got13 = CorpusOps.budgetSelect(docs, "doc_id", $"n", $"score", budgetTokens = 13L)
      .collect().map(_.getLong(0)).toSet
    assert(got13 == Set(4L, 1L, 3L), "prefix stops at the first overflow, no re-entry")
  }

  test("budgetSelect: equals the naive global-window formulation on random corpora") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(11L, 12L, 13L)) {
      val rnd = new scala.util.Random(seed)
      // small score domain → heavy ties (the per-class window's hard case)
      val docs = (0L until 500L).map(i =>
        (i, rnd.nextInt(7).toLong, 1L + rnd.nextInt(20).toLong))
        .toDF("doc_id", "score", "n")
      val budget = 1000L + rnd.nextInt(2000)
      val naive = docs
        .withColumn("cum_tokens", sum($"n").over(
          Window.orderBy($"score".desc, $"doc_id".asc)))
        .filter($"cum_tokens" <= budget)
        .select($"doc_id", $"score", $"n".as("n_tokens"), $"cum_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val got = CorpusOps.budgetSelect(docs, "doc_id", $"n", $"score", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == naive, s"seed $seed budget $budget")
    }
  }

  test("budgetSelect: no corpus-sized single-partition window in the plan") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, i % 5, 3L)).toDF("doc_id", "score", "n")
    val plan = CorpusOps.budgetSelect(docs, "doc_id", $"n", $"score", 100L)
      .queryExecution.optimizedPlan.toString
    // exactly two Window nodes: the corpus-facing one must be
    // PARTITIONED by score (parallel across classes), and the only
    // unpartitioned one runs over the bounded per-score aggregate
    // (sums class_tokens, never sees doc ids)
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size == 2, s"expected 2 windows, got:\n$plan")
    val partitioned = windows.filter(_.matches(""".*\], \[score#\d+L?\], \[doc_id#\d+L? ASC.*"""))
    assert(partitioned.size == 1,
      s"the corpus-facing window must be partitioned by score:\n$plan")
    val global = windows.filterNot(partitioned.contains)
    assert(global.head.contains("class_tokens") && !global.head.contains("doc_id"),
      s"the unpartitioned window must run over the per-score aggregate only:\n$plan")
  }

  test("packSequences: shards have independent token streams") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, 5L)).toDF("doc_id", "n")
    val out = CorpusOps.packSequences(docs, "doc_id", $"n", budget = 100L, nShards = 4)
    // each shard holds 5 docs of 5 tokens: per-shard offsets are 0,5,..,20
    val offsets = out.groupBy("shard").agg(max("start_offset").as("m"))
      .collect().map(_.getLong(1)).toSeq
    assert(offsets == Seq(20L, 20L, 20L, 20L))
    // global offset never exceeds the per-shard stream length
    assert(out.agg(max($"start_offset" + $"n_tokens")).head().getLong(0) == 25L)
  }

  test("stratifiedSplit: deterministic, stratum-preserving, boundary-exact") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = CorpusOps.stratifiedSplit(docs, "doc_id", $"source", "salt1", 800, 100)
    val again = CorpusOps.stratifiedSplit(docs, "doc_id", $"source", "salt1", 800, 100)
    assert(out.collect().toSet == again.collect().toSet) // pure function of (salt, id)
    // split follows the bucket exactly
    assert(out.filter(
      ($"bucket_pm" < 800 && $"split" =!= "train") ||
      ($"bucket_pm" >= 800 && $"bucket_pm" < 900 && $"split" =!= "val") ||
      ($"bucket_pm" >= 900 && $"split" =!= "test")).count() == 0)
    // roughly 80/10/10 overall (md5-uniform; generous band for n=1000)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit("train") > 700 && bySplit("train") < 900)
    // a different salt reshuffles membership
    val resalted = CorpusOps.stratifiedSplit(docs, "doc_id", $"source", "salt2", 800, 100)
    assert(out.select("doc_id", "split").collect().toSet !=
      resalted.select("doc_id", "split").collect().toSet)
  }

  test("repetitionScore: fully repeated vs fully distinct vs short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"), // 7 grams, 3 distinct (abc bca cab cycle)
      (2L, "one two three four"), // 2 grams, both distinct
      (3L, "tiny doc"),           // < n tokens: zero grams
      (4L, "")                    // empty
    ).toDF("doc_id", "text")
    val out = CorpusOps.repetitionScore(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((7L, 3L, 4L * 1000000L / 7L)))
    assert(out(1) == ((2L, 2L, 0L)))
    assert(out(2) == ((0L, 0L, 0L)))
    assert(out(3) == ((0L, 0L, 0L)))
  }

  test("dedupApply: clustered docs keep only the canonical, rest pass through") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val labels = Seq((2L, 2L, 3L), (3L, 2L, 3L), (4L, 2L, 3L)).toDF("id", "comp", "n_members")
    val out = CorpusOps.dedupApply(docs, "doc_id", labels)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, true),  // unclustered: canonical self, kept
      (2L, 2L, 3L, true),  // cluster canonical
      (3L, 2L, 3L, false), // cluster member, dropped
      (4L, 2L, 3L, false),
      (5L, 5L, 1L, true)))
  }

  test("boilerplateNgrams: counts occurrences with multiplicity, doc freq distinct, ties on gram") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x"), // 2-grams: "x y","y x","x y","y x"
      (2L, "x y z"),     // "x y","y z"
      (3L, "a b")        // "a b"
    ).toDF("doc_id", "text")
    val out = CorpusOps.boilerplateNgrams(docs, "doc_id", "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "x y" 3 occurrences in 2 docs; "y x" 2 in 1; count-1 tie broken by
    // gram text: "a b" < "y z"
    assert(out.toSeq == Seq(("x y", 3L, 2L), ("y x", 2L, 1L), ("a b", 1L, 1L)))
  }

  test("repeatedSpanCoverage: multiplicity counts, zero-span docs kept at 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x"), // spans: x y, y x, x y, y x — all repeated corpus-wide
      (2L, "x y z"),     // x y (repeated via doc 1), y z (unique)
      (3L, "a b"),       // a b (unique)
      (4L, "solo")       // < n tokens: zero spans
    ).toDF("doc_id", "text")
    val out = CorpusOps.repeatedSpanCoverage(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 4L, 1000000L),
      (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L),
      (4L, 0L, 0L, 0L)))
  }

  test("spanDecontaminate: interval-union coverage, overlaps merged, clean/empty docs at 0") {
    import spark.implicits._
    // bench doc 0 contributes shingles {a b c, b c d}
    val docs = Seq(
      (0L, "a b c d", true),
      (1L, "a b c a b c x a b c", false), // matches at 0,3,7 -> 3+3+3 = 9 of 10
      (2L, "a b c d x", false),           // matches at 0,1 (overlap) -> 3+1 = 4 of 5
      (3L, "z z", false),                 // no grams
      (4L, "", false)                     // empty
    ).toDF("doc_id", "text", "is_bench")
    val out = CorpusOps.spanDecontaminate(docs, "doc_id", "text", col("is_bench"), n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 10L, 9L, 900000L),
      (2L, 5L, 4L, 800000L),
      (3L, 2L, 0L, 0L),
      (4L, 0L, 0L, 0L)))
  }

  test("chunkWindows: overlap, short-tail chunk, sub-window and empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, w=8 s=4 -> [0,8),[4,10)
      (2L, "a b c"),                                  // shorter than window -> 1 chunk
      (3L, "")                                        // zero tokens -> no chunks
    ).toDF("doc_id", "text")
    val out = CorpusOps.chunkWindows(docs, "doc_id", "text", window = 8, stride = 4)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 8L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 1L, 4L, 6L, (5 to 10).map(i => s"t$i").mkString(" ")),
      (2L, 0L, 0L, 3L, "a b c")))
  }

  test("chunkWindows: invalid stride fails loudly") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      CorpusOps.chunkWindows(docs, "doc_id", "text", window = 4, stride = 5)
    }
    assert(ex.getMessage.contains("stride"))
  }

  test("sourceOverlap: shared-shingle counts and Jaccard, disjoint pairs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "s1"), // shingles {abc, bcd}
      (2L, "a b c x", "s2"), // shingles {abc, bcx}
      (3L, "p q r", "s3")    // shingles {pqr}
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.sourceOverlap(docs, "doc_id", "text", col("source"), n = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // only (s1, s2) overlap: 1 shared of 2+2 -> jaccard 1/3
    assert(out.toSeq == Seq(("s1", "s2", 1L, 2L, 2L, 333333L)))
  }

  test("sourceOverlap: bitmask path correct at exactly 64 sources (bit 63 is the sign bit)") {
    import spark.implicits._
    // 64 single-doc sources sharing identical text: every shingle's mask
    // has ALL bits set including bit 63 -> a sign-extending shift would
    // silently drop every pair (regression: shr % 2 vs bitwiseAND)
    val docs = (0 until 64).map(i => (i.toLong, "x y z w", f"s$i%02d"))
      .toDF("doc_id", "text", "source")
    val out = CorpusOps.sourceOverlap(docs, "doc_id", "text", col("source"), n = 3)
    assert(out.count() == 64L * 63 / 2)
    assert(out.filter(col("n_shared") =!= 2L || col("jaccard_ppm") =!= 1000000L).count() == 0)
  }

  test("sourceOverlap: non-string source columns are cast, not ClassCastException") {
    import spark.implicits._
    // int provenance ids; the bitmask path's driver probe must not assume
    // string rows, and the output pairs come back as strings
    val docs = Seq(
      (1L, "a b c d", 10), // shingles {abc, bcd}
      (2L, "a b c x", 2)   // shingles {abc, bcx}
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.sourceOverlap(docs, "doc_id", "text", col("source"), n = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // lexicographic on the CAST strings: "10" < "2"
    assert(out.toSeq == Seq(("10", "2", 1L)))
  }

  test("decontaminate and spanDecontaminate: NULL isBenchmark reads as corpus, not dropped") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox", Some(true)),  // benchmark
      (1L, "the quick brown fox", None),        // null predicate: scored as corpus
      (2L, "an unrelated doc here", Some(false))
    ).toDF("doc_id", "text", "bench")
    val doc = CorpusOps.decontaminate(docs, "doc_id", "text", col("bench"), n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(doc == Map(1L -> true, 2L -> false))
    val span = CorpusOps.spanDecontaminate(docs, "doc_id", "text", col("bench"), n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(span == Map(1L -> 4L, 2L -> 0L)) // doc 1 fully covered (4 tokens)
  }

  test("importanceWeights: Laplace-smoothed integer affinity, target/empty docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa bb", true),  // target
      (2L, "aa cc", true),     // target
      (3L, "aa bb", false),
      (4L, "cc cc dd", false),
      (5L, "", false)          // zero tokens: not scored
    ).toDF("doc_id", "text", "is_tgt")
    // tgt counts: aa 3, bb 1, cc 1 (total 5); raw: aa 1, bb 1, cc 2, dd 1
    // (total 5). Totals equal, so the smoothed probability ratio reduces
    // to (tgt+1)/(raw+1) (the shared denominator cancels exactly in IEEE
    // doubles up to a sub-ulp that floor absorbs here):
    // aa 2000000, bb 1000000, cc 666666, dd 500000.
    val out = CorpusOps.importanceWeights(docs, "doc_id", "text", col("is_tgt"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (3L, 2L, (2000000L + 1000000L) / 2L),
      (4L, 3L, (666666L + 666666L + 500000L) / 3L)))
  }

  // A corpus where half the docs share the target slice's vocabulary and
  // half are disjoint noise: resampling must prefer the on-target half.
  private def dsirFixture = {
    import spark.implicits._
    val target = (0L until 10L).map(i => (i, "tgt", "alpha beta gamma delta epsilon " * 4))
    val near = (10L until 40L).map(i => (i, "raw", s"alpha beta gamma delta epsilon zeta$i " * 3))
    val noise = (40L until 70L).map(i => (i, "raw", s"xq$i yq$i zq$i wq$i vq$i uq$i " * 3))
    (target ++ near ++ noise).toDF("doc_id", "source", "text")
  }

  test("importanceResample: budget calibration, score preference, determinism") {
    import spark.implicits._
    val docs = dsirFixture
    val out = CorpusOps.importanceResample(docs, "doc_id", "text",
      isTarget = $"source" === "tgt", budgetTokens = 300L, salt = "s")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 60)  // only non-target docs scored
    val byId = rows.map(r => r._1 -> r).toMap
    // on-target docs must carry strictly higher keep rates than noise docs
    val nearKeep = (10L until 40L).map(byId(_)._4)
    val noiseKeep = (40L until 70L).map(byId(_)._4)
    assert(nearKeep.min > noiseKeep.max,
      s"on-target keep_ppm ${nearKeep.min} must exceed noise ${noiseKeep.max}")
    // expected kept tokens ~ budget (md5-bucket noise, generous band)
    val kept = rows.filter(_._5).map(_._2).sum
    assert(kept > 100L && kept < 600L, s"kept $kept tokens vs budget 300")
    // bit-for-bit deterministic: same input, same decisions
    val again = CorpusOps.importanceResample(docs, "doc_id", "text",
      isTarget = $"source" === "tgt", budgetTokens = 300L, salt = "s")
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    assert(rows.forall(r => again(r._1) == r._5))
  }

  test("importanceResample: budget >= mass saturates; zero-score docs never sampled") {
    import spark.implicits._
    val docs = dsirFixture
    val out = CorpusOps.importanceResample(docs, "doc_id", "text",
      isTarget = $"source" === "tgt", budgetTokens = Long.MaxValue / 4, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    out.foreach { case (id, score, keepPpm, sampled) =>
      if (score > 0L) assert(keepPpm == 1000000L && sampled, s"doc $id must saturate")
      else assert(keepPpm == 0L && !sampled, s"zero-score doc $id must never be kept")
    }
  }

  test("cutRepeatedSpans: interval union, full cut, short docs, singleton spans kept") {
    import spark.implicits._
    val docs = Seq(
      // 1 and 2 share the span "a b c" (and its overlapping extension
      // "b c d" in 1 only — that one is NOT repeated, stays unless covered)
      (1L, "a b c d e f g"),
      (2L, "x y a b c z w"),
      // 3 is entirely one repeated span shared with 4 -> fully cut
      (3L, "r s t"),
      (4L, "r s t u v w q"),
      // 5 is shorter than n -> no spans, nothing cut, tokens survive
      (5L, "p q"),
    ).toDF("doc_id", "text")
    val out = CorpusOps.cutRepeatedSpans(docs, "doc_id", "text", n = 3, minDocs = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    // doc 1: "a b c" cut covers positions 0-2; d e f g survive
    assert(out(1L) == ((7L, 3L, "d e f g")))
    // doc 2: positions 2-4 cut; x y z w survive in order
    assert(out(2L) == ((7L, 3L, "x y z w")))
    assert(out(3L) == ((3L, 3L, "")), "doc equal to a repeated span is fully cut")
    // doc 4: "r s t" covers 0-2; u v w q survive
    assert(out(4L) == ((7L, 3L, "u v w q")))
    assert(out(5L) == ((2L, 0L, "p q")), "sub-n docs pass through untouched")
  }

  test("cutRepeatedSpans: overlapping repeated spans union, never double-count") {
    import spark.implicits._
    // "a b c d" in both docs: spans "a b c" and "b c d" are both repeated,
    // their intervals [0,3) and [1,4) union to 4 tokens, not 6
    val docs = Seq((1L, "a b c d x"), (2L, "y a b c d")).toDF("doc_id", "text")
    val out = CorpusOps.cutRepeatedSpans(docs, "doc_id", "text", n = 3, minDocs = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(4)))).toMap
    assert(out(1L) == ((4L, "x")))
    assert(out(2L) == ((4L, "y")))
  }

  test("mixPlan: recipe rates, absent-domain drop, tiny-domain saturation") {
    import spark.implicits._
    // webbig: 100 docs x 10 tokens; code: 10 x 10; books absent from corpus
    // is fine; 'junk' is in the corpus but not the recipe -> dropped.
    val docs = (
      (0L until 100L).map(i => (i, "webbig", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")) ++
      (100L until 110L).map(i => (i, "code", "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")) ++
      (110L until 120L).map(i => (i, "junk", "j1 j2 j3 j4 j5 j6 j7 j8 j9 j10"))
    ).toDF("doc_id", "source", "text")
    val out = CorpusOps.mixPlan(docs, "doc_id", "text", domain = $"source",
      targetSharesPpm = Seq("webbig" -> 500000L, "code" -> 500000L),
      budgetTokens = 400L, salt = "s")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // webbig: target 200 of 1000 tokens -> keep_ppm 200000
    assert(out("webbig")._4 == 200000L)
    // code: target 200 of 100 tokens -> saturates at keep-everything
    assert(out("code")._4 == 1000000L && out("code")._5 == 10L && out("code")._6 == 100L)
    // junk: no recipe entry -> share 0, nothing sampled
    assert(out("junk")._3 == 0L && out("junk")._4 == 0L && out("junk")._5 == 0L)
  }

  test("gopherSignals: duplicate n-gram character fractions, hand-computed") {
    import spark.implicits._
    // 10 tokens "p q r s t p q r s t" (19 chars): among 5-grams only
    // "p q r s t" repeats (2 × 9 chars); every 6..10-gram is distinct;
    // the top 4-gram is "p q r s" (2 × 7 chars)
    val df = Seq((1L, "p q r s t p q r s t")).toDF("doc_id", "text")
    val row = graft.operators.CorpusOps.gopherSignals(df, "doc_id", "text").collect().head
    val tlen = 19.0
    assert(math.abs(row.getAs[Double]("frac_dup_5gram_chars") - 18.0 / tlen) < 1e-12,
      s"dup5: $row")
    (6 to 10).foreach(n =>
      assert(row.getAs[Double](s"frac_dup_${n}gram_chars") == 0.0, s"n=$n: $row"))
    assert(math.abs(row.getAs[Double]("frac_top_4gram_chars") - 14.0 / tlen) < 1e-12,
      s"top4: $row")
  }
}
