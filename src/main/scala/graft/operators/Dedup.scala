package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

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

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join: explode
    * shingles, self-join on shingle (candidate generation bounded by
    * co-occurrence), then exact set Jaccard in scaled-integer ppm.
    *
    * One shuffle on shingle for candidates + one on the pair key for the
    * rollup. Hot shingles should be frequency-capped at extreme scale
    * (a stop-shingle list); not needed at bench scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int, minJaccardPpm: Long): DataFrame = {
    val sh = withShingles(df, textCol, n)
      .select(col(idCol).as("doc"), col("shingles"))
      .withColumn("n_shingles", size(col("shingles")).cast("long"))
    val ex = sh.select(col("doc"), col("n_shingles"), explode(col("shingles")).as("s"))
    val a  = ex.select(col("doc").as("d1"), col("n_shingles").as("n1"), col("s"))
    val b  = ex.select(col("doc").as("d2"), col("n_shingles").as("n2"), col("s"))
    a.join(b, Seq("s"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("shared"), first(col("n1")).as("n1"), first(col("n2")).as("n2"))
      .withColumn("jaccard_ppm", intDiv(col("shared") * 1000000L, col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("d1"), col("d2"), col("shared"), col("jaccard_ppm"))
  }

  /** MinHash signature column: `k` 60-bit min-hashes over the distinct
    * shingle set, using salted md5 as the hash family (portable, no
    * mod-multiply overflow). Input must have a `shingles` column. */
  def withMinhashSignature(df: DataFrame, k: Int): DataFrame =
    df.withColumn(
      "minhash",
      transform(
        sequence(lit(0), lit(k - 1)),
        i => array_min(transform(col("shingles"), s => hash60(concat(s, lit("#"), i))))
      )
    )

  /** MinHash + LSH near-dup candidates: signatures are cut into
    * `k / bandSize` bands; docs sharing any band hash become candidates;
    * candidates are verified with exact Jaccard (no false positives
    * survive). The band join is the only wide operation and its key space
    * (band idx, band hash) is uniform by construction.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, bandSize: Int, minJaccardPpm: Long): DataFrame = {
    val sh  = withShingles(df, textCol, n)
      .select(col(idCol).as("doc"), col("shingles"))
      .filter(size(col("shingles")) > 0)
    val sig = withMinhashSignature(sh, k)
    val bands = sig.select(
      col("doc"),
      col("shingles"),
      posexplode(
        transform(
          sequence(lit(0), lit(k / bandSize - 1)),
          b =>
            md5(concat_ws("|",
              transform(slice(col("minhash"), b * bandSize + 1, lit(bandSize)), v => v.cast("string"))))
        )
      ).as(Seq("band_idx", "band_hash"))
    )
    val a = bands.select(col("band_idx"), col("band_hash"), col("doc").as("d1"), col("shingles").as("sh1"))
    val b = bands.select(col("band_idx"), col("band_hash"), col("doc").as("d2"), col("shingles").as("sh2"))
    val cand = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_shared_bands"), first(col("sh1")).as("sh1"), first(col("sh2")).as("sh2"))
    cand
      .withColumn("shared", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("jaccard_ppm",
        intDiv(col("shared") * 1000000L,
               size(col("sh1")).cast("long") + size(col("sh2")).cast("long") - col("shared")))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("d1"), col("d2"), col("n_shared_bands"), col("shared"), col("jaccard_ppm"))
  }

  /** SimHash (48-bit) over the token multiset: per bit, tokens vote
    * +1/−1 by their hash bit; the sign of the vote sets the bit.
    * Computed bit-parallel as a single Column expression (aggregate over
    * the token array — no row explosion, codegen-friendly). */
  def simhash48(toks: Column): Column = {
    val hashes = transform(toks, t => hash48(t))
    val bitSums = transform(
      sequence(lit(0), lit(47)),
      b =>
        aggregate(hashes, lit(0L),
          (acc, h) => acc + when(shr(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
    )
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(47)), (s, b) => when(s > 0, shl(lit(1L), b)).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x)
    )
  }

  /** SimHash LSH near-dup pairs: 48-bit simhash, bucketed on 4 12-bit
    * bands (any equal band → candidate), verified by Hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val sigs = df
      .select(col(idCol).as("doc"), simhash48(tokens(col(textCol))).as("sig"))
    val bands = sigs.select(
      col("doc"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(3)), b => shr(col("sig"), b * 12).bitwiseAND(lit(0xfffL)))
      ).as(Seq("band_idx", "band_val"))
    )
    val a = bands.select(col("band_idx"), col("band_val"), col("doc").as("d1"), col("sig").as("sig1"))
    val b = bands.select(col("band_idx"), col("band_val"), col("doc").as("d2"), col("sig").as("sig2"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(first(col("sig1")).as("sig1"), first(col("sig2")).as("sig2"))
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("sig1"), col("sig2"), col("hamming"))
  }
}
