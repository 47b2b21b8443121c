package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Vocabulary-construction operators for the training-data pipeline: the
  * corpus-statistics passes behind tokenizer training and keyword-based
  * curation.
  *
  * Determinism policy: counts are exact integers, scores are exact
  * scaled-integer ratios, and every top-k rank carries a total order
  * (count/score desc, then the string asc) — reproducible bit-for-bit in
  * the DuckDB oracles.
  */
object VocabOps {

  /** The FIRST round of BPE tokenizer training: corpus-wide counts of
    * adjacent character pairs inside words, weighted by word frequency —
    * the statistic whose argmax is the first merge rule. (Full BPE
    * iterates merge-and-recount; each round is this same shape over the
    * rewritten vocabulary, so the one-round operator is the building
    * block.) Output: the `topK` pairs by (count desc, pair asc) with
    * their dense rank.
    *
    * Scale: the corpus collapses to the DISTINCT-WORD frequency table
    * first (vocabulary-sized, orders of magnitude smaller than the token
    * stream — the aggregation is map-side combined), pairs explode off
    * that small table, and the final ranking window runs over the
    * pair-count table, which is bounded by |alphabet|^2 — a single
    * window partition is safe at any corpus size. */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_occ"))
    val pairs = words
      .filter(length(col("w")) >= 2)
      .select(col("n_occ"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("n_occ")).as("cnt"))
    pairs
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("pair").asc)))
      .filter(col("rank") <= topK)
      .select(col("pair"), col("cnt"), col("rank"))
  }

  /** Integer TF-IDF keyword extraction: each document's top-`k` tokens by
    * `tf * 1e6 // df` (term frequency scaled by inverse document
    * frequency — the exact-integer surrogate for tf·idf, monotone in the
    * same ordering for fixed tf; log-idf would break cross-engine hash
    * parity). The standard keyword signal for corpus curation and topic
    * binning. Ties break on the token string.
    *
    * Scale: one (doc, token) aggregation (map-side combined), a
    * vocabulary-sized document-frequency table joined back on token (a
    * broadcast candidate when the vocabulary fits), and a per-document
    * top-k window partitioned by doc — every shuffle key is
    * high-cardinality. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_ppm").desc, col("tok").asc)
    tf.join(dfreq, Seq("tok"))
      .withColumn("score_ppm", intDiv(col("tf") * 1000000L, col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("tok"), col("tf"), col("df"), col("score_ppm"), col("rank"))
  }
}
