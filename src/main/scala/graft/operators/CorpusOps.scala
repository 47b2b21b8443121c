package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Corpus-assembly operators for the training-data pipeline: the steps
  * that come AFTER cleaning/dedup — turning a filtered document set into
  * training sequences and reproducible splits.
  *
  * Determinism policy (oracle hash parity): token counts are exact
  * integers, split assignment is md5-derived, pack arithmetic is integer
  * division — every output is reproducible bit-for-bit in DuckDB.
  */
object CorpusOps {

  /** GPT-style sequence packing (concat-and-chunk): documents are laid
    * head-to-tail in deterministic (shard, id) order and cut into
    * fixed-`budget`-token training sequences; a document may span a pack
    * boundary. Output per document: its shard, token count, start offset
    * in the shard's token stream, and first/last pack ids.
    *
    * Scale: the running-offset window is partitioned by `shard`
    * (`id % nShards`), so packing parallelizes across shards with one
    * shuffle on a uniform key — a single global ordering would serialize
    * the 100 TB corpus through one partition. nShards scales with the
    * cluster; each shard's stream is an independent training-data file,
    * which is how large pretraining corpora are sharded anyway.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
                    budget: Long, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("n_tokens", tokenCount)
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_pack", intDiv(col("start_offset"), lit(budget)))
      // empty docs occupy no tokens: their last pack is their first
      .withColumn("last_pack",
        intDiv(greatest(col("start_offset") + col("n_tokens") - 1L, col("start_offset")), lit(budget)))
      .withColumn("spans_boundary", col("last_pack") > col("first_pack"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("start_offset"),
        col("first_pack"), col("last_pack"), col("spans_boundary"))
  }

  /** Deterministic stratified train/val/test split: assignment is a pure
    * function of (salt, id) via md5, so membership is reproducible across
    * runs, engines, and cluster sizes — no RNG state, no sampling drift.
    * Buckets are per-mille: [0, trainPm) train, [trainPm, trainPm+valPm)
    * val, rest test. Stratum is any column (language, source, domain);
    * the split is hash-uniform WITHIN each stratum because the hash is
    * id-keyed, so per-stratum proportions hold at scale.
    *
    * Scale: embarrassingly parallel — one narrow projection, no shuffle.
    */
  def stratifiedSplit(docs: DataFrame, idCol: String, stratum: Column,
                      salt: String, trainPm: Int, valPm: Int): DataFrame =
    docs
      .withColumn("stratum", stratum)
      .withColumn("bucket_pm",
        pmod(conv(substring(md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
          .cast("long"), lit(1000L)))
      .withColumn("split",
        when(col("bucket_pm") < trainPm, "train")
          .when(col("bucket_pm") < trainPm + valPm, "val")
          .otherwise("test"))
      .select(col(idCol), col("stratum"), col("bucket_pm"), col("split"))

  /** Intra-document repetition score: the fraction of repeated word
    * `n`-grams (1 - distinct/total, in exact ppm). High values flag
    * boilerplate, template spam, and degenerate generations — a standard
    * pretraining quality filter. Narrow per-row computation, no shuffle. */
  def repetitionScore(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = tokens(col(textCol))
    val grams = wordShingles(toks, n)
    docs
      .withColumn("n_ngrams", size(grams).cast("long"))
      .withColumn("n_distinct_ngrams", size(array_distinct(grams)).cast("long"))
      .withColumn("rep_ppm", ppm(col("n_ngrams") - col("n_distinct_ngrams"), col("n_ngrams")))
      .select(col(idCol), col("n_ngrams"), col("n_distinct_ngrams"), col("rep_ppm"))
  }

  /** The keep/drop materialization of near-dup clustering: every document
    * labeled with its canonical representative (its cluster's min id, or
    * itself when unclustered) and whether it survives dedup. `labels` is
    * a (id, comp, n_members) frame — q35's connected-components output —
    * left-joined so the full corpus passes through once.
    *
    * Scale: one equi-join on id against the (small) cluster-label side;
    * broadcast when the near-dup rate is low, shuffle-join otherwise. */
  def dedupApply(docs: DataFrame, idCol: String, labels: DataFrame): DataFrame =
    docs
      .join(labels.select(col("id").as(idCol), col("comp"), col("n_members")),
        Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("comp"), col(idCol)))
      .withColumn("cluster_size", coalesce(col("n_members"), lit(1L)))
      .withColumn("kept", col("canonical_id") === col(idCol))
      .select(col(idCol), col("canonical_id"), col("cluster_size"), col("kept"))
}
