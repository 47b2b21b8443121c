package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup, ExactPercentiles, Similarity, VocabOps}
import graft.sources.Tables

/** Scratch 10x scaling smoke (not part of the driver contract; safe to
  * delete): every headline corpus operator timed on sf0.1 and on a 10x
  * union of it, looking for superlinear blowups the sf ladder can't see.
  *
  * The 10x frame is 10 copies with shifted ids and PER-COPY-PERTURBED
  * text (every token gets a copy suffix), so shingle/token/vocab
  * structure replicates without creating artificial cross-copy near-dups
  * — the measured ratio isolates PLAN scaling from data-density change.
  * A healthy operator lands near 10x (or below, where fixed overhead
  * dominated the 1x time); anything well past ~15x is a superlinearity
  * to chase.
  */
object ProfScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs1 = Tables(spark, dir).documents.select("doc_id", "text", "source", "lang")
    val docs10 = (0 until 10).map { c =>
      docs1.select(
        (col("doc_id") + lit(c.toLong * 1000000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1_c$c").as("text"),
        col("source"), col("lang"))
    }.reduce(_.unionByName(_)).localCheckpoint()
    println(s"rows 1x=${docs1.count()} 10x=${docs10.count()}")

    def time(label: String)(f: DataFrame => Long): Unit = {
      // protect the 10x corpus checkpoint: only blocks the operator
      // itself checkpointed during this timing get dropped
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      def run(df: DataFrame): Double = {
        f(df); f(df) // warm plans/codegen
        val t0 = System.nanoTime(); f(df); (System.nanoTime() - t0) / 1e9
      }
      val t1 = run(docs1)
      val t10 = run(docs10)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = false))
      println(f"$label%-28s 1x ${t1}%7.3f s   10x ${t10}%7.3f s   ratio ${t10 / t1}%5.1f")
    }

    time("exact dedup (q23 shape)") { d =>
      Dedup.exact(d, "doc_id", "text").count()
    }
    time("minhash sig+pairs (q25)") { d =>
      Dedup.minhashLshPairs(d, "doc_id", "text", 3, 16, 4, 800000L).count()
    }
    time("ngram jaccard (q24)") { d =>
      Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 800000L).count()
    }
    time("importance weights (q80)") { d =>
      CorpusOps.importanceWeights(d, "doc_id", "text", col("source") === "src0").count()
    }
    time("source overlap (q82)") { d =>
      CorpusOps.sourceOverlap(d, "doc_id", "text", col("source"), 3).count()
    }
    time("bpe encode (q88 shape)") { d =>
      VocabOps.bpeEncode(d, "doc_id", "text",
        Seq(("e", "r"), ("t", "h"), ("a", "n"))).count()
    }
    time("oov rate (q90)") { d =>
      VocabOps.oovRate(d, "doc_id", "text", 1000).count()
    }
    time("chunking (q89)") { d =>
      CorpusOps.chunkWindows(d, "doc_id", "text", 50, 25).count()
    }
    time("length percentiles (q92)") { d =>
      ExactPercentiles.histogram(
        d.select(col("source"),
          size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("v")),
        Seq("source"), col("v")).count()
    }
    time("boilerplate ngrams (q78)") { d =>
      CorpusOps.boilerplateNgrams(d, "doc_id", "text", 3, 25).count()
    }
    time("lm familiarity (q96)") { d =>
      VocabOps.lmFamiliarity(d, "doc_id", "text", 2).count()
    }
    time("curation decisions (q99)") { d =>
      CorpusOps.curationDecisions(d, "doc_id", "text",
        declaredLang = col("lang"), isBenchmark = col("doc_id") % 50 === 0,
        n = 3, minFamiliarityPpm = 100000L).count()
    }
    time("importance resample (q105)") { d =>
      CorpusOps.importanceResample(d, "doc_id", "text",
        isTarget = col("source") === "src0", budgetTokens = 8000L, salt = "dsir").count()
    }
    time("mix plan (q106)") { d =>
      CorpusOps.mixPlan(d, "doc_id", "text", domain = col("source"),
        targetSharesPpm = Seq("src1" -> 300000L, "src2" -> 250000L,
          "src3" -> 200000L, "src4" -> 150000L, "src5" -> 60000L, "src6" -> 40000L),
        budgetTokens = 3000L, salt = "mixp").count()
    }
    time("cut repeated spans (q107)") { d =>
      CorpusOps.cutRepeatedSpans(d, "doc_id", "text", n = 3, minDocs = 2L).count()
    }
    time("ngram novelty (q114)") { d => // q114's plan, inlined over d
      val sh = d.select(col("doc_id"),
        array_distinct(graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("sh"))
      val totals = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
        .filter(col("n_shingles") > 0)
      val novel = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .groupBy(col("shingle")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
      totals.join(novel, Seq("doc_id"), "left").count()
    }
    time("heavy hitters (q112)") { d =>
      graft.operators.HeavyHitters.exact(
        d.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok")),
        col("tok"), phiPpm = 2000L, k = 1023).count()
    }
    spark.stop()
  }
}
