package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Scratch stage-level profiler for the round-6 corpus-hygiene queries
  * (not part of the driver contract; safe to delete). */
object ProfCorpus {
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

    def time(label: String)(f: => Long): Unit = {
      f; f
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    val docs = Tables(spark, dir).documents

    time("tokens explode") {
      docs.select(explode(tokens(col("text"))).as("t")).count()
    }
    time("3-gram explode") {
      docs.select(explode(wordShingles(tokens(col("text")), 3)).as("g")).count()
    }
    time("5-gram explode") {
      docs.select(explode(wordShingles(tokens(col("text")), 5)).as("g")).count()
    }
    time("3-gram shingleRows (relational)") {
      graft.operators.Dedup.shingleRows(docs, "doc_id", "text", 3).count()
    }
    time("5-gram shingleRows + hash60") {
      graft.operators.Dedup.shingleRows(docs, "doc_id", "text", 5)
        .select(hash60(col("s"))).count()
    }
    time("q78 full") {
      graft.queries.TextQueries.q78BoilerplateNgrams(spark, dir).count()
    }
    time("q79 full") {
      val n = graft.queries.TextQueries.q79RepeatedSpans(spark, dir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      n
    }
    time("q80 full") {
      graft.queries.TextQueries.q80ImportanceWeights(spark, dir).count()
    }
    time("q82 full (bitmask path)") {
      val n = graft.queries.TextQueries.q82SourceOverlap(spark, dir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      n
    }
    time("q82 generic join path") {
      val n = graft.operators.CorpusOps.sourceOverlap(
        graft.sources.Tables(spark, dir).documents, "doc_id", "text",
        col("source"), n = 3, maxMaskSources = 0).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      n
    }
    time("q83 full") {
      graft.queries.TextQueries.q83SpanDecontaminate(spark, dir).count()
    }
    time("q84 full") {
      graft.queries.TextQueries.q84SourceQuality(spark, dir).count()
    }

    // round 15: lineDedup hot-line skew probe — ONE line content repeated
    // ~10^6 times across synthetic docs (the "Subscribe to our newsletter"
    // boilerplate shape at corpus scale). The min(struct)+semi-join plan
    // combines the hot key map-side, so this must stay in the same cost
    // band as the uniform case; the old row_number window funneled every
    // occurrence into one task.
    {
      import spark.implicits._
      val hot = spark.range(1000000)
        .select(col("id").as("doc_id"),
          concat(lit("unique line "), col("id"), lit("\nSUBSCRIBE TO OUR NEWSLETTER"))
            .as("text"))
        .repartition(32)
      val uniform = spark.range(1000000)
        .select(col("id").as("doc_id"),
          concat(lit("unique line "), col("id"), lit("\nalso unique "), col("id"))
            .as("text"))
        .repartition(32)
      time("lineDedup 1M docs, one 10^6-hot line") {
        graft.operators.CorpusOps.lineDedup(hot, "doc_id", "text")
          .agg(sum(col("n_lines_kept"))).head().getLong(0)
      }
      time("lineDedup 1M docs, all-unique lines") {
        graft.operators.CorpusOps.lineDedup(uniform, "doc_id", "text")
          .agg(sum(col("n_lines_kept"))).head().getLong(0)
      }
    }

    // round 7: measure the kmeans assignment crossover (unrolled codegen
    // vs the large-k literal-matrix fold) so codegenMaxK is a measured
    // number, not a guess — both paths at each k, 1 training iteration
    val emb = Tables(spark, dir).embeddings
    import spark.implicits._
    for (k <- Seq(16, 64, 128, 256)) {
      time(s"kmeans k=$k unrolled") {
        graft.operators.Similarity.kmeansTrain(emb, "vec_id", "embedding",
          isSeed = $"vec_id" < k, iters = 1, codegenMaxK = 1024,
          nativeAssign = false).count()
      }
      time(s"kmeans k=$k fold") {
        graft.operators.Similarity.kmeansTrain(emb, "vec_id", "embedding",
          isSeed = $"vec_id" < k, iters = 1, codegenMaxK = 0,
          nativeAssign = false).count()
      }
      time(s"kmeans k=$k native") {
        graft.operators.Similarity.kmeansTrain(emb, "vec_id", "embedding",
          isSeed = $"vec_id" < k, iters = 1).count()
      }
    }
    spark.stop()
  }
}
