package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch stage-level profiler for the dedup trio (not part of the
  * driver contract; safe to delete). */
object Prof {
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
      // warm twice, time third
      f; f
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    val docs = Tables(spark, dir).documents

    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("q24 shingleSets") { sets.count() }
    val prefLen = col("ns") - graft.functions.TextFunctions.intDiv(col("ns") * 800000L + 999999L, lit(1000000L)) + 1L
    val pref = sets
      .select(col("doc"), col("ns"), explode(slice(col("sh"), lit(1), prefLen)).as("e"))
      .select(col("doc"), col("ns"), col("e.h").as("h"))
    time("q24 prefix rows") { pref.count() }
    val pa = pref.select(col("doc").as("d1"), col("ns").as("pn1"), col("h"))
    val pb = pref.select(col("doc").as("d2"), col("ns").as("pn2"), col("h"))
    val cand = pa.join(pb, Seq("h")).filter(col("d1") < col("d2"))
      .filter(col("pn1") * 1000000L >= col("pn2") * 800000L &&
              col("pn2") * 1000000L >= col("pn1") * 800000L)
      .select(col("d1"), col("d2")).distinct()
    time("q24 candidates") { cand.count() }
    time("q24 full") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 800000L).count()
    }
    time("q35 full") {
      Dedup.connectedComponents(
        Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 800000L), "d1", "d2").count()
    }

    val ex = Dedup.shingleTable(docs, "doc_id", "text", 3)
      .withColumn("h31", Dedup.hash31(col("s")))
    val sig = ex.groupBy(col("doc")).agg(
      collect_set(col("s")).as("shingles"),
      (0 until 16).map(i =>
        min((lit(Dedup.minhashA(i)) * col("h31") + lit(Dedup.minhashB(i))) % Dedup.MinhashP).as(s"mh$i")): _*)
    time("q25 signatures") { sig.count() }
    time("q25 full") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 800000L).count()
    }

    time("q26 simhashTable") { Dedup.simhashTable(docs, "doc_id", "text").count() }
    time("q26 full") { Dedup.simhashPairs(docs, "doc_id", "text", 8).count() }

    spark.stop()
  }
}
