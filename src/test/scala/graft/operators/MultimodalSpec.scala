package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("asset synthesis produces binary payloads with typed metadata") {
    val assets = Multimodal.assetsFromDocuments(docs)
    assert(assets.schema("bytes").dataType.typeName == "binary")
    val kinds = assets.select(countDistinct(col("kind"))).collect().head.getLong(0)
    assert(kinds == 3L)
    assert(assets.filter(col("meta.sampleRate") === 16000).count() == docs.count())
  }

  test("partition-wise feature extraction is deterministic and complete") {
    val assets = Multimodal.assetsFromDocuments(docs)
    val feats1 = Multimodal.extractFeatures(spark, assets).collect().sortBy(_.assetId)
    val feats2 = Multimodal.extractFeatures(spark, assets).collect().sortBy(_.assetId)
    assert(feats1.length == docs.count())
    assert(feats1.map(_.contentHash).toSeq == feats2.map(_.contentHash).toSeq)
    assert(feats1.forall(_.embedding.length == 8))
    assert(feats1.forall(f => math.abs(f.embedding.sum - 1.0f) < 1e-3))
  }

  test("resize stub preserves schema and caps payload") {
    val resized = Multimodal.resizeStub(Multimodal.assetsFromDocuments(docs), 16)
    assert(resized.filter(length(col("bytes")) > 16).count() == 0L)
    assert(resized.filter(col("meta.format") =!= "stub-resized").count() == 0L)
  }
}
