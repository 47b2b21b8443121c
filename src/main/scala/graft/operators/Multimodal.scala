package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed partition-wise.
  *
  * The Spark-side plumbing is REAL — schema, per-partition batched
  * processing (`mapPartitions` over a typed Dataset, the Scala analog of
  * `mapInPandas` batches), partitioning discipline, feature schema. The
  * codec step is an adapter ([[MediaCodec]]) whose shipped implementation
  * is a clearly marked DETERMINISTIC STUB ([[StubCodec]]): the sandbox has
  * no image/audio libraries, so "decoding" derives fake but reproducible
  * features from the raw bytes. Swapping in a real codec implements one
  * trait, nothing else — `MultimodalCodecContractSpec` pins the
  * codec-independence of everything around the seam.
  *
  * Scale notes: assets are processed in their scan partitions (no shuffle);
  * feature extraction is embarrassingly parallel; binary payloads never
  * pass through a wide transform. For 100 TB of media, size
  * `spark.sql.files.maxPartitionBytes` so a partition's decoded batch fits
  * in executor memory.
  */
object Multimodal {

  final case class AssetMeta(width: Int, height: Int, sampleRate: Int,
                             durationMs: Long, format: String)
  final case class Asset(assetId: Long, kind: String, bytes: Array[Byte], meta: AssetMeta)
  final case class AssetFeatures(
      assetId: Long, kind: String, byteLen: Long,
      meanByte: Double, contentHash: String, embedding: Seq[Float])

  /** The codec adapter — the ONE seam a real decoder (JPEG/PNG/WAV/ffmpeg)
    * plugs into. Implementations must be deterministic pure functions of
    * the bytes, serializable (the instance ships inside the task closure),
    * and emit exactly `dims` embedding values for every input including
    * null/empty. Everything around the seam — schema, partition-wise
    * batching, hashing, metadata — is codec-independent, and
    * `MultimodalCodecContractSpec` asserts exactly that against a second
    * toy codec. */
  trait MediaCodec extends Serializable {
    def name: String
    /** Embedding width; constant per codec. */
    def dims: Int
    /** bytes → (mean signal level, `dims`-wide embedding). */
    def decode(bytes: Array[Byte]): (Double, Seq[Float])
  }

  /** STUB codec — deterministic fake features from raw bytes (the sandbox
    * has no media libraries). 8 "embedding" dims: banded byte histograms,
    * normalized. */
  object StubCodec extends MediaCodec {
    val name = "stub"
    val dims = 8
    def decode(bytes: Array[Byte]): (Double, Seq[Float]) = {
      if (bytes == null || bytes.isEmpty) return (0.0, Seq.fill(dims)(0.0f))
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      val mean = sum.toDouble / bytes.length
      val hist = new Array[Long](dims)
      i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) / 32) += 1; i += 1 }
      (mean, hist.map(h => h.toFloat / bytes.length).toSeq)
    }
  }

  /** Kept for source compatibility; the seam is [[MediaCodec]]. */
  def decodeStub(bytes: Array[Byte]): (Double, Seq[Float]) = StubCodec.decode(bytes)

  /** Synthesize a multimodal asset table from any (id, text) table — the
    * driver testdata has no binary columns, so fixture assets carry the
    * document bytes as payload with per-kind metadata. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("assetId"),
      element_at(typedlit(Seq("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10).as("durationMs"),
        lit("stub").as("format")).as("meta"))

  /** Partition-wise feature extraction: one decode per asset, batched by
    * partition, no shuffle. */
  def extractFeatures(spark: SparkSession, assets: DataFrame,
                      codec: MediaCodec = StubCodec): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val (mean, emb) = codec.decode(a.bytes)
        md.reset()
        val hash = md.digest(a.bytes).map("%02x".format(_)).mkString
        AssetFeatures(a.assetId, a.kind,
          if (a.bytes == null) 0L else a.bytes.length.toLong, mean, hash, emb)
      }
    }
  }

  /** STUB frame sampler: every `stride` bytes, take a `frameLen`-byte
    * "frame" (up to `maxFrames`) — the video-frame-extraction shape
    * (binary in → array<binary> out + per-frame positions), computed
    * partition-local with no shuffle. Real decoders swap in behind the
    * same signature. */
  def frameSampleStub(assets: DataFrame, frameLen: Int, stride: Int, maxFrames: Int): DataFrame =
    assets.withColumn("frames",
      expr(s"""transform(
        sequence(0, greatest(least(int((length(bytes) - $frameLen) / $stride), ${maxFrames - 1}), 0)),
        i -> substring(bytes, 1 + i * $stride, $frameLen))"""))
      .withColumn("n_frames", size(col("frames")).cast("long"))

  /** STUB transform: "resize"/"frame-sample" as deterministic byte slicing —
    * real plumbing (binary in, binary out, metadata updated). */
  def resizeStub(assets: DataFrame, maxBytes: Int): DataFrame =
    assets
      .withColumn("bytes", expr(s"substring(bytes, 1, $maxBytes)"))
      .withColumn("meta", struct(
        least(col("meta.width"), lit(maxBytes)).as("width"),
        least(col("meta.height"), lit(maxBytes)).as("height"),
        col("meta.sampleRate").as("sampleRate"),
        col("meta.durationMs").as("durationMs"),
        concat(col("meta.format"), lit("-resized")).as("format")))
}
