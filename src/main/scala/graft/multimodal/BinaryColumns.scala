package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Multimodal payload plumbing (reference: src/embedders/
  * image_embedder.py / video_embedder.py / audio_embedder.py): media
  * travel as opaque `binary` columns with typed metadata; decode /
  * resize / frame-sample / feature-extract run as batched
  * per-partition transforms.
  *
  * === STUB BOUNDARY ===
  * Real codec decode (PIL/ffmpeg/librosa in the reference) is not
  * available in this container, and model inference is out of scope.
  * `decodeStub` derives a deterministic pseudo-feature vector from the
  * payload bytes. Everything AROUND the stub — schema, typed metadata,
  * partition-level batching, embedding-column shape, downstream k-NN
  * compatibility — is the real Spark plumbing and is tested.
  *
  * Batch shape note: in a PySpark deployment this exact surface is
  * `mapInPandas` (binary column in, Arrow batch per partition, feature
  * column out). This library is Scala-native, so the same per-partition
  * batched contract is expressed with `mapPartitions` over a typed
  * Dataset — one "model load" per partition, vectorized batch inside —
  * which is the JVM-side equivalent (and skips the Python/Arrow hop).
  */
object BinaryColumns {
  val FeatureDim = 64

  case class MediaMeta(modality: String, width: Int, height: Int,
                       durationMs: Long, codec: String)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeature(media_id: Long, modality: String, embedding: Array[Float])

  /** STUB: deterministic fake decode+embed of a media payload.
    * Real implementation would decode the codec and run an encoder. */
  def decodeStub(payload: Array[Byte], dim: Int = FeatureDim): Array[Float] = {
    val base = TextHash.fnv1a64(payload)
    val raw = Array.tabulate(dim)(i =>
      ((TextHash.mix64(base ^ (i.toLong * TextHash.Golden)) >>> 11) / 9007199254740992.0 * 2.0 - 1.0))
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  /** STUB: resize — real version would decode, scale, re-encode. Keeps
    * determinism by hashing target dims into the payload. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    payload ++ Array[Byte]((w & 0xff).toByte, (h & 0xff).toByte)

  /** STUB: frame sampling — emits n pseudo-frame payloads. */
  def sampleFramesStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
    (0 until n).map(i => payload :+ (i & 0xff).toByte)

  /** Batched feature extraction: the real Spark surface. Partitions map
    * to executor-local batches (the reference's batch_embed,
    * image_embedder.py); nothing is collected to the driver. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition "model load" happens once here in a real impl.
      it.map { r =>
        val feat = r.meta.modality match {
          case "video" =>
            // frame-sample then mean-pool frame features
            val frames = sampleFramesStub(r.payload, 4).map(decodeStub(_))
            val pooled = Array.tabulate(FeatureDim)(i => frames.map(_(i)).sum / frames.length)
            val n = math.sqrt(pooled.map(x => x.toDouble * x).sum)
            pooled.map(x => (x / n).toFloat)
          case "image" => decodeStub(resizeStub(r.payload, 224, 224))
          case _ => decodeStub(r.payload)
        }
        MediaFeature(r.media_id, r.meta.modality, feat)
      }
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (payload = utf8 text bytes) — exercises the full pipeline against
    * the shipped testdata without real codecs. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val modality = Seq("image", "audio", "video")((id % 3).toInt)
        MediaRow(id,
          MediaMeta(modality, 640, 480, text.length.toLong * 10L, "stub"),
          text.getBytes("UTF-8"))
      }
  }

  /** Query-surface form: media features as a DataFrame compatible with
    * the k-NN operators (media_id, modality, embedding). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, dir))
      .toDF("vec_id", "modality", "embedding")
  }
}
