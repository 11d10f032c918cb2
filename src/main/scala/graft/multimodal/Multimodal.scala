package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * Spark-side plumbing is real (schemas, typed Datasets, mapPartitions with
  * per-partition batch iteration — the JVM analog of mapInPandas batches, and
  * the natural place to amortize a native decoder handle per partition).
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `StubCodec.decode` derives deterministic pseudo-features
  * from the bytes (md5-based), clearly marked; swap `Codec` for a real
  * implementation (e.g. JNI to libjpeg/ffmpeg) without touching the plan
  * shape.
  *
  * At 100 TB: payloads stay in parquet binary columns (never shuffled unless
  * a transform needs them); metadata-only predicates prune on parquet stats
  * before any decode; decode runs scan-side inside mapPartitions so feature
  * extraction scales with executors and spills nothing.
  */
object Multimodal {

  /** typed metadata for an opaque media payload. */
  case class MediaMeta(mime: String, width: Int, height: Int, nFrames: Int)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, byte_len: Long, content_hash: Long,
      width: Int, height: Int, brightness: Double)
  case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Pluggable codec boundary — the only piece that would change with a real
    * decoder. */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta): MediaFeatures
    def sampleFrames(payload: Array[Byte], meta: MediaMeta, every: Int): Seq[FrameSample]
  }

  /** STUB codec: deterministic md5-derived pseudo-features in place of real
    * pixel decoding. Structure (per-partition handle reuse, batch iteration)
    * is what a real codec plugs into. */
  object StubCodec extends Codec {
    private def md5Long(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      // first 60 bits, matching TextFunctions.hexLong60 on the hex string
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def decode(payload: Array[Byte], meta: MediaMeta): MediaFeatures =
      MediaFeatures(-1L, payload.length.toLong, md5Long(payload),
        meta.width, meta.height,
        // fake "mean brightness": payload byte mean scaled to [0,1], 4dp
        math.floor(payload.map(_ & 0xFF).sum.toDouble / math.max(payload.length, 1) / 255.0 * 10000.0 + 0.5) / 10000.0)
    def sampleFrames(payload: Array[Byte], meta: MediaMeta, every: Int): Seq[FrameSample] =
      (0 until meta.nFrames by every).map { f =>
        FrameSample(-1L, f, md5Long(payload ++ s"#$f".getBytes("UTF-8")))
      }
  }

  /** Decode + feature-extract over a media table. mapPartitions so a real
    * codec initializes once per partition, not per row. */
  def extractFeatures(media: Dataset[MediaRow], codec: Codec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec setup happens here (native handles, buffers)
      it.map(r => codec.decode(r.payload, r.meta).copy(media_id = r.media_id))
    }
  }

  /** Resize: metadata transform + payload passthrough (a real impl would
    * re-encode scan-side; the plan shape — no shuffle — is identical). */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(math.max(r.meta.width, r.meta.height), 1))
      r.copy(meta = r.meta.copy(
        width = math.max(1, (r.meta.width * scale).toInt),
        height = math.max(1, (r.meta.height * scale).toInt)))
    }
  }

  /** Frame sampling: one output row per sampled frame (video → frames). */
  def sampleFrames(media: Dataset[MediaRow], every: Int,
      codec: Codec = StubCodec): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap(r => codec.sampleFrames(r.payload, r.meta, every).map(_.copy(media_id = r.media_id)))
  }

  /** Build a deterministic media table from the documents fixture: payload =
    * UTF-8 bytes, metadata derived from doc fields. Stands in for a real
    * binary-bearing table (no image data ships with the test corpus). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("image/fake").as("mime"),
          (col("n_chars") % 640 + 1).cast("int").as("width"),
          (col("n_chars") % 480 + 1).cast("int").as("height"),
          (col("n_chars") % 16 + 1).cast("int").as("nFrames")).as("meta"))
      .as[MediaRow]
  }
}
