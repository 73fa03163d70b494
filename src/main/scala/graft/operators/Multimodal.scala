package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side shape is real and tested — binary columns, metadata
  * structs, per-partition batched processing via `mapPartitions` on a
  * typed Dataset (the Scala analogue of `mapInPandas` batching). The
  * codec itself is STUBBED (this container has no image/audio libs): a
  * deterministic fake derives features from the bytes, clearly marked
  * below. Swapping in a real decoder changes one function, not the
  * pipeline.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String,
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                           feature: Array[Float])

  /** Wrap a documents table into a media table: binary payload + typed
    * metadata struct. In production the binary comes from the raw scan;
    * here it is the utf-8 text bytes (deterministic).
    */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"),
      (pmod(col(idCol), lit(640)) + 64).cast("int").as("width"),
      (pmod(col(idCol), lit(480)) + 48).cast("int").as("height"))

  /** STUB decoder: a real implementation would decode the media bytes
    * (e.g. javax.imageio / ffmpeg bindings) inside this per-partition
    * loop. The deterministic fake derives an 8-dim feature from byte
    * statistics so downstream plumbing (schema, batching, joins) is
    * fully exercised.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // ??? real codec goes here; deterministic fake below
    val buckets = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { buckets((bytes(i) & 0xFF) % 8) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    buckets.map(_ / n)
  }

  /** Feature extraction: batched per partition, no driver involvement.
    * Partition count (not row count) bounds peak memory — repartition
    * upstream so each task holds one batch of decodable payloads.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          MediaFeatures(id, bytes.length.toLong, polyChecksum(bytes), decodeStub(bytes))
        }
      }
  }

  /** Payload checksum as a polynomial fold over the bytes — the same
    * portable construction as TextAnalysis.fingerprint (any engine can
    * recompute it, which is what makes m2 oracle-checkable; CRC32 was
    * not expressible in the oracle's SQL).
    */
  def polyChecksum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xFF)) % 1000000007L
      i += 1
    }
    acc
  }

  case class ResizedMedia(doc_id: Long, media: Array[Byte], mime: String,
                          width: Int, height: Int)

  /** Image resize stage: per-partition batched like extractFeatures.
    * The pixel resampler is STUBBED (no image codecs in this
    * container): the deterministic fake byte-subsamples the payload to
    * the target size's byte budget, preserving the real pipeline
    * contract — output metadata reflects the target dimensions, the
    * payload column stays binary, batching stays per-partition. A real
    * implementation swaps `resampleStub` for an imageio/ffmpeg call.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height")
      .as[(Long, Array[Byte], String, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, bytes, mime, w, h) =>
          ResizedMedia(id, resampleStub(bytes, w, h, targetW, targetH),
            mime, targetW, targetH)
        }
      }
  }

  /** STUB resampler: deterministic byte subsample proportional to the
    * pixel-count ratio (??? real scaler goes here).
    */
  private def resampleStub(bytes: Array[Byte], w: Int, h: Int,
                           tw: Int, th: Int): Array[Byte] = {
    if (bytes.isEmpty || w <= 0 || h <= 0) return bytes
    val ratio = math.min(1.0, (tw.toDouble * th) / (w.toDouble * h))
    val outLen = math.max(1, math.round(bytes.length * ratio).toInt)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = bytes((i.toLong * bytes.length / outLen).toInt)
      i += 1
    }
    out
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk of
    * `frameBytes` bytes becomes a frame row (explode — distributed, no
    * per-row Python/driver hop).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   stride: Int = 4): DataFrame = {
    val nFrames = floor(octet_length(col("media")) / frameBytes).cast("int")
    media.select(col("doc_id"), col("media"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        col("media").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }
}
