package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * per-partition batch transform.
  *
  * The decode step is a STUB in this container (no image/audio codecs
  * installed): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes themselves. Everything around it — the binary column,
  * the metadata schema, the mapPartitions batch shape, the partition-count
  * preservation — is the real 100 TB plumbing: a codec swap changes ONE
  * function, not the pipeline.
  *
  * Scale notes: mapPartitions keeps the decode batched per input split (no
  * per-row JVM boundary), media blobs never shuffle (all derived columns are
  * map-side), and feature vectors come out as `array<float>` ready for the
  * Similarity operators.
  */
object Multimodal {

  case class MediaMeta(
      media_id: Long,
      byte_len: Long,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  /** Attach a binary payload column (here: utf8 text bytes stand in for an
    * image/audio blob).
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"))

  /** Deterministic fake decode: dimensions and an 8-dim feature vector
    * derived from the byte stream with a rolling polynomial hash. Replace
    * with a real codec (JavaCV / TwelveMonkeys / ffmpeg pipe) off-container.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    var h = 1125899906842597L // deterministic rolling hash over the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    def pick(k: Int): Long = {
      val x = h ^ (h >>> 29) ^ (k * 0x9E3779B97F4A7C15L)
      java.lang.Long.rotateLeft(x * 0xBF58476D1CE4E5B9L, k % 63)
    }
    val feats = Array.tabulate(8)(k => (math.abs(pick(k)) % 1000000L).toFloat / 1000000.0f)
    MediaMeta(
      media_id = id,
      byte_len = bytes.length.toLong,
      format = if (bytes.nonEmpty && bytes(0) % 2 == 0) "png" else "jpeg",
      width = 64 + (math.abs(pick(101)) % 512L).toInt,
      height = 64 + (math.abs(pick(202)) % 512L).toInt,
      channels = 3,
      features = feats)
  }

  /** Batched per-partition decode: binary payloads → typed metadata +
    * features. One decoder instantiation per partition, not per row.
    */
  def decode(payloads: DataFrame): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would open the real codec once, here a no-op
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Full stub pipeline: df(id, text) → typed media metadata frame. */
  def extractFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    decode(withPayload(df, idCol, textCol)).toDF()

  // -------------------------------------------------------------------
  // Transform stubs: resize and frame-sample. The pixel/codec work is
  // faked (deterministic byte transforms); the Spark-side contracts —
  // schemas, per-partition batching, payload-stays-on-executor — are real.
  // -------------------------------------------------------------------

  case class ResizedMedia(media_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Resize stub: clamps declared dimensions and derives a proportionally
    * truncated payload (a real impl swaps `resizeStub` for an image
    * library call; everything else is unchanged). Payload bytes never
    * leave the executors — all derived columns are map-side.
    */
  def resize(payloads: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val meta = decodeStub(id, bytes)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / meta.width, maxH.toDouble / meta.height))
        val newLen = math.max(1, (bytes.length * scale * scale).toInt)
        ResizedMedia(id, (meta.width * scale).toInt, (meta.height * scale).toInt,
          java.util.Arrays.copyOf(bytes, math.min(newLen, bytes.length)))
      })
  }

  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, payload: Array[Byte])

  /** Frame-sampling stub for video-like payloads: emit every `stride`-th
    * fixed-size chunk as a "frame" with a synthetic timestamp. The
    * one-to-many row shape (flatMap inside mapPartitions) is the real
    * contract a video decoder plugs into.
    */
  def sampleFrames(payloads: DataFrame, frameBytes: Int = 256,
                   stride: Int = 10, fps: Double = 30.0): Dataset[Frame] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by stride).iterator.map { f =>
          val from = f * frameBytes
          Frame(id, f, (f * 1000 / fps).toLong,
            java.util.Arrays.copyOfRange(bytes, from,
              math.min(from + frameBytes, bytes.length)))
        }
      })
  }
}
