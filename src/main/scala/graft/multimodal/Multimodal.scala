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
}
