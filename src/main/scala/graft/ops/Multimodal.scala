package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batched per-partition passes (the Scala analog
  * of `mapInPandas` — one buffer in, one typed batch out; the engine owns
  * schema/partitioning/batch shape, the codec is pluggable).
  *
  * No image/audio codecs exist in this container, so the DECODE step is a
  * deterministic stand-in: byte-level features (histogram / strided
  * samples) that are real computations over the binary payload — the
  * Spark-side contract (schema, null behavior, batch shape) is what is
  * tested. Swap `decode` for a real codec at deployment; nothing else
  * changes.
  */
object Multimodal {

  case class MediaFeature(url: String, mediaType: String, nBytes: Long,
                          features: Array[Float])

  /** Pluggable decoder: bytes → fixed-dim feature vector. The default is
    * a 16-bin byte histogram, L1-normalized — deterministic, codec-free.
    */
  type Decoder = Array[Byte] => Array[Float]

  val byteHistogram16: Decoder = bytes => {
    val h = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    if (bytes.length > 0) { var j = 0; while (j < 16) { h(j) /= bytes.length; j += 1 } }
    h
  }

  /** Batched feature extraction over a binary column.
    * @param media (url string, media_type string, payload binary)
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      decode: Decoder = byteHistogram16): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("url"), col("media_type"), col("payload"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        // One decoder instance per partition (mirrors the per-batch model
        // state of a mapInPandas UDF); rows stream through in batch order.
        it.map { case (url, mt, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          MediaFeature(url, mt, bytes.length.toLong, decode(bytes))
        }
      }
  }

  /** "Frame sampling" for a time-indexed payload: `n` evenly-spaced fixed
    * windows of the byte stream (a real codec replaces windows with
    * decoded frames; row-explosion shape and ordering are the contract).
    * @return (url, frame_idx, frame: binary)
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val idx = sequence(lit(0), lit(n - 1))
    val step = greatest(
      ((length(col("payload")) - frameBytes) / math.max(n - 1, 1)).cast("long"), lit(0L))
    media.select(col("url"), col("payload"), explode(idx).as("frame_idx"))
      .select(col("url"), col("frame_idx"),
        col("payload").substr(
          (col("frame_idx") * step + 1).cast("int"), lit(frameBytes)).as("frame"))
  }
}
