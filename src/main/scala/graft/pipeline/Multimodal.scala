package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct — the layout a 100 TB training pipeline uses (content-addressed
  * blobs in parquet, decoded lazily per partition). The decode itself is
  * STUBBED (no image/audio libs in this container): `decodeStub` derives
  * deterministic fake features from the bytes, while the Spark-side plumbing
  * (schema, batching, partition iteration, feature schema) is real.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))), nullable = true)))

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, checksum: Long,
      width: Int, height: Int, feature: Array[Float])

  /** Wrap a text table as fake media rows (UTF-8 bytes as the blob). */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(lit("text/plain").as("format"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** STUB decoder: a real pipeline would decode image bytes (JPEG/PNG) here;
    * we derive deterministic pseudo-features so the distributed plumbing is
    * testable. Runs per-partition over the iterator — the shape a native
    * decoder (or an Arrow-batched python worker) plugs into. */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Int, Array[Float]) = {
    var cs = 1125899906842597L // deterministic FNV-ish rolling checksum
    var i = 0
    while (i < bytes.length) { cs = cs * 31 + bytes(i); i += 1 }
    val w = 16 + (math.abs(cs) % 1024).toInt
    val h = 16 + (math.abs(cs / 1024) % 1024).toInt
    val feat = Array.tabulate(8)(j => ((cs >> (j * 8)) & 0xff).toFloat / 255f)
    (cs, w, h, feat)
  }

  /** Distributed decode + feature extraction: mapPartitions so a real
    * decoder could amortize per-partition init (codec contexts, model
    * weights). Returns a typed Dataset with a stable feature schema. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val (cs, w, h, feat) = decodeStub(b)
          MediaFeatures(id, b.length.toLong, cs, w, h, feat)
        }
      }
  }

  /** Frame-sampling stub for video-like blobs: split the byte stream into
    * `frames` fixed-width windows and emit one feature row per frame. */
  def sampleFrames(media: DataFrame, frames: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val step = math.max(1, b.length / math.max(frames, 1))
        (0 until math.min(frames, math.max(b.length / step, 1))).map { f =>
          val slice = b.slice(f * step, math.min((f + 1) * step, b.length))
          val (cs, w, h, _) = decodeStub(slice)
          (id, f, slice.length, cs, w, h)
        }
      }
      .toDF("media_id", "frame", "frame_bytes", "checksum", "width", "height")
  }
}
