package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): [[MediaCodec.decodeStub]] derives deterministic fake metadata
  * and features from the bytes. Everything around the stub — the schema, the
  * `Dataset[MediaRow]` encoder, the mapPartitions batch shape (one codec
  * context per partition, rows streamed through it), the frame-sampling
  * explode, and the partitioning — is real Spark and is what survives when a
  * native decoder (JNI/FFI) replaces the stub at 100 TB.
  */
object Multimodal {

  /** Raw media row: (id, modality, content). */
  final case class MediaRow(id: Long, modality: String, content: Array[Byte])

  /** Typed metadata extracted by "decode". */
  final case class MediaMeta(
      width: Int, height: Int, channels: Int,
      sampleRate: Int, durationMs: Long, nFrames: Int, sizeBytes: Long)

  final case class DecodedRow(
      id: Long, modality: String, meta: MediaMeta, features: Array[Float])

  /** The codec seam. Deterministic fake: metadata and a 16-dim feature
    * vector derived from the byte content; replace body with a real decoder
    * without touching any Spark plumbing.
    */
  object MediaCodec {
    val FeatureDim = 16

    def decodeStub(row: MediaRow): DecodedRow = {
      val bytes = row.content
      def byteAt(i: Int): Int = if (bytes.length > i) bytes(i) & 0xff else 0
      // "header": first 4 bytes -> dims; next 2 -> channels/rate class
      val meta = MediaMeta(
        width = byteAt(0) * 256 + byteAt(1),
        height = byteAt(2) * 256 + byteAt(3),
        channels = (byteAt(4) % 4) + 1,
        sampleRate = if (row.modality == "audio") 8000 * ((byteAt(5) % 6) + 1) else 0,
        durationMs = bytes.length.toLong * 10L,
        nFrames = if (row.modality == "video") bytes.length / 64 else 1,
        sizeBytes = bytes.length.toLong)
      // rolling-hash features over byte windows — deterministic stand-in for
      // an embedding model
      val feats = Array.tabulate(FeatureDim) { j =>
        var h = 1125899906842597L
        var i = j
        while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += FeatureDim }
        ((h % 1000003L).toFloat / 1000003f)
      }
      DecodedRow(row.id, row.modality, meta, feats)
    }
  }

  /** Decode + featurize, one codec pass per partition. `mapPartitions` (not
    * per-row UDF) is deliberate: a real decoder amortizes codec/context init
    * across the partition's batch, the same shape Arrow/Pandas batching gives
    * PySpark.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec context here, close after the batch
      rows.map(MediaCodec.decodeStub)
    }
  }

  /** Fixed-stride video frame sampling: explodes each binary into
    * (id, frame_idx, frame_bytes) slices — pure native expressions, no UDF,
    * so frame extraction stays in codegen and only the decode of each frame
    * needs the codec seam.
    */
  def sampleFrames(media: DataFrame, contentCol: String, idCol: String,
      frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = (length(col(contentCol)) / frameBytes).cast("int")
    media.select(
        col(idCol).as("id"),
        posexplode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyNth))))
      .withColumnRenamed("pos", "sample_idx").withColumnRenamed("col", "frame_idx")
      .join(media.select(col(idCol).as("id"), col(contentCol).as("__c")), "id" :: Nil)
      .select(col("id"), col("sample_idx"), col("frame_idx"),
        col("__c").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }

  /** "Resize" = metadata-level transform (real resize lives behind the codec
    * seam); keeps the typed meta struct shape intact.
    */
  def resizeMeta(decoded: Dataset[Multimodal.DecodedRow], maxDim: Int): DataFrame = {
    decoded.toDF().withColumn("meta",
      struct(
        least(col("meta.width"), lit(maxDim)).as("width"),
        least(col("meta.height"), lit(maxDim)).as("height"),
        col("meta.channels"), col("meta.sampleRate"),
        col("meta.durationMs"), col("meta.nFrames"), col("meta.sizeBytes")))
  }
}
