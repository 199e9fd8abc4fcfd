package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * IMAGE, AUDIO and (MJPEG) VIDEO decode are REAL: [[MediaCodec.decode]]
  * runs the JDK's own `javax.imageio` (java.desktop — PNG/JPEG/GIF/BMP
  * readers ship with the JDK, headless-safe) to true pixel dimensions,
  * channel count, and grid-pooled intensity features;
  * `javax.sound.sampled` (WAV/AIFF/AU PCM) to true sample rate, channel
  * count, duration, and windowed-RMS energy features; and for video, the
  * [[VideoHeaders]] RIFF/AVI walk plus per-frame ImageIO JPEG decode —
  * MJPEG-in-AVI is exactly "one standalone JPEG per frame chunk", so the
  * bare JDK decodes it — to true dims/fps/frame-count and a temporal
  * mean-luminance envelope. Other video codings (H.26x etc. — no JDK
  * decoder exists) fall back to [[MediaCodec.decodeStub]]'s deterministic
  * fake, as do undecodable image/audio bytes, rather than failing the
  * task. Everything around the codec seam — the schema, the
  * `Dataset[MediaRow]` encoder, the mapPartitions batch shape (one codec
  * context per partition, rows streamed through it), the frame-sampling
  * explode, and the partitioning — is real Spark and is what survives when
  * a native H.26x decoder (JNI/FFI) widens the codec set at 100 TB.
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

  /** The codec seam: real JDK ImageIO for images, deterministic stub for the
    * modalities this container has no codecs for. Swapping in a native A/V
    * decoder touches only this object, no Spark plumbing.
    */
  object MediaCodec {
    val FeatureDim = 16

    // decode must never touch a display or scratch temp files inside tasks
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    /** Decode one row: images through ImageIO (real pixels), audio through
      * javax.sound (real PCM), everything else (and undecodable bytes — at
      * 100 TB some inputs are always malformed) through the deterministic
      * stub.
      */
    def decode(row: MediaRow): DecodedRow =
      if (row.modality == "image") decodeImage(row).getOrElse(decodeStub(row))
      else if (row.modality == "audio") decodeAudio(row).getOrElse(decodeStub(row))
      else if (row.modality == "video") decodeVideo(row).getOrElse(decodeStub(row))
      else decodeStub(row)

    /** Real image decode: true width/height/channels from the decoded raster
      * and a 4×4 grid of mean pixel intensities (0..1) as the feature vector
      * — a deterministic, resolution-independent content signature. Pixels
      * are sampled at a stride that caps work at ~64×64 reads per image, so
      * decode cost is bounded regardless of resolution.
      */
    private def decodeImage(row: MediaRow): Option[DecodedRow] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.content))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          if (w <= 0 || h <= 0) None
          else {
            val grid = 4 // 4×4 cells = FeatureDim
            val feats = new Array[Float](FeatureDim)
            val counts = new Array[Int](FeatureDim)
            val stride = math.max(1, math.max(w, h) / 64)
            var y = 0
            while (y < h) {
              val gy = math.min(grid - 1, y * grid / h)
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3f * 255f)
                val cell = gy * grid + math.min(grid - 1, x * grid / w)
                feats(cell) += lum
                counts(cell) += 1
                x += stride
              }
              y += stride
            }
            var c = 0
            while (c < FeatureDim) {
              if (counts(c) > 0) feats(c) /= counts(c)
              c += 1
            }
            val meta = MediaMeta(
              width = w, height = h,
              channels = img.getColorModel.getNumComponents,
              sampleRate = 0, durationMs = 0L, nFrames = 1,
              sizeBytes = row.content.length.toLong)
            Some(DecodedRow(row.id, row.modality, meta, feats))
          }
        }
      } catch { case _: Exception => None }

    /** Real audio decode (WAV/AIFF/AU — the formats the JDK's own
      * javax.sound.sampled reads): true sample rate / channels / duration
      * from the stream format, and [[FeatureDim]] temporal windows of RMS
      * amplitude over the decoded PCM as the feature vector — a
      * deterministic loudness-envelope signature. Reads at most ~256k frames
      * (stride-free: audio is sequential) so decode cost per row is bounded.
      * Handles 8-bit unsigned and 16-bit signed PCM, either endianness.
      */
    private def decodeAudio(row: MediaRow): Option[DecodedRow] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.content))
        try {
          val fmt = in.getFormat
          val totalFrames = in.getFrameLength
          val frameSize = fmt.getFrameSize
          val bits = fmt.getSampleSizeInBits
          // linear PCM only: javax.sound also hands back ULAW/ALAW streams
          // whose companded bytes would decode to garbage if read as linear
          // samples — those (and 16-bit unsigned, which the loop below does
          // not handle) fall back to the stub instead
          val enc = fmt.getEncoding
          val signedEnc = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val decodable =
            (bits == 8 && (signedEnc ||
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)) ||
              (bits == 16 && signedEnc)
          if (!decodable || totalFrames <= 0 || frameSize <= 0) None
          else {
            val readFrames = math.min(totalFrames, 262144L).toInt
            val buf = new Array[Byte](readFrames * frameSize)
            var off = 0
            var n = 0
            while (off < buf.length && n >= 0) {
              n = in.read(buf, off, buf.length - off)
              if (n > 0) off += n
            }
            val gotFrames = off / frameSize
            if (gotFrames <= 0) None
            else {
              val feats = new Array[Float](FeatureDim)
              val counts = new Array[Int](FeatureDim)
              val signed = fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              val big = fmt.isBigEndian
              var f = 0
              while (f < gotFrames) {
                // first channel of the frame; normalize to [-1, 1]
                val base = f * frameSize
                val s =
                  if (bits == 8) {
                    val v = if (signed) buf(base).toInt else (buf(base) & 0xff) - 128
                    v / 128f
                  } else {
                    val (b0, b1) = if (big) (buf(base), buf(base + 1)) else (buf(base + 1), buf(base))
                    ((b0 << 8) | (b1 & 0xff)).toShort / 32768f
                  }
                val w = math.min(FeatureDim - 1, f * FeatureDim / gotFrames)
                feats(w) += s * s
                counts(w) += 1
                f += 1
              }
              var c = 0
              while (c < FeatureDim) {
                if (counts(c) > 0) feats(c) = math.sqrt(feats(c) / counts(c)).toFloat
                c += 1
              }
              // javax.sound may report AudioSystem.NOT_SPECIFIED (-1) for
              // the frame rate; for linear PCM frameRate == sampleRate, so
              // fall back to it rather than emit a negative duration
              val frameRate =
                if (fmt.getFrameRate > 0) fmt.getFrameRate else fmt.getSampleRate
              if (frameRate <= 0) None
              else {
                val meta = MediaMeta(
                  width = 0, height = 0, channels = fmt.getChannels,
                  sampleRate = fmt.getSampleRate.toInt,
                  durationMs = (totalFrames * 1000.0 / frameRate).toLong,
                  nFrames = math.min(totalFrames, Int.MaxValue.toLong).toInt,
                  sizeBytes = row.content.length.toLong)
                Some(DecodedRow(row.id, row.modality, meta, feats))
              }
            }
          }
        } finally in.close()
      } catch { case _: Exception => None }

    /** Real video decode for MJPEG-in-AVI — the one video coding this
      * container CAN decode with the bare JDK, because each `##dc` chunk is
      * a standalone JPEG and ImageIO ships a JPEG reader. Container
      * dims/timing come from the avih header ([[VideoHeaders]]); features
      * are [[FeatureDim]] temporal windows of mean frame luminance (the
      * video twin of audio's RMS envelope), computed over at most
      * [[MaxDecodedFrames]] evenly-sampled frames so decode cost per row is
      * bounded regardless of clip length. Non-AVI / non-JPEG payloads
      * (a real deployment adds codecs behind this same seam) fall back to
      * the stub, as do clips whose sampled frames all fail to decode.
      */
    val MaxDecodedFrames = 64

    private def decodeVideo(row: MediaRow): Option[DecodedRow] =
      try {
        val info = VideoHeaders.parse(row.content)
        val chunks = VideoHeaders.frameChunks(row.content)
        if (info.format != "avi" || chunks.isEmpty) None
        else {
          val n = chunks.length
          val sampled =
            if (n <= MaxDecodedFrames) chunks.indices
            else 0 until MaxDecodedFrames map (i => i * n / MaxDecodedFrames)
          val feats = new Array[Float](FeatureDim)
          val counts = new Array[Int](FeatureDim)
          var decodedAny = false
          var (w0, h0, ch0) = (info.width, info.height, 3)
          sampled.foreach { fi =>
            val (off, len) = chunks(fi)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(row.content, off, len))
            if (img != null && img.getWidth > 0 && img.getHeight > 0) {
              decodedAny = true
              if (w0 <= 0) { w0 = img.getWidth; h0 = img.getHeight }
              ch0 = img.getColorModel.getNumComponents
              // bounded mean-luminance pass (same stride cap as decodeImage)
              val (w, h) = (img.getWidth, img.getHeight)
              val stride = math.max(1, math.max(w, h) / 64)
              var (sum, cnt, y) = (0.0, 0, 0)
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
                  cnt += 1
                  x += stride
                }
                y += stride
              }
              val win = math.min(FeatureDim - 1, fi * FeatureDim / n)
              feats(win) += (sum / math.max(1, cnt)).toFloat
              counts(win) += 1
            }
          }
          if (!decodedAny) None
          else {
            var c = 0
            while (c < FeatureDim) {
              if (counts(c) > 0) feats(c) /= counts(c)
              c += 1
            }
            val nFrames = if (info.nFrames > 0) info.nFrames else n
            val durationMs =
              if (info.usPerFrame > 0) nFrames.toLong * info.usPerFrame / 1000L else 0L
            val meta = MediaMeta(
              width = w0, height = h0, channels = ch0,
              sampleRate = 0, durationMs = durationMs, nFrames = nFrames,
              sizeBytes = row.content.length.toLong)
            Some(DecodedRow(row.id, row.modality, meta, feats))
          }
        }
      } catch { case _: Exception => None }

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

  /** REAL image-header parsing — NOT stubbed: container formats expose
    * dimensions in their headers, so format/width/height extraction needs no
    * image library, just byte arithmetic. Supports PNG (IHDR), JPEG (SOFn
    * marker scan), GIF (logical screen descriptor), BMP (BITMAPINFOHEADER).
    * Unknown/corrupt content yields ("unknown"/format, -1, -1) instead of
    * failing the task — at 100 TB some inputs are always malformed.
    */
  object ImageHeaders {
    final case class ImageInfo(format: String, width: Int, height: Int)

    def parse(bytes: Array[Byte]): ImageInfo = {
      def u8(i: Int): Int = bytes(i) & 0xff
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)

      if (bytes.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G')
        ImageInfo("png", be32(16), be32(20)) // IHDR width/height
      else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk marker segments to the first SOFn frame header
        var i = 2
        while (i + 9 < bytes.length) {
          if (u8(i) != 0xff) return ImageInfo("jpeg", -1, -1)
          if (u8(i + 1) == 0xff) { i += 1 } // fill bytes
          else {
            val m = u8(i + 1)
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
              return ImageInfo("jpeg", be16(i + 7), be16(i + 5)) // SOFn: len, precision, H, W
            if ((m >= 0xd0 && m <= 0xd9) || m == 0x01) i += 2    // standalone marker
            else i += 2 + be16(i + 2)                            // length includes itself
          }
        }
        ImageInfo("jpeg", -1, -1)
      } else if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F')
        ImageInfo("gif", le16(6), le16(8))
      else if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
        ImageInfo("bmp", le32(18), le32(22))
      else ImageInfo("unknown", -1, -1)
    }
  }

  /** REAL audio-container header parsing — the audio twin of
    * [[ImageHeaders]]: WAV/RIFF chunk walk to the fmt and data chunks, pure
    * byte arithmetic, no decoder. Unknown/corrupt content yields
    * ("unknown", -1, …) instead of failing the task.
    */
  object AudioHeaders {
    final case class AudioInfo(format: String, channels: Int, sampleRate: Int,
        bitsPerSample: Int, dataBytes: Long)

    def parse(bytes: Array[Byte]): AudioInfo = {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Long = (le16(i) | (le16(i + 2).toLong << 16)) & 0xffffffffL
      def tag(i: Int, s: String): Boolean =
        bytes.length >= i + 4 && s.indices.forall(j => u8(i + j) == s(j))

      if (!(tag(0, "RIFF") && tag(8, "WAVE"))) AudioInfo("unknown", -1, -1, -1, -1L)
      else {
        // chunk sizes come from untrusted bytes: clamp to the remaining
        // buffer and force forward progress, or a corrupt size field
        // (negative via the int reinterpretation, or huge) would spin the
        // walk forever / index out of bounds — this parser must never fail
        // a task on malformed content
        var (i, ch, sr, bps, data) = (12, -1, -1, -1, -1L)
        var sane = true
        while (sane && i + 8 <= bytes.length) {
          val size = le32(i + 4) // unsigned 32-bit as Long: never negative
          // the declared chunk size must actually cover the 16 PCM fmt
          // fields — a corrupt short fmt chunk must not read the NEXT
          // chunk's bytes as channels/rate/bits
          if (tag(i, "fmt ") && size >= 16L && i + 24 <= bytes.length) {
            ch = le16(i + 10); sr = le32(i + 12).toInt; bps = le16(i + 22)
          } else if (tag(i, "data")) data = size
          val step = 8L + size + (size & 1L) // chunks are word-aligned
          if (i + step > bytes.length.toLong) sane = false // truncated chunk: stop
          else i += step.toInt
        }
        AudioInfo("wav", ch, sr, bps, data)
      }
    }
  }

  /** REAL video-container header parsing — AVI is RIFF like WAV, so the
    * same chunk-walk applies: LIST(hdrl) → avih main header for dims /
    * frame timing, strl → strh+strf for the stream codec fourcc, and
    * LIST(movi) for the frame payload chunks. Pure byte arithmetic, no
    * decoder; unknown/corrupt content yields ("unknown", -1, …) instead of
    * failing the task.
    */
  object VideoHeaders {
    final case class VideoInfo(format: String, codec: String, width: Int,
        height: Int, usPerFrame: Long, nFrames: Int)

    private def u8(bytes: Array[Byte], i: Int): Int = bytes(i) & 0xff
    private def le16(bytes: Array[Byte], i: Int): Int =
      u8(bytes, i) | (u8(bytes, i + 1) << 8)
    private def le32(bytes: Array[Byte], i: Int): Long =
      (le16(bytes, i) | (le16(bytes, i + 2).toLong << 16)) & 0xffffffffL
    private def tag(bytes: Array[Byte], i: Int, s: String): Boolean =
      bytes.length >= i + 4 && s.indices.forall(j => u8(bytes, i + j) == s(j))
    private def fourcc(bytes: Array[Byte], i: Int): String =
      if (bytes.length < i + 4) "????"
      else new String(Array(bytes(i), bytes(i + 1), bytes(i + 2), bytes(i + 3)), "US-ASCII")

    def isAvi(bytes: Array[Byte]): Boolean =
      tag(bytes, 0, "RIFF") && tag(bytes, 8, "AVI ")

    def parse(bytes: Array[Byte]): VideoInfo = {
      if (!isAvi(bytes)) VideoInfo("unknown", "", -1, -1, -1L, -1)
      else {
        var (w, h, us, nf) = (-1, -1, -1L, -1)
        var codec = ""
        // walk: top-level chunks; descend ONLY into LIST(hdrl)/LIST(strl) —
        // same clamp-and-progress discipline as AudioHeaders (sizes are
        // untrusted; never spin, never index out of bounds)
        def walk(from: Int, to: Int): Unit = {
          var i = from
          var sane = true
          while (sane && i + 8 <= to) {
            val size = le32(bytes, i + 4)
            val body = i + 8
            if (tag(bytes, i, "LIST") && body + 4 <= to) {
              val listType = fourcc(bytes, body)
              if (listType == "hdrl" || listType == "strl")
                walk(body + 4, math.min(to.toLong, body + size).toInt)
            } else if (tag(bytes, i, "avih") && size >= 40L && body + 40 <= to) {
              us = le32(bytes, body)
              nf = le32(bytes, body + 16).toInt
              w = le32(bytes, body + 32).toInt
              h = le32(bytes, body + 36).toInt
            } else if (tag(bytes, i, "strh") && size >= 8L && body + 8 <= to) {
              if (fourcc(bytes, body) == "vids") codec = fourcc(bytes, body + 4)
            }
            val step = 8L + size + (size & 1L)
            if (i + step > to.toLong) sane = false
            else i += step.toInt
          }
        }
        walk(12, bytes.length)
        VideoInfo("avi", codec, w, h, us, nf)
      }
    }

    /** (offset, size) of each video-frame payload chunk (`##dc`/`##db`)
      * inside LIST(movi) — the real frame boundaries, unlike a fixed-stride
      * byte split. Bounded, clamped walk; empty on non-AVI bytes.
      */
    def frameChunks(bytes: Array[Byte]): Seq[(Int, Int)] = {
      if (!isAvi(bytes)) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def isFrame(i: Int): Boolean =
        bytes.length >= i + 4 &&
          Character.isDigit(bytes(i).toChar) && Character.isDigit(bytes(i + 1).toChar) &&
          bytes(i + 2).toChar == 'd' &&
          (bytes(i + 3).toChar == 'c' || bytes(i + 3).toChar == 'b')
      def walk(from: Int, to: Int): Unit = {
        var i = from
        var sane = true
        while (sane && i + 8 <= to) {
          val size = le32(bytes, i + 4)
          val body = i + 8
          if (tag(bytes, i, "LIST") && body + 4 <= to) {
            val listType = fourcc(bytes, body)
            if (listType == "movi" || listType == "rec ")
              walk(body + 4, math.min(to.toLong, body + size).toInt)
          } else if (isFrame(i) && size > 0L && body + size <= to)
            out += ((body, size.toInt))
          val step = 8L + size + (size & 1L)
          if (i + step > to.toLong) sane = false
          else i += step.toInt
        }
      }
      walk(12, bytes.length)
      out.toSeq
    }
  }

  /** Ingest a directory of media files through Spark's `binaryFile` source:
    * (id, modality, content, path, size_bytes) with a deterministic id from
    * the file path (xxhash64 — stable across runs and cluster sizes). The
    * scan is distributed and lazily reads file contents per task, so a
    * 100 TB media lake lands directly as binary-column rows; pair with
    * `spark.sql.files.maxPartitionBytes` to size media batches.
    */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, path: String,
      modality: String = "image"): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(path)
      .select(xxhash64(col("path")).as("id"), lit(modality).as("modality"),
        col("content"), col("path"), col("length").as("size_bytes"))
  }

  /** (id, format, width, height) from real container headers — the one
    * multimodal transform that is fully functional in this environment.
    */
  def imageInfo(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val info = ImageHeaders.parse(r.content)
        (r.id, info.format, info.width, info.height)
      }
    }.toDF("id", "format", "width", "height")
  }

  /** (id, format, channels, sample_rate, bits_per_sample, data_bytes) from
    * real WAV container headers — the audio twin of [[imageInfo]].
    */
  def audioInfo(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val info = AudioHeaders.parse(r.content)
        (r.id, info.format, info.channels, info.sampleRate, info.bitsPerSample, info.dataBytes)
      }
    }.toDF("id", "format", "channels", "sample_rate", "bits_per_sample", "data_bytes")
  }

  /** Decode + featurize, one codec pass per partition. `mapPartitions` (not
    * per-row UDF) is deliberate: a real decoder amortizes codec/context init
    * across the partition's batch, the same shape Arrow/Pandas batching gives
    * PySpark. Images decode for real (ImageIO); see [[MediaCodec.decode]].
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl for A/V: open codec context here, close after the batch
      rows.map(MediaCodec.decode)
    }
  }

  /** Flat decode table for a fixture directory — the driver-gate surface
    * (q121): every file in `dir` decoded for REAL through [[MediaCodec]]
    * (WAV via javax.sound, PNG/BMP via ImageIO), one row per (file,
    * feature index) with the container format from the independent header
    * parsers and the grid-intensity / RMS-envelope feature rounded to 4 dp
    * (floats re-rounded once so the committed expected table compares
    * exactly). Modality derives from the file extension; names (not hashed
    * ids) key the rows so the output is self-describing.
    */
  def decodeDirTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .withColumn("name", element_at(split(col("path"), "/"), -1))
      .withColumn("modality",
        when(col("name").endsWith(".wav"), "audio")
          .when(col("name").endsWith(".avi"), "video")
          .otherwise("image"))
      .select(col("name"), col("modality"), col("content"))
      .as[(String, String, Array[Byte])]
    raw.mapPartitions { it =>
      it.map { case (name, modality, bytes) =>
        val d = MediaCodec.decode(MediaRow(0L, modality, bytes))
        val fmt =
          if (modality == "audio") AudioHeaders.parse(bytes).format
          else if (modality == "video") VideoHeaders.parse(bytes).format
          else ImageHeaders.parse(bytes).format
        (name, modality, fmt, d.meta.width, d.meta.height, d.meta.channels,
          d.meta.sampleRate, d.meta.durationMs, d.meta.nFrames,
          d.meta.sizeBytes,
          d.features.map(f => BigDecimal(f.toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toDF("name", "modality", "format", "width", "height", "channels",
        "sample_rate", "duration_ms", "n_frames", "size_bytes", "feats")
      .select(col("name"), col("modality"), col("format"), col("width"),
        col("height"), col("channels"), col("sample_rate"),
        col("duration_ms"), col("n_frames"), col("size_bytes"),
        posexplode(col("feats")).as(Seq("feat_idx", "feat")))
  }

  /** REAL image resize over the fixture directory: decode every image file
    * and nearest-neighbor sample it to a `w`×`h` mean-RGB intensity grid in
    * [0, 1] (source pixel (⌊x·W/w⌋, ⌊y·H/h⌋) — the top-left convention, so
    * every emitted value is analytic for the synthetic fixtures: white → 1,
    * black → 0, the horizontal ramp → its source column's level). The
    * "resize" stage of the decode / feature-extract / resize / frame-sample
    * quartet; same mapPartitions batch seam and 4-dp float rounding as
    * [[decodeDirTable]] so a committed expected table compares exactly.
    *
    * Returns (name, x, y, v) — one row per target pixel, image files only.
    */
  def resizeDirTable(spark: SparkSession, dir: String, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    require(w >= 1 && h >= 1, s"target dims must be >= 1, got ${w}x$h")
    val raw = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .withColumn("name", element_at(split(col("path"), "/"), -1))
      .filter(!col("name").endsWith(".wav") && !col("name").endsWith(".avi"))
      .select(col("name"), col("content"))
      .as[(String, Array[Byte])]
    raw.mapPartitions { it =>
      it.flatMap { case (name, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Iterator.empty
        else {
          val sw = img.getWidth
          val sh = img.getHeight
          for {
            y <- (0 until h).iterator
            x <- (0 until w).iterator
          } yield {
            val rgb = img.getRGB(x * sw / w, y * sh / h)
            val inten = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 765.0
            (name, x, y, BigDecimal(inten)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
    }.toDF("name", "x", "y", "v")
  }

  /** REAL frame SAMPLING + decode over the fixture directory: every
    * `everyNth` frame of each AVI (true container boundaries via
    * [[VideoHeaders.frameChunks]]), decoded through ImageIO, reduced to
    * its mean luminance — the sampled-frame featurization step of a video
    * ingestion pipeline, driver-gatable because the committed fixtures
    * make every value analytic (ramp16.avi's frame i is constant gray
    * ~i/15). Same batch seam and 4-dp rounding as [[decodeDirTable]].
    *
    * Returns (name, frame_idx, width, height, mean_lum), AVI files only.
    */
  def videoFrameLuminanceTable(spark: SparkSession, dir: String,
      everyNth: Int): DataFrame = {
    import spark.implicits._
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val raw = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .withColumn("name", element_at(split(col("path"), "/"), -1))
      .filter(col("name").endsWith(".avi"))
      .select(col("name"), col("content"))
      .as[(String, Array[Byte])]
    raw.mapPartitions { it =>
      it.flatMap { case (name, bytes) =>
        VideoHeaders.frameChunks(bytes).zipWithIndex.iterator.collect {
          case ((off, len), idx) if idx % everyNth == 0 =>
            (name, idx, java.util.Arrays.copyOfRange(bytes, off, off + len))
        }.flatMap { case (nm, idx, jpeg) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
          if (img == null) Iterator.empty
          else {
            var sum = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 765.0
                x += 1
              }
              y += 1
            }
            val mean = sum / (img.getWidth.toLong * img.getHeight)
            Iterator.single((nm, idx, img.getWidth, img.getHeight,
              BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
        }
      }
    }.toDF("name", "frame_idx", "width", "height", "mean_lum")
  }

  /** REAL video frame extraction: explodes each AVI binary into
    * (id, frame_idx, frame) rows at the container's true frame boundaries
    * ([[VideoHeaders.frameChunks]]), taking every `everyNth` frame. For
    * MJPEG each emitted `frame` is a standalone JPEG, so downstream the
    * rows feed straight back through the IMAGE path
    * (`decode` with modality "image") — video processing composes out of
    * the container walk plus the existing image machinery, no new decoder.
    * Non-AVI rows emit nothing (corrupt inputs must not fail the task).
    */
  def videoFrames(media: Dataset[MediaRow], everyNth: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.content
        VideoHeaders.frameChunks(bytes).zipWithIndex.iterator.collect {
          case ((off, len), idx) if idx % everyNth == 0 =>
            (r.id, idx, java.util.Arrays.copyOfRange(bytes, off, off + len))
        }
      }
    }.toDF("id", "frame_idx", "frame")
  }

  /** Fixed-stride frame sampling for RAW (constant-frame-size) payloads:
    * explodes each binary into (id, frame_idx, frame_bytes) slices — pure
    * native expressions, no UDF, so the extraction stays in codegen; for
    * container formats with real frame boundaries use [[videoFrames]].
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
