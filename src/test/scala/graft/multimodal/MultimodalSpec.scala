package graft.multimodal

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(id: Long, modality: String, n: Int): MediaRow =
    MediaRow(id, modality, Array.tabulate(n)(i => ((i * 7 + id) % 256).toByte))

  test("decode produces typed metadata and fixed-dim features per partition") {
    val ds = spark.createDataset(Seq(
      media(1, "image", 256), media(2, "audio", 512), media(3, "video", 1024)))
      .repartition(2)
    val out = decode(ds).collect().map(r => r.id -> r).toMap
    assert(out.size === 3)
    assert(out(1).features.length === MediaCodec.FeatureDim)
    assert(out(2).meta.sampleRate % 8000 === 0 && out(2).meta.sampleRate > 0)
    assert(out(1).meta.sampleRate === 0)
    assert(out(3).meta.nFrames === 1024 / 64)
    assert(out(1).meta.sizeBytes === 256L)
    // determinism: same bytes -> same features
    val again = decode(ds).collect().map(r => r.id -> r.features.toSeq).toMap
    assert(again(3) === out(3).features.toSeq)
  }

  test("decode runs a REAL image decode through the JDK's ImageIO") {
    // real encoded images, produced by the same JDK codecs that decode them
    def encode(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val whitePng = encode("png", 48, 32, 0xffffff)
    val blackBmp = encode("bmp", 20, 10, 0x000000)
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "image", whitePng),
      MediaRow(2L, "image", blackBmp),
      MediaRow(3L, "image", Array[Byte](1, 2, 3)))) // undecodable → stub fallback
    val out = decode(ds).collect().map(r => r.id -> r).toMap

    // meta agrees with the independent container-header parser
    val pngInfo = ImageHeaders.parse(whitePng)
    assert((out(1L).meta.width, out(1L).meta.height) === (pngInfo.width, pngInfo.height))
    assert((out(1L).meta.width, out(1L).meta.height) === (48, 32))
    val bmpInfo = ImageHeaders.parse(blackBmp)
    assert((out(2L).meta.width, out(2L).meta.height) === (bmpInfo.width, bmpInfo.height))
    assert(out(1L).meta.channels === 3 && out(2L).meta.channels === 3)
    // grid-pooled intensity features see the actual pixels
    assert(out(1L).features.forall(f => f > 0.99f && f <= 1.0f)) // white
    assert(out(2L).features.forall(_ < 0.01f))                   // black
    // fallback keeps the pipeline total: stub meta, not an exception
    assert(out(3L).meta.sizeBytes === 3L)
  }

  // a real WAV file produced by the same JDK sound stack that decodes it:
  // 16-bit signed mono PCM sine at `freq` Hz, `seconds` long
  private def wavBytes(sampleRate: Int, seconds: Double, freq: Double,
      amplitude: Double = 0.5): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * amplitude * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte        // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decode runs a REAL audio decode through the JDK's javax.sound") {
    val tone = wavBytes(8000, 1.0, 440.0)           // 1 s, constant envelope
    val halfSilent = {                              // loud half then silence
      val n = 8000
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n / 2) {
        val s = (math.sin(2 * math.Pi * 440 * i / 8000.0) * 0.5 * 32767).toInt
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "audio", tone),
      MediaRow(2L, "audio", halfSilent),
      MediaRow(3L, "audio", Array[Byte](1, 2, 3)))) // undecodable → stub fallback
    val out = decode(ds).collect().map(r => r.id -> r).toMap

    assert(out(1L).meta.sampleRate === 8000)
    assert(out(1L).meta.channels === 1)
    assert(out(1L).meta.durationMs === 1000L)
    assert(out(1L).meta.nFrames === 8000)
    // constant tone: every RMS window sees the same energy (~0.5/√2 ≈ 0.354)
    assert(out(1L).features.forall(f => f > 0.3f && f < 0.4f))
    // loud-then-silent: first window loud, last window silent
    assert(out(2L).features.head > 0.3f && out(2L).features.last < 0.01f)
    // meta agrees with the independent RIFF header parser
    val info = AudioHeaders.parse(tone)
    assert((info.format, info.channels, info.sampleRate, info.bitsPerSample) ===
      (("wav", 1, 8000, 16)))
    assert(info.dataBytes === 16000L)
    // fallback keeps the pipeline total: stub meta, not an exception
    assert(out(3L).meta.sizeBytes === 3L)
  }

  test("AudioHeaders.parse never hangs or throws on corrupt chunk sizes") {
    def riff(size: Long): Array[Byte] = {
      val b = new Array[Byte](32)
      "RIFF".getBytes("ASCII").copyToArray(b, 0)
      "WAVE".getBytes("ASCII").copyToArray(b, 8)
      "fmt ".getBytes("ASCII").copyToArray(b, 12)
      // chunk size field at offset 16, little-endian
      for (j <- 0 until 4) b(16 + j) = ((size >> (8 * j)) & 0xff).toByte
      b
    }
    // 0xFFFFFFF8 would be -8 as an int (zero forward progress); 0x80000000
    // a negative index jump — both must degrade gracefully, not spin/throw
    for (bad <- Seq(0xFFFFFFF8L, 0x80000000L, 0x7FFFFFFFL)) {
      val info = AudioHeaders.parse(riff(bad))
      assert(info.format === "wav") // header recognized, walk stopped sanely
    }
    assert(AudioHeaders.parse(Array.empty[Byte]).format === "unknown")
  }

  test("AudioHeaders.parse ignores a fmt chunk declared shorter than 16 bytes") {
    // fmt declares size 4: the PCM fields live past its end, so reading
    // them would take the NEXT chunk's bytes as channels/rate/bits
    val b = new Array[Byte](48)
    "RIFF".getBytes("ASCII").copyToArray(b, 0)
    "WAVE".getBytes("ASCII").copyToArray(b, 8)
    "fmt ".getBytes("ASCII").copyToArray(b, 12)
    b(16) = 4 // declared fmt size 4 < 16
    "data".getBytes("ASCII").copyToArray(b, 24)
    b(28) = 8 // data size
    val info = AudioHeaders.parse(b)
    assert(info.format === "wav")
    assert((info.channels, info.sampleRate, info.bitsPerSample) === ((-1, -1, -1)))
    assert(info.dataBytes === 8L)
  }

  test("non-PCM (u-law) audio falls back to the stub instead of misdecoding") {
    // 8-bit u-law mono WAV: javax.sound reads it, but the companded bytes
    // are not linear PCM — decode must NOT interpret them as such
    val n = 800
    val pcm = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * 440 * i / 8000.0) * 0.5 * 127).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val ds = spark.createDataset(Seq(MediaRow(1L, "audio", bos.toByteArray)))
    val out = decode(ds).collect().head
    // stub fallback marks itself by the byte-derived sampleRate scheme
    // (multiple of 8000 by construction) and durationMs = 10×size
    assert(out.meta.durationMs === bos.toByteArray.length.toLong * 10L)
  }

  test("audioInfo parses real RIFF/WAVE headers distributed over the binary column") {
    val ds = Seq(
      MediaRow(1L, "audio", wavBytes(16000, 0.25, 220.0)),
      MediaRow(2L, "audio", Array[Byte](9, 9, 9))).toDS()
    val rows = Multimodal.audioInfo(ds)
      .as[(Long, String, Int, Int, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(rows(1L) === (("wav", 1, 16000, 16, 8000L)))
    assert(rows(2L)._1 === "unknown")
  }

  test("imageInfo parses real PNG/JPEG/GIF/BMP headers from bytes") {
    import Multimodal.{ImageHeaders, MediaRow}
    // hand-built minimal headers (real container layouts, no image libs)
    def png(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](24)
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).zipWithIndex
        .foreach { case (v, i) => b(i) = v.toByte }
      // 8..15: IHDR chunk length+type (content irrelevant to the parser)
      def be32(i: Int, v: Int): Unit = {
        b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
        b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
      }
      be32(16, w); be32(20, h)
      b
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      // SOI, APP0 (len 4, empty), SOF0: len 11, precision, H, W, 1 component
      val seg = Array[Int](0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
        0xff, 0xc0, 0x00, 0x0b, 0x08, h >> 8, h & 0xff, w >> 8, w & 0xff, 0x01, 0x00, 0x00, 0x00)
      seg.map(_.toByte)
    }
    def gif(w: Int, h: Int): Array[Byte] =
      ("GIF89a".getBytes("ASCII") ++ Array((w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte)).padTo(12, 0.toByte)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](26)
      b(0) = 'B'; b(1) = 'M'
      def le32(i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
        b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
      }
      le32(18, w); le32(22, h)
      b
    }
    assert(ImageHeaders.parse(png(640, 480)) === ImageHeaders.ImageInfo("png", 640, 480))
    assert(ImageHeaders.parse(jpeg(1920, 1080)) === ImageHeaders.ImageInfo("jpeg", 1920, 1080))
    assert(ImageHeaders.parse(gif(320, 200)) === ImageHeaders.ImageInfo("gif", 320, 200))
    assert(ImageHeaders.parse(bmp(800, 600)) === ImageHeaders.ImageInfo("bmp", 800, 600))
    assert(ImageHeaders.parse(Array[Byte](1, 2, 3)).format === "unknown")

    // distributed path over the binary column
    val ds = Seq(MediaRow(1L, "image", png(64, 32)), MediaRow(2L, "image", jpeg(16, 8)),
      MediaRow(3L, "image", Array[Byte](9, 9))).toDS()
    val out = Multimodal.imageInfo(ds).as[(Long, String, Int, Int)].collect().toSet
    assert(out === Set((1L, "png", 64, 32), (2L, "jpeg", 16, 8), (3L, "unknown", -1, -1)))
  }

  test("readBinaryDir ingests real files via the binaryFile source") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      def png(w: Int, h: Int): Array[Byte] = {
        val b = new Array[Byte](24)
        Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).zipWithIndex
          .foreach { case (v, i) => b(i) = v.toByte }
        def be32(i: Int, v: Int): Unit = {
          b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
          b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
        }
        be32(16, w); be32(20, h)
        b
      }
      java.nio.file.Files.write(new java.io.File(dir, "a.png").toPath, png(640, 480))
      java.nio.file.Files.write(new java.io.File(dir, "b.png").toPath, png(32, 16))
      val df = Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
      assert(df.columns.toSeq === Seq("id", "modality", "content", "path", "size_bytes"))
      val media = df.select(col("id"), col("modality"), col("content"))
        .as[MediaRow]
      val infos = Multimodal.imageInfo(media)
        .select("format", "width", "height").as[(String, Int, Int)].collect().toSet
      assert(infos === Set(("png", 640, 480), ("png", 32, 16)))
      // deterministic ids: re-reading yields the same id per path
      val ids1 = df.select("path", "id").as[(String, Long)].collect().toMap
      val ids2 = Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
        .select("path", "id").as[(String, Long)].collect().toMap
      assert(ids1 === ids2)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("video as fixed-size image frames: sampleFrames composes with real decode") {
    // a "video" of 4 equal-size PNG frames (white, black, white, black):
    // frame sampling is pure expressions; each sampled frame then decodes
    // for real through the image path — the composition a real codec would
    // slot into at the same seam
    def frame(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val f0 = frame(0xffffff)
    // pad all frames to a common size so fixed-stride slicing is exact
    val frames = Seq(f0, frame(0x000000), frame(0xffffff), frame(0x000000))
    val size = frames.map(_.length).max
    val padded = frames.map(f => f ++ Array.fill(size - f.length)(0.toByte))
    val video = padded.reduce(_ ++ _)

    val df = spark.createDataset(Seq(MediaRow(1L, "video", video))).toDF()
    val sampled = sampleFrames(df, "content", "id", frameBytes = size, everyNth = 2)
    val decoded = decode(sampled.select(
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.lit("image").as("modality"),
        org.apache.spark.sql.functions.col("frame").as("content"))
      .as[MediaRow])
      .collect()
    // frames 0 and 2 sampled — both white 8x8 PNGs, really decoded
    // (ImageIO tolerates the zero-padding after IEND)
    assert(decoded.length === 2)
    assert(decoded.forall(r => r.meta.width === 8 && r.meta.height === 8))
    assert(decoded.forall(_.features.forall(f => f > 0.99f)))
  }

  test("sampleFrames slices binary at fixed stride without UDFs") {
    val df = spark.createDataset(Seq(media(7, "video", 300))).toDF()
    val frames = sampleFrames(df, "content", "id", frameBytes = 100, everyNth = 2)
      .orderBy("sample_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length === 100))
  }

  test("decode runs a REAL MJPEG video decode: RIFF walk + per-frame ImageIO") {
    // 16 constant-gray JPEG frames ramping black → white in a hand-built
    // AVI — written by the same JDK JPEG encoder whose decoder reads it
    val avi = FixtureGen.mjpegAvi(32, 24, 8, (0 until 16).map { i =>
      val v = i * 255 / 15
      FixtureGen.jpegFrame(32, 24)((_, _) => (v << 16) | (v << 8) | v)
    })
    // container parse agrees with what the writer put in avih/strh
    val info = VideoHeaders.parse(avi)
    assert(info === VideoHeaders.VideoInfo("avi", "MJPG", 32, 24, 125000L, 16))
    assert(VideoHeaders.frameChunks(avi).length === 16)

    val ds = spark.createDataset(Seq(
      MediaRow(1L, "video", avi),
      MediaRow(2L, "video", Array[Byte](1, 2, 3)))) // non-AVI → stub fallback
    val out = decode(ds).collect().map(r => r.id -> r).toMap
    val v = out(1L)
    assert((v.meta.width, v.meta.height, v.meta.channels) === ((32, 24, 3)))
    assert(v.meta.nFrames === 16)
    assert(v.meta.durationMs === 2000L) // 16 frames @ 8 fps
    assert(v.meta.sampleRate === 0)
    // 16 frames over FeatureDim=16 windows: window i sees exactly frame i,
    // whose constant gray decodes near-losslessly (DC-only JPEG blocks) —
    // the temporal luminance envelope ramps ~i/15
    val f = v.features
    assert(f.length === MediaCodec.FeatureDim)
    f.zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(x - i / 15.0f) < 0.02f, s"window $i: $x vs ${i / 15.0f}")
    }
    // stub fallback keeps the pipeline total
    assert(out(2L).meta.sizeBytes === 3L)
  }

  test("videoFrames explodes real AVI frame boundaries; frames re-decode as images") {
    val avi = FixtureGen.mjpegAvi(16, 12, 4, (0 until 6).map { i =>
      val v = if (i % 2 == 0) 0xffffff else 0x000000
      FixtureGen.jpegFrame(16, 12)((_, _) => v)
    })
    val ds = spark.createDataset(Seq(MediaRow(5L, "video", avi)))
    val frames = videoFrames(ds, everyNth = 2).orderBy("frame_idx")
    val rows = frames.as[(Long, Int, Array[Byte])].collect()
    assert(rows.map(_._2).toSeq === Seq(0, 2, 4)) // every 2nd of 6 frames
    // each emitted frame is a standalone JPEG the IMAGE path really decodes
    val decoded = decode(frames.select(
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.lit("image").as("modality"),
        org.apache.spark.sql.functions.col("frame").as("content"))
      .as[MediaRow]).collect()
    assert(decoded.length === 3)
    assert(decoded.forall(r => r.meta.width === 16 && r.meta.height === 12))
    assert(decoded.forall(_.features.forall(f => f > 0.97f))) // sampled = white frames
    // corrupt bytes emit zero frames, not an exception
    assert(videoFrames(spark.createDataset(Seq(
      MediaRow(6L, "video", Array[Byte](9, 9, 9))))).count() === 0L)
  }

  test("VideoHeaders walks never hang or throw on corrupt chunk sizes") {
    def avi(size: Long): Array[Byte] = {
      val b = new Array[Byte](40)
      "RIFF".getBytes("ASCII").copyToArray(b, 0)
      "AVI ".getBytes("ASCII").copyToArray(b, 8)
      "LIST".getBytes("ASCII").copyToArray(b, 12)
      for (j <- 0 until 4) b(16 + j) = ((size >> (8 * j)) & 0xff).toByte
      "movi".getBytes("ASCII").copyToArray(b, 20)
      "00dc".getBytes("ASCII").copyToArray(b, 24)
      for (j <- 0 until 4) b(28 + j) = ((size >> (8 * j)) & 0xff).toByte
      b
    }
    for (bad <- Seq(0xFFFFFFF8L, 0x80000000L, 0x7FFFFFFFL)) {
      assert(VideoHeaders.parse(avi(bad)).format === "avi")
      assert(VideoHeaders.frameChunks(avi(bad)).isEmpty) // clamped, no OOB slice
    }
    assert(VideoHeaders.parse(Array.empty[Byte]).format === "unknown")
    assert(VideoHeaders.frameChunks(Array.empty[Byte]).isEmpty)
  }

  test("committed fixtures decode to the committed expected table (q121 twin)") {
    val dir = new java.io.File("fixtures/multimodal")
    assert(dir.isDirectory, "committed fixture directory missing")
    val fresh = Multimodal.decodeDirTable(spark, dir.getAbsolutePath)
    val expected = spark.read.parquet("fixtures/multimodal_expected.parquet")
    assert(fresh.count() === 6L * MediaCodec.FeatureDim)
    assert(fresh.except(expected).isEmpty && expected.except(fresh).isEmpty,
      "decode output drifted from the committed expected table — " +
        "regenerate via graft.multimodal.FixtureGen ONLY if the change is intended")
    // the analytically-known rows, independent of the recording: white ⇒
    // exactly 1.0 everywhere, black ⇒ 0.0, constant tone ⇒ amp/√2 (16-bit
    // quantized), steps.wav tail ⇒ digital silence
    val byName = fresh.select("name", "feat_idx", "feat")
      .as[(String, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byName("white.png").forall(_ === 1.0))
    assert(byName("black.bmp").forall(_ === 0.0))
    assert(byName("tone440.wav").forall(f => f > 0.35 && f < 0.36))
    assert(byName("steps.wav").takeRight(4).forall(_ === 0.0))
    // ramp16.avi: 16 constant-gray MJPEG frames black → white, one per
    // temporal window — the luminance envelope ramps ~i/15
    byName("ramp16.avi").zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(x - i / 15.0) < 0.02, s"avi window $i: $x")
    }
  }

  test("resizeDirTable nearest-neighbor grid is analytic on the fixtures") {
    val dir = new java.io.File("fixtures/multimodal").getAbsolutePath
    val out = Multimodal.resizeDirTable(spark, dir, 4, 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    // 16 pixels per image file, no audio/video rows
    assert(out.size === out.keys.map(_._1).toSet.size * 16)
    assert(out.keys.map(_._1).toSet === Set("white.png", "black.bmp", "ramp.png"))
    assert(out.filter(_._1._1 == "white.png").values.forall(_ === 1.0))
    assert(out.filter(_._1._1 == "black.bmp").values.forall(_ === 0.0))
    // 64-wide ramp at w=4: source col x*16, level (x*16*255/63)/255, 4 dp
    for (x <- 0 until 4) {
      val lvl = BigDecimal((x * 16 * 255 / 63) / 255.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      for (y <- 0 until 4) assert(out(("ramp.png", x, y)) === lvl, s"($x,$y)")
    }
  }

  test("videoFrameLuminanceTable samples true frame boundaries with analytic levels") {
    val dir = new java.io.File("fixtures/multimodal").getAbsolutePath
    val out = Multimodal.videoFrameLuminanceTable(spark, dir, everyNth = 4)
      .collect().map(r => r.getInt(1) -> r.getDouble(4)).toMap
    assert(out.keySet === Set(0, 4, 8, 12)) // 16 frames, every 4th
    // constant-gray frame i decodes losslessly: mean luminance = (i*255/15)/255
    for ((i, v) <- out)
      assert(math.abs(v - (i * 255 / 15) / 255.0) < 5e-4, s"frame $i: $v")
  }

  test("resizeMeta caps dimensions, preserves struct shape") {
    val ds = spark.createDataset(Seq(media(9, "image", 64)))
    val decoded = decode(ds)
    val capped = resizeMeta(decoded, maxDim = 32)
    val m = capped.select("meta.width", "meta.height", "meta.sizeBytes").collect().head
    assert(m.getInt(0) <= 32 && m.getInt(1) <= 32 && m.getLong(2) === 64L)
  }
}
