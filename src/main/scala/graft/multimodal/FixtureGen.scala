package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File}
import java.nio.file.Files

/** One-off generator for the committed multimodal driver-gate fixtures
  * (the `fixtures/multimodal` directory) and their expected decode table
  * (`fixtures/multimodal_expected.parquet`) — run once, output committed,
  * never executed by the driver. The fixtures are produced by the SAME JDK
  * stacks that later decode them (javax.sound for WAV, ImageIO for
  * PNG/BMP), and several carry analytically known decode results that
  * MultimodalSpec pins independently (a pure-white image featurizes to
  * exactly 1.0 per grid cell, a constant sine's RMS windows sit at
  * amp/sqrt(2), trailing silence at 0), so the expected table is
  * hand-checkable, not just a recording.
  */
object FixtureGen {

  private def wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def sine(sampleRate: Int, n: Int, freq: Double, amp: Double): Array[Short] =
    Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freq * i / sampleRate) * amp * 32767).toShort)

  private def image(fmt: String, w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** Minimal MJPEG-in-AVI writer: RIFF(AVI ) { LIST(hdrl){ avih,
    * LIST(strl){ strh(vids/MJPG), strf(BITMAPINFOHEADER) } }, LIST(movi){
    * 00dc = one standalone JPEG per frame } }. Written with the same JDK
    * JPEG encoder whose decoder later reads the frames back.
    */
  private[multimodal] def mjpegAvi(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long): Array[Byte] =
      Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ body)

    val usPerFrame = 1000000L / fps
    val maxFrameBytes = frames.map(_.length).max.toLong
    val avih = le32(usPerFrame) ++ le32(maxFrameBytes * fps) ++ le32(0) ++
      le32(0) /*flags: no index*/ ++ le32(frames.length.toLong) ++
      le32(0) ++ le32(1) ++ le32(maxFrameBytes) ++ le32(w.toLong) ++ le32(h.toLong) ++
      Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
      le32(1) /*scale*/ ++ le32(fps.toLong) /*rate*/ ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(maxFrameBytes) ++ le32(0xffffffffL) /*quality*/ ++
      le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
      "MJPG".getBytes("US-ASCII") ++ le32(w.toLong * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(riffBody.length.toLong))
    bos.write(riffBody)
    bos.toByteArray
  }

  private[multimodal] def jpegFrame(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] =
    image("jpg", w, h)(rgb)

  def writeFixtures(dir: String): Unit = {
    val d = new File(dir)
    d.mkdirs()
    def put(name: String, bytes: Array[Byte]): Unit =
      Files.write(new File(d, name).toPath, bytes)
    // constant 440 Hz tone, amp 0.5: every RMS window ~ 0.5/sqrt(2)
    put("tone440.wav", wav(8000, sine(8000, 8000, 440.0, 0.5)))
    // loud half then digital silence: loud windows then exact zeros
    put("steps.wav", wav(8000,
      sine(8000, 4000, 440.0, 0.5) ++ Array.fill[Short](4000)(0)))
    // pure white: every 4x4 grid cell exactly 1.0
    put("white.png", image("png", 48, 32)((_, _) => 0xffffff))
    // pure black BMP: every cell exactly 0.0 (and a second container format)
    put("black.bmp", image("bmp", 20, 10)((_, _) => 0x000000))
    // horizontal ramp: grid columns see increasing mean intensity
    put("ramp.png", image("png", 64, 64)((x, _) => {
      val v = x * 255 / 63; (v << 16) | (v << 8) | v
    }))
    // MJPEG AVI, 16 constant-gray frames ramping black → white: the
    // temporal luminance envelope must ramp ~i/15 (constant-color JPEG
    // frames decode near-losslessly: DC-only blocks), frame count and
    // duration are analytic (16 frames @ 8 fps = 2000 ms)
    put("ramp16.avi", mjpegAvi(32, 24, 8, (0 until 16).map { i =>
      val v = i * 255 / 15
      jpegFrame(32, 24)((_, _) => (v << 16) | (v << 8) | v)
    }))
  }

  /** Minimal WARC fixture (fixtures/web/sample.warc): three records —
    * two responses carrying HTML payloads whose extracted text is known
    * literally (the q150 oracle states it as VALUES), one request record
    * the gate must filter out.
    */
  def writeWarcFixture(dir: String): Unit = {
    val d = new File(dir)
    d.mkdirs()
    def record(typ: String, uri: String, payload: String): Array[Byte] = {
      val p = payload.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("UTF-8") ++ p ++
        "\r\n\r\n".getBytes("UTF-8")
    }
    val warc =
      record("response", "http://a.example/x",
        "<html><head><script>var a=1;</script></head>" +
          "<body><h1>Alpha</h1><p>hello warc one</p></body></html>") ++
      record("request", "http://a.example/x", "GET /x HTTP/1.1") ++
      record("response", "http://b.example/y?z=1",
        "<html><body><p>beta and gamma</p><footer>f</footer></body></html>")
    Files.write(new File(d, "sample.warc").toPath, warc)
  }

  def main(args: Array[String]): Unit = {
    val fixDir = if (args.nonEmpty) args(0) else "fixtures/multimodal"
    val outParquet = if (args.length > 1) args(1) else "fixtures/multimodal_expected.parquet"
    writeFixtures(fixDir)
    writeWarcFixture("fixtures/web")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-fixture-gen")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      Multimodal.decodeDirTable(spark, new File(fixDir).getAbsolutePath)
        .coalesce(1).write.mode("overwrite").parquet(outParquet)
      Multimodal.resizeDirTable(spark, new File(fixDir).getAbsolutePath, 4, 4)
        .coalesce(1).write.mode("overwrite")
        .parquet("fixtures/multimodal_resize_expected.parquet")
      Multimodal.videoFrameLuminanceTable(spark, new File(fixDir).getAbsolutePath, 4)
        .coalesce(1).write.mode("overwrite")
        .parquet("fixtures/multimodal_frames_expected.parquet")
    } finally spark.stop()
  }
}
