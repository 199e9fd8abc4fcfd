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
  }

  def main(args: Array[String]): Unit = {
    val fixDir = if (args.nonEmpty) args(0) else "fixtures/multimodal"
    val outParquet = if (args.length > 1) args(1) else "fixtures/multimodal_expected.parquet"
    writeFixtures(fixDir)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-fixture-gen")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try Multimodal.decodeDirTable(spark, new File(fixDir).getAbsolutePath)
      .coalesce(1).write.mode("overwrite").parquet(outParquet)
    finally spark.stop()
  }
}
