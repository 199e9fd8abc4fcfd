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

  test("sampleFrames slices binary at fixed stride without UDFs") {
    val df = spark.createDataset(Seq(media(7, "video", 300))).toDF()
    val frames = sampleFrames(df, "content", "id", frameBytes = 100, everyNth = 2)
      .orderBy("sample_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length === 100))
  }

  test("resizeMeta caps dimensions, preserves struct shape") {
    val ds = spark.createDataset(Seq(media(9, "image", 64)))
    val decoded = decode(ds)
    val capped = resizeMeta(decoded, maxDim = 32)
    val m = capped.select("meta.width", "meta.height", "meta.sizeBytes").collect().head
    assert(m.getInt(0) <= 32 && m.getInt(1) <= 32 && m.getLong(2) === 64L)
  }
}
