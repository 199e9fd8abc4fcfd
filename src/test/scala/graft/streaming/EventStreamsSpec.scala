package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("sessionize splits on gap and is 1-based per user") {
    val df = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(10)), (3L, 100L, ts(50)),  // gap 40min -> new session
      (4L, 200L, ts(0)))
      .toDF("event_id", "user_id", "ts")
    val r = EventStreams.sessionize(df, gapSeconds = 1800)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("streaming windowedAgg equals batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("evt").toString
    val df = Seq(
      (1L, ts(1), "click", 1.0), (2L, ts(2), "click", 2.0), (3L, ts(61), "view", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
    df.write.mode("overwrite").parquet(dir)
    val batch = EventStreams.windowedAgg(spark.read.parquet(dir), "1 hour")

    val stream = EventStreams.readEventStream(spark, spark.read.parquet(dir).schema, dir)
    assert(stream.isStreaming)
    val q = EventStreams.windowedAgg(stream, "1 hour", watermark = Some("10 minutes"))
      .writeStream.outputMode("complete").format("memory").queryName("win_spec").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_spec")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() === 2)
  }
}
