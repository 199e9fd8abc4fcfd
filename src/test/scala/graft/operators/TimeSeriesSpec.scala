package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val events = Seq(
    // user 1: 10:00, 10:30, 11:00 (exactly 1h after the first), 12:30
    (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 1L, ts("2024-01-01 10:30:00"), 2.0),
    (3L, 1L, ts("2024-01-01 11:00:00"), 4.0),
    (4L, 1L, ts("2024-01-01 12:30:00"), 8.0),
    // user 2: two events tied on the same timestamp (RANGE peers)
    (5L, 2L, ts("2024-01-01 09:00:00"), 1.0),
    (6L, 2L, ts("2024-01-01 09:00:00"), 2.0))
    .toDF("event_id", "user_id", "ts", "value")

  test("rollingRange: trailing interval frame is inclusive and peers share a frame") {
    val r = TimeSeries.rollingRange(
        events.withColumn("v", col("value").cast("long")),
        "user_id", "ts", "1 HOUR",
        Seq("n" -> "count(*)", "s" -> "sum(v)"))
      .select("event_id", "n", "s").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) === ((1L, 1L)))
    assert(r(2L) === ((2L, 3L)))
    // the 1-hour bound is INCLUSIVE: event 3 at 11:00 still sees 10:00
    assert(r(3L) === ((3L, 7L)))
    // 12:30 sees nothing within the trailing hour but itself
    assert(r(4L) === ((1L, 8L)))
    // equal timestamps are RANGE peers: both rows see both values
    assert(r(5L) === ((2L, 3L)) && r(6L) === ((2L, 3L)))
  }

  test("gapFillLocf: empty buckets carry the latest prior in-bucket value") {
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:15:00"), 5.0),
      (2L, 7L, ts("2024-01-01 10:45:00"), 6.0), // later in same bucket wins
      (3L, 7L, ts("2024-01-01 13:10:00"), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = TimeSeries.gapFillLocf(df, "user_id", "ts", col("value"), "event_id")
      .select("bucket", "v_locf").as[(Timestamp, Double)].collect().toMap
    assert(r.size === 4) // 10:00 .. 13:00 inclusive
    assert(r(ts("2024-01-01 10:00:00")) === 6.0)
    assert(r(ts("2024-01-01 11:00:00")) === 6.0) // gap carried
    assert(r(ts("2024-01-01 12:00:00")) === 6.0) // gap carried
    assert(r(ts("2024-01-01 13:00:00")) === 9.0)
  }

  test("gapFillLocf: equal-timestamp tie resolved by the tie column") {
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 7L, ts("2024-01-01 10:00:00"), 2.0)) // higher event_id wins
      .toDF("event_id", "user_id", "ts", "value")
    val r = TimeSeries.gapFillLocf(df, "user_id", "ts", col("value"), "event_id")
      .select("v_locf").as[Double].collect()
    assert(r.toSeq === Seq(2.0))
  }

  test("gapFillLocf: grid is per key — a key's buckets span only its own events") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:30:00"), 1.0),
      (2L, 1L, ts("2024-01-01 05:30:00"), 2.0),
      (3L, 2L, ts("2024-01-01 03:30:00"), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = TimeSeries.gapFillLocf(df, "user_id", "ts", col("value"), "event_id")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(r(1L) === 6L) // 00:00..05:00
    assert(r(2L) === 1L) // 03:00 only
  }
}
