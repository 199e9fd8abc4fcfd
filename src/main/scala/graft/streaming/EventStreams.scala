package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Structured-Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props). The reference has no
  * streaming at all (SURVEY §1.1) — this is the beyond-parity layer a
  * training-data pipeline needs. Batch twins of each transform are exposed so
  * the correctness gate (DuckDB) can check the exact same logic the streaming
  * query runs.
  */
object EventStreams {

  /** Streaming reader over a parquet directory with the events schema. */
  def readEventStream(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling-window counts + sums per event_type. Works identically on a
    * batch or streaming DataFrame; in streaming, pair with
    * `withWatermark("ts", ...)` (applied only when the source is streaming).
    */
  def windowedAgg(events: DataFrame, windowLength: String, watermark: Option[String] = None): DataFrame = {
    val src = watermark.filter(_ => events.isStreaming) match {
      case Some(w) => events.withWatermark("ts", w)
      case None    => events
    }
    src.groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total"))
  }

  /** Gap-based sessionization (batch form): a new session starts when the gap
    * since the user's previous event exceeds `gapSeconds`. Returns the input
    * plus `session_idx` (1-based per user). One shuffle on user_id; the
    * window sort key (ts, event_id) is unique so results are deterministic.
    *
    * The streaming twin of this is mapGroupsWithState with a session timeout;
    * the batch form is what the oracle can check.
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("__new").over(run))
      .drop("__prev", "__new")
  }
}
