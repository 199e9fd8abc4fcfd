package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reconstruction operators over event tables: trailing
  * event-time RANGE-frame aggregates and gap-filled
  * last-observation-carried-forward (LOCF) grids — the resampling stage a
  * telemetry/metrics pipeline runs before aligning events onto a uniform
  * training timeline (feature snapshots, rate limiting, drift monitors).
  *
  * Scale shapes: both operators shuffle ONCE on the partition key and sort
  * within partitions (Spark's standard window exchange, skew bounded by the
  * hottest key); the LOCF grid is |keys| × |buckets in span| rows —
  * independent of event count — and there is no global single-task window
  * anywhere.
  */
object TimeSeries {

  /** Append trailing event-time RANGE-frame aggregates: for every input row,
    * each `alias -> aggregateSql` pair is evaluated over the partition's rows
    * with `timeCol` in `[row.time - window, row.time]` (RANGE frame — rows
    * tied on `timeCol` are peers and always share a frame, the SQL-standard
    * rule on Spark and DuckDB alike).
    *
    * The frame is expressed in SQL text because the DataFrame
    * `Window.rangeBetween` API takes numeric offsets only; an interval bound
    * on a real timestamp ordering keeps microsecond semantics instead of
    * truncating to epoch seconds. Catalyst plans the same WindowExec either
    * way: one hash exchange on `partCol` + an in-partition sort.
    *
    * `window` is a SQL interval body, e.g. `"1 HOUR"`.
    */
  def rollingRange(df: DataFrame, partCol: String, timeCol: String,
      window: String, aggs: Seq[(String, String)]): DataFrame = {
    val over = s"OVER (PARTITION BY $partCol ORDER BY $timeCol " +
      s"RANGE BETWEEN INTERVAL $window PRECEDING AND CURRENT ROW)"
    aggs.foldLeft(df) { case (acc, (alias, aggSql)) =>
      acc.withColumn(alias, expr(s"$aggSql $over"))
    }
  }

  /** Uniform `unit`-grid per key from each key's first to last observed
    * bucket, with the latest in-bucket value carried forward across empty
    * buckets (LOCF). Buckets before a key's first observation do not exist
    * by construction, so the carried value is never null.
    *
    * Determinism: "latest in bucket" is the max (`timeCol`, `tieCol`) row —
    * the tie column makes equal-timestamp observations pick one winner on
    * every engine. `valueCol` is a Column so callers can normalize (e.g.
    * round) before the carry.
    *
    * Three window passes, all partitioned by `partCol` (+bucket): no
    * all-pairs joins, no driver materialization; the grid explode is a
    * per-key `sequence` bounded by the key's own time span.
    */
  def gapFillLocf(df: DataFrame, partCol: String, timeCol: String,
      valueCol: Column, tieCol: String, unit: String = "hour"): DataFrame = {
    val step = s"INTERVAL 1 ${unit.toUpperCase(java.util.Locale.ROOT)}"
    val bounds = df.groupBy(partCol).agg(
      date_trunc(unit, min(timeCol)).as("b0"),
      date_trunc(unit, max(timeCol)).as("b1"))
    val grid = bounds.select(col(partCol),
      explode(expr(s"sequence(b0, b1, $step)")).as("bucket"))
    val pick = Window.partitionBy(col(partCol), col("bucket"))
      .orderBy(col(timeCol).desc, col(tieCol).desc)
    val lastInBucket = df
      .select(col(partCol), date_trunc(unit, col(timeCol)).as("bucket"),
        valueCol.as("v_bucket"), col(timeCol), col(tieCol))
      .withColumn("rn", row_number().over(pick))
      .where(col("rn") === 1)
      .select(col(partCol), col("bucket"), col("v_bucket"))
    val carry = Window.partitionBy(partCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastInBucket, Seq(partCol, "bucket"), "left")
      .withColumn("v_locf", last("v_bucket", ignoreNulls = true).over(carry))
      .select(col(partCol), col("bucket"), col("v_locf"))
  }
}
