package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Scale notes: `spark.read.parquet` gives Catalyst a relation with file
  * statistics, so filter/column pushdown reaches the scan. At 100 TB the same
  * call works on a directory of thousands of files; nothing here assumes a
  * single file.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped in two parquet encodings across driver testdata
    * generations: TIMESTAMP(NANOS) — which Spark cannot read natively, so
    * sessions set spark.sql.legacy.parquet.nanosAsLong=true and it arrives as
    * LongType — and native timestamp[us]/[ns] TimestampType. Branch on the
    * observed dtype so either generation loads; both paths yield the same
    * microsecond TimestampType values (the generator emits micro-aligned
    * nanos: epoch_ns % 1000 == 0 for all rows, and the r6-green hash baseline
    * matches the r8 native-timestamp reads).
    */
  def events: DataFrame = Tables.adaptEventTs(table("events"))

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** Normalize the `ts` column to TimestampType whichever of the known
    * parquet encodings the driver's generator emitted (see [[Tables.events]]
    * doc above). Works on batch and streaming frames alike — the branch is
    * on the SCHEMA, the conversion itself is a per-row expression.
    */
  def adaptEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet dtype $other — expected nanos-as-long or timestamp")
    }
  }
}
