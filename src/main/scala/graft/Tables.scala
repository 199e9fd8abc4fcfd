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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read natively;
    * sessions set spark.sql.legacy.parquet.nanosAsLong=true and this converts
    * the nano longs to TimestampType. Lossless here: the generator emits
    * microsecond-aligned values (verified: epoch_ns % 1000 == 0 for all rows).
    */
  def events: DataFrame = {
    val raw = table("events")
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
  }

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
