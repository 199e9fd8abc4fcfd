package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Assignment is a pure function of the row's KEY (md5 prefix bucketing),
  * not of RNG state or partitioning — so splits are stable across runs,
  * engines, repartitioning, and cluster sizes, and a document keeps its
  * split when the corpus is re-processed (the property `df.sample` and
  * `rand()` cannot give). Everything is codegen'd expressions, zero
  * shuffle, and reproducible in any engine with md5 (the DuckDB oracle
  * checks the exact assignment).
  */
object Sampling {

  /** Bucket 0..255 from the first two hex chars of md5(key). */
  private def bucket(keyCol: String) =
    substring(md5(col(keyCol).cast("string")), 1, 2)

  /** Label each row "train" or "holdout": `trainBuckets` of the 256 md5
    * buckets (e.g. 205 ≈ 80%) go to train.
    */
  def hashSplit(df: DataFrame, keyCol: String, trainBuckets: Int,
      splitCol: String = "split"): DataFrame = {
    require(trainBuckets >= 0 && trainBuckets <= 256,
      s"trainBuckets must be in [0, 256], got $trainBuckets")
    val threshold = f"${trainBuckets - 1}%02x"
    df.withColumn(splitCol,
      when(lit(trainBuckets) > 0 && bucket(keyCol) <= lit(threshold), "train")
        .otherwise("holdout"))
  }

  /** Keep `buckets`/256 of the rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String, buckets: Int): DataFrame = {
    require(buckets >= 0 && buckets <= 256,
      s"buckets must be in [0, 256], got $buckets")
    if (buckets == 0) df.filter(lit(false))
    else df.filter(bucket(keyCol) <= lit(f"${buckets - 1}%02x"))
  }
}
