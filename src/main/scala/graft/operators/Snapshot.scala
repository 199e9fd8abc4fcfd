package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the crawl-over-crawl bookkeeping step: which
  * documents appeared, vanished, or changed between two versions of a
  * corpus. Incremental pipelines (dedup stores, contamination re-checks,
  * datasheet updates) run on exactly this delta instead of the full new
  * snapshot.
  *
  * Scale shape: one full-outer join on the id and an md5 compare of the
  * text columns — content never shuffles beyond its 32-char hash if the
  * caller pre-hashes; statuses are pure row-local expressions. At 100 TB
  * both sides are id-partitioned parquet, so the join co-locates on the
  * existing layout.
  */
object Snapshot {

  /** Per-id verdict between two corpus versions:
    * `added` (only in `newDf`), `removed` (only in `oldDf`), `changed`
    * (both, text hash differs), `same`. Returns (id, status) with `id`
    * named after `idCol`.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"), md5(col(textCol)).as("__oh"))
    val n = newDf.select(col(idCol).as("__id"), md5(col(textCol)).as("__nh"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed")
          .otherwise("same").as("status"))
  }
}
