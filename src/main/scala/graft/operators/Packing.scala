package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign each document to a
  * fixed-token-budget shard, in deterministic key order, so a downstream
  * trainer can stream shard files of ~`budget` tokens each.
  *
  * Semantics (engine-portable, verified against a DuckDB window oracle):
  * order docs by `idCol`, take the running token total, and place each doc in
  * `shard = floor((cum − n_tokens) / budget)` — the shard containing the
  * doc's first token.
  *
  * Scale design: the textbook formulation is a global-`ORDER BY` window
  * running sum, which Spark executes as a SINGLE task (every row through one
  * window partition) — a non-starter at 100 TB. [[packShards]] instead runs
  * the classic two-phase distributed prefix sum:
  *
  *   1. range-partition by id (ascending ranges land on ascending partition
  *      ids) and sort within partitions — a total order, but parallel;
  *   2. per-partition running sums via a window PARTITIONED by partition id
  *      (parallel across the 32/1000s of partitions);
  *   3. one tiny per-partition-totals table (rows = #partitions) turned into
  *      exclusive offsets on the driver-sized side and broadcast back.
  *
  * Only (id, n_tokens) flows through the prefix-sum shuffles — the text
  * column never moves. Wall-clock is O(N/P) per task instead of O(N) on one.
  */
object Packing {

  /** (doc_id, n_tokens, shard) for every row of `df`, where `tokenExpr` is
    * evaluated per row (e.g. `TextFunctions.tokenCount(col("text"))`).
    *
    * @param partitions prefix-sum parallelism; defaults to
    *   spark.sql.shuffle.partitions. Correctness never depends on it.
    */
  def packShards(df: DataFrame, idCol: String,
      tokenExpr: org.apache.spark.sql.Column, budget: Long,
      partitions: Int = 0): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    // The localCheckpoint pins ONE materialization of the range shuffle:
    // `local` feeds both the offsets aggregate and the final join, and
    // repartitionByRange samples its bounds per execution — if exchange
    // reuse ever failed to dedup the two branches, boundary rows could land
    // in different pids per branch and pair with the wrong offset. The
    // checkpointed frame (ids + three longs, no text) makes the pid
    // assignment a fact rather than a plan.
    val local = prefixSummed(df, idCol, tokenExpr, partitions).localCheckpoint(true)

    // phase 3: exclusive prefix offsets over the tiny (p rows) totals table.
    // The global-order window here is fine: it sees #partitions rows, not N.
    val offsets = local.groupBy("pid").agg(sum("n_tokens").as("part_total"))
      .withColumn("offset",
        coalesce(sum("part_total").over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")

    local.join(broadcast(offsets), "pid")
      .select(col("doc_id"), col("n_tokens"),
        floor((col("local_cum") + col("offset") - col("n_tokens"))
          .cast("double") / budget.toDouble).cast("long").as("shard"))
  }

  /** Phases 1–2 as a lazy plan: range partition by id, per-partition
    * running sums with a pid-keyed window. Exposed so the plan-shape spec
    * can assert the scale properties (RangePartitioning, parallel windows)
    * that [[packShards]] hides behind its pinning checkpoint.
    */
  private[graft] def prefixSummed(df: DataFrame, idCol: String,
      tokenExpr: org.apache.spark.sql.Column, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    df.select(col(idCol).as("doc_id"), tokenExpr.cast("long").as("n_tokens"))
      .repartitionByRange(p, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("pid", spark_partition_id())
      // per-partition running sums: the window is keyed by pid, so every
      // partition's scan runs in parallel (no global-order single task)
      .withColumn("local_cum",
        sum("n_tokens").over(Window.partitionBy("pid").orderBy("doc_id")))
  }

  /** Overlapping token-window chunking (RAG / long-document training prep):
    * split each document's token sequence into windows of `window` tokens
    * advancing by `stride` (< window ⇒ overlap), emitting
    * (doc_id, chunk_idx, tok_start, tok_len) with `tok_start` 1-based.
    *
    * Chunks start at 1, 1+stride, 1+2·stride, …, stopping after the first
    * window that reaches the end of the document (the HuggingFace
    * `return_overflowing_tokens` rule): `n_chunks = 1 + ⌈max(0, n−window) /
    * stride⌉`. The last chunk is truncated to the remaining tokens, so every
    * token belongs to ≥1 chunk, no chunk is fully contained in its
    * predecessor, and a doc shorter than `window` still yields one chunk.
    * Docs with zero tokens yield none.
    *
    * Scale: zero shuffles — `sequence` + `explode` inside whole-stage
    * codegen, each input row expanding to its own chunk rows in place. Row
    * growth is a factor of ~window/stride over the token count, independent
    * of corpus size, and the text column itself is never duplicated (chunks
    * are (start, len) spans; a consumer slices lazily).
    */
  def chunkWindows(df: DataFrame, idCol: String,
      tokenCountExpr: org.apache.spark.sql.Column, window: Int,
      stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val lastStart = lit(1L) +
      ceil(greatest(col("n_tokens") - window.toLong, lit(0L)).cast("double")
        / stride.toDouble).cast("long") * stride.toLong
    df.select(col(idCol).as("doc_id"), tokenCountExpr.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        posexplode(sequence(lit(1L), lastStart, lit(stride.toLong)))
          .as(Seq("chunk_idx", "tok_start")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("tok_start"),
        least(lit(window.toLong), col("n_tokens") - col("tok_start") + 1L).as("tok_len"))
  }

  /** Length-bucketed batch assignment (padding-efficiency prep): bucket
    * documents by token-length band (`bucket = (n_tokens − 1) / bucketSize`),
    * then number each bucket's docs in id order and cut them into batches of
    * `batchSize` — so every training batch holds similar-length sequences
    * and pad-token waste is bounded by `bucketSize`, the standard
    * bucketed-batching move.
    *
    * Output: (doc_id, n_tokens, bucket, batch_idx); semantics ≡ row_number
    * OVER (PARTITION BY bucket ORDER BY doc_id), `batch_idx = (rank−1) /
    * batchSize` — which is what the DuckDB oracle computes.
    *
    * Scale: a per-bucket rank via a plain bucket-partitioned window
    * serializes EACH bucket into one task (a handful of length bands over a
    * 100 TB corpus = a handful of tasks). Instead this runs the same
    * two-phase distributed prefix shape as [[packShards]], generalized to
    * groups: range-partition by (bucket, id) — so a bucket spans many
    * ordered partitions — take per-(bucket, pid) local row numbers in
    * parallel, and add broadcast exclusive offsets computed on the tiny
    * (bucket, pid)-counts table. Only (id, n_tokens) ever moves.
    */
  def lengthBucketBatches(df: DataFrame, idCol: String,
      tokenExpr: org.apache.spark.sql.Column, bucketSize: Int,
      batchSize: Int, partitions: Int = 0): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val rows = df
      .select(col(idCol).as("doc_id"), tokenExpr.cast("long").as("n_tokens"))
      .withColumn("bucket", floor((col("n_tokens") - 1).cast("double") / bucketSize).cast("long"))
    groupedRowNumbers(rows, Seq("bucket"), Seq("doc_id"), partitions)
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        floor((col("rank") - 1).cast("double") / batchSize)
          .cast("long").as("batch_idx"))
  }

  /** Distributed row_number: `rank` = row_number OVER (PARTITION BY
    * `grpCols` ORDER BY `ordCols`) computed with the grouped two-phase
    * prefix (one range exchange on grp+ord, per-(grp, pid) windows in
    * parallel, broadcast exclusive per-slice offsets) — a group never
    * serializes into one task. Every input column rides through.
    *
    * Shared machinery of [[lengthBucketBatches]], [[groupRunningTotals]]'
    * rank twin, and `Sampling.stratifiedSplit`. The pin (localCheckpoint)
    * makes the pid assignment one fact shared by the offsets aggregate and
    * the final join.
    */
  private[operators] def groupedRowNumbers(rows: DataFrame,
      grpCols: Seq[String], ordCols: Seq[String], partitions: Int): DataFrame = {
    val spark = rows.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val rangeCols = (grpCols ++ ordCols).map(col)
    val local = rows
      .repartitionByRange(p, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(
        Window.partitionBy((grpCols :+ "__pid").map(col): _*)
          .orderBy(ordCols.map(col): _*)))
      .localCheckpoint(true)

    // tiny table: one row per (grp, pid) slice; exclusive running count
    // within the group across ascending pids (ranges are ordered, so pid
    // order IS (grp, ord) order)
    val offsets = local
      .groupBy((grpCols :+ "__pid").map(col): _*).agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum("__c").over(Window.partitionBy(grpCols.map(col): _*)
          .orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((grpCols :+ "__pid").map(col) :+ col("__off"): _*)

    // null-SAFE reattach: a plain equi-join would silently drop rows whose
    // group value is NULL (NULL != NULL), while the contract — and the
    // PARTITION BY twin the oracles replay — keeps a NULL partition
    val offT = grpCols.foldLeft(offsets.withColumnRenamed("__pid", "__opid")) {
      (d, c) => d.withColumnRenamed(c, s"__g_$c")
    }
    val cond = (grpCols.map(c => col(c) <=> col(s"__g_$c")) :+
      (col("__pid") === col("__opid"))).reduce(_ && _)
    local.join(broadcast(offT), cond)
      .withColumn("rank", col("__lrn") + col("__off"))
      .drop(grpCols.map(c => s"__g_$c") :+ "__opid" :+ "__off" :+ "__pid" :+ "__lrn": _*)
  }

  /** Per-group running totals, distributed: (doc_id, group, value, cum)
    * where `cum` is the inclusive running sum of `valueExpr` within each
    * group in id order — semantics ≡ `sum(value) OVER (PARTITION BY group
    * ORDER BY id)`, computed with the grouped two-phase prefix sum (range
    * partition on (group, id) → per-(group, pid) windows → broadcast
    * exclusive offsets) so no group ever serializes into one task.
    *
    * The building block behind token-budget quotas ([[tokenQuota]]) and any
    * "cumulative X within domain" curation rule.
    */
  def groupRunningTotals(df: DataFrame, groupCol: String, idCol: String,
      valueExpr: org.apache.spark.sql.Column, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val local = df
      .select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        valueExpr.cast("long").as("value"))
      .repartitionByRange(p, col("grp"), col("doc_id"))
      .sortWithinPartitions("grp", "doc_id")
      .withColumn("pid", spark_partition_id())
      .withColumn("local_cum",
        sum("value").over(Window.partitionBy("grp", "pid").orderBy("doc_id")))
      .localCheckpoint(true)

    val offsets = local.groupBy("grp", "pid").agg(sum("value").as("c"))
      .withColumn("offset",
        coalesce(sum("c").over(Window.partitionBy("grp").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("grp").as("ogrp"), col("pid").as("opid"), col("offset"))

    // null-safe on grp: a NULL group is a real partition (the PARTITION BY
    // twin keeps it); a plain equi-join would silently drop its rows
    local.join(broadcast(offsets),
        col("grp") <=> col("ogrp") && col("pid") === col("opid"))
      .select(col("doc_id"), col("grp").as(groupCol), col("value"),
        (col("local_cum") + col("offset")).as("cum"))
  }

  /** Exact per-group TOKEN budget: keep each group's docs (in id order)
    * while the cumulative token count stays within `budget` — the "at most
    * N tokens per domain" mixing rule, a token-weighted sharpening of the
    * per-doc-count quota. A doc is kept iff its inclusive running total fits
    * the budget entirely (docs larger than the budget are dropped even when
    * first).
    */
  def tokenQuota(df: DataFrame, groupCol: String, idCol: String,
      tokenExpr: org.apache.spark.sql.Column, budget: Long,
      partitions: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    groupRunningTotals(df, groupCol, idCol, tokenExpr, partitions)
      .filter(col("cum") <= budget)
      .select(col("doc_id"), col(groupCol), col("value").as("n_tokens"), col("cum"))
  }

  /** Reference formulation (single-task global window) — used by the spec as
    * the differential twin of [[packShards]]. Do NOT use at scale.
    */
  def packShardsNaive(df: DataFrame, idCol: String,
      tokenExpr: org.apache.spark.sql.Column, budget: Long): DataFrame = {
    val cum = sum("n_tokens").over(Window.orderBy("doc_id"))
    df.select(col(idCol).as("doc_id"), tokenExpr.cast("long").as("n_tokens"))
      .withColumn("shard",
        floor((cum - col("n_tokens")).cast("double") / budget.toDouble).cast("long"))
  }
}
