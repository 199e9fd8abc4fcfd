package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming twins of the document-curation operators: the per-row text
  * stages (quality scoring, run scrubbing, token counting, fingerprinting)
  * are stateless codegen'd expressions, so they run unchanged on a
  * `readStream` frame; the only stateful stage — dedup — becomes a
  * watermarked `dropDuplicates`, with state bounded to fingerprints inside
  * the watermark window instead of the whole corpus.
  */
object DocStreams {

  /** Streaming curation: quality filter → run scrub → token count →
    * fingerprint dedup. On a stream, "first arrival wins" within the
    * watermark window (the streaming-natural keep rule — a stream has an
    * arrival order where a batch has none); for deterministic batch
    * dedup semantics use the batch pipeline (min-id keeper, q91).
    * Returns (doc_id, ts?, cleaned, n_tokens, fp).
    *
    * State is genuinely watermark-bounded: `dropDuplicatesWithinWatermark`
    * evicts a fingerprint once the watermark passes it. A plain
    * `dropDuplicates(fp)` under a watermark would NOT evict (Spark only
    * purges dedup state when the event-time column is part of the key),
    * so its state grows with every fingerprint ever seen.
    */
  def curateStream(docs: DataFrame, minQuality: Double,
      tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame = {
    val scored = docs
      .filter(TextFunctions.qualityScore(col("text")) >= minQuality)
      .withColumn("cleaned", TextFunctions.scrubTokenRuns(col("text")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("cleaned")).cast("long"))
      .withColumn("fp", TextFunctions.fingerprint(col("cleaned")))
      .drop("text")
    if (docs.isStreaming)
      scored.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("fp")
    else scored.dropDuplicates("fp")
  }

  /** Streaming NEAR-duplicate suppression — the fuzzy step past
    * [[curateStream]]'s exact-fingerprint dedup: documents whose `bits`-bit
    * SimHash signatures COLLIDE within the watermark window are suppressed
    * after the first arrival. SimHash puts token-overlapping documents in
    * the same signature with high probability (the [[graft.operators.Dedup
    * .simHashNearDup]] exact-collision group, here used as the state key),
    * so boilerplate re-crawls and lightly-edited mirrors are caught that a
    * content hash misses — at the price SimHash always charges (rare
    * false merges at small `bits`; size `bits` to the corpus).
    *
    * The signature is a stateless codegen'd per-row column
    * ([[graft.operators.Dedup.simHashCol]]), so the only stateful stage is
    * the signature-keyed `dropDuplicatesWithinWatermark` — state holds one
    * entry per DISTINCT signature inside the window (≤ 2^bits no matter
    * the corpus), evicted as the watermark passes. On a batch frame the
    * same pipeline degrades to `dropDuplicates(simhash)` — first-arrival
    * order is a stream-only notion; batch callers wanting a deterministic
    * keeper should group on the signature and pick min-id (the q91 rule).
    */
  def simhashDedupStream(docs: DataFrame, textCol: String = "text",
      bits: Int = 16, tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame = {
    val sig = docs.withColumn("simhash",
      graft.operators.Dedup.simHashCol(col(textCol), bits))
    if (docs.isStreaming)
      sig.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("simhash")
    else sig.dropDuplicates("simhash")
  }

  /** Rolling-crawl ingest — the architecture the store/incremental layers
    * exist for, wired to a stream: every micro-batch is near-dup-deduped
    * against the PERSISTED signature store
    * ([[graft.operators.Dedup.incrementalMinHashDedupFromStore]] — the
    * corpus is never re-read, never re-shingled), surviving documents are
    * appended to `outPath`, and their signatures are appended to the
    * store so every LATER batch — and every later RESTART — dedups
    * against everything ingested so far. This is state no streaming
    * operator can hold: `dropDuplicatesWithinWatermark` is watermark-
    * bounded and `mapGroupsWithState` dies with the checkpoint, while a
    * crawl's dedup memory is corpus-lifetime and must survive job
    * restarts; `foreachBatch` + the parquet store is the Spark-native
    * shape for that (the store validates its hashing scheme on every
    * probe, so a restart with drifted settings fails loudly).
    *
    * Per cycle at 100 TB: O(|batch| shingles + |store| ids) — one band
    * join per batch against stored (doc_id, tids), no text ever shuffled
    * from the store side.
    *
    * Delivery: `foreachBatch` is at-least-once. The append ORDER (output,
    * then store) makes the two failure windows behave differently: a
    * crash before the store append replays the identical survivor set —
    * DUPLICATE rows in `outPath`, store correct; a crash after it replays
    * against a store already holding the batch's own signatures, so every
    * doc self-near-dups out and the replay appends nothing — output keeps
    * the first attempt's rows, both sides correct. Future-batch dedup is
    * right in every case (duplicate store rows only duplicate band
    * candidates, which `distinct` collapses). Exactly-once OUTPUT needs an
    * idempotent sink (per-batch subdirectories keyed on `batchId`, or a
    * transactional table format) — documented rather than faked.
    *
    * @return the started query; callers own awaitTermination/stop
    */
  def ingestDedupStream(docs: DataFrame, storePath: String, outPath: String,
      checkpointPath: String, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id",
      shingle: Int = 3, portableIds: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // the batch feeds three plans (dedup, emit, re-sign) — pin it
        val pinned = batch.localCheckpoint(true)
        // an absent store (first batch ever) is an EMPTY store with the
        // batch-derived schema — limit(0) through signatureStore gives
        // exactly the columns a written store would have
        val store = scala.util.Try(spark.read.parquet(storePath))
          .getOrElse(Dedup.signatureStore(pinned.limit(0), textCol, idCol,
            shingle, portableIds))
        val survivors = Dedup.incrementalMinHashDedupFromStore(
          pinned, store, textCol, idCol, threshold,
          shingle = shingle, portableIds = portableIds)
        val kept = pinned.join(survivors,
            pinned(idCol) === survivors("doc_id"), "left_semi")
          .localCheckpoint(true)
        kept.write.mode("append").parquet(outPath)
        Dedup.signatureStore(kept, textCol, idCol, shingle, portableIds)
          .write.mode("append").parquet(storePath)
        org.apache.spark.sql.GraftSqlBridge.releaseCheckpoint(kept)
        org.apache.spark.sql.GraftSqlBridge.releaseCheckpoint(pinned)
        ()
      }
      .start()
  }
}
