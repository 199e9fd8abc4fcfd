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
}
