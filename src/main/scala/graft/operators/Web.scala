package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation primitives: URL decomposition and domain-level
  * filtering — the stage between a crawl manifest and the text pipeline
  * (robots/blocklist enforcement, per-domain caps, domain datasheets).
  *
  * All pure native expressions (`parse_url` is codegen'd); filtering and
  * stats shuffle only on the host/domain key, so a 100 TB crawl manifest
  * flows through without touching document payloads.
  */
object Web {

  /** host / path / query decomposition via Spark's native `parse_url`,
    * plus the registrable-domain approximation `domain` (last two host
    * labels — the common heuristic short of shipping the public-suffix
    * list; swap in a PSL lookup table via a broadcast join when exactness
    * matters).
    */
  def urlParts(df: DataFrame, urlCol: String): DataFrame = {
    val host = parse_url(col(urlCol), lit("HOST"))
    df.withColumn("host", host)
      .withColumn("path", parse_url(col(urlCol), lit("PATH")))
      .withColumn("query", parse_url(col(urlCol), lit("QUERY")))
      .withColumn("domain", regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }

  /** TRUE when `host` equals a blocked suffix or ends with ".suffix" —
    * the standard blocklist semantics (blocking "example.com" blocks
    * "www.example.com" but NOT "notexample.com"). The list is inlined
    * into the plan (blocklists are small); a million-entry list would
    * become a broadcast join on `domain` instead.
    */
  def hostBlocked(host: Column, blockedSuffixes: Seq[String]): Column =
    blockedSuffixes
      .map(s => host === s || host.endsWith("." + s))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Per-domain crawl datasheet: document count and share of the corpus —
    * the input to per-domain caps and head-domain inspection. One grouped
    * pass; the corpus total rides a one-row broadcast.
    */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val parts = urlParts(df, urlCol)
    val counts = parts.groupBy("domain").agg(count(lit(1)).as("n_docs"))
    counts.crossJoin(broadcast(counts.agg(sum("n_docs").as("__total"))))
      .select(col("domain"), col("n_docs"),
        round(col("n_docs").cast("double") / col("__total"), 6).as("share"))
  }

  /** HTML → text extraction (the crawl-to-corpus boilerplate stage, regex
    * tier): drop `<script>`/`<style>` elements INCLUDING their contents,
    * strip every remaining tag, collapse whitespace runs, trim. The regex
    * tier handles the crawl formats a training pipeline bulk-processes; a
    * DOM-fidelity extractor (trafilatura-class) plugs in at the same
    * column seam when structure-aware extraction matters.
    *
    * Pure per-row codegen'd `regexp_replace` chain — zero shuffle. The
    * patterns stay inside the Java-regex ∩ RE2 common subset (non-greedy
    * block match, char-class tag match) so an external engine replays them
    * byte-for-byte.
    */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    trim(regexp_replace(noTags, "\\s+", " "))
  }
}
