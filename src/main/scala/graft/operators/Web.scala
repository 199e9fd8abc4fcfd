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

  /** Canonical crawl URL — the normalization that makes URL-level dedup
    * meaningful (the same page arrives as http/HTTPS, with/without www,
    * default ports, trailing slashes, fragments, and tracking params):
    *   1. fragment dropped; 2. scheme+host lowercased; 3. `www.` and
    *   default ports (:80/:443) stripped; 4. single trailing path slash
    *   stripped; 5. query params split, tracking params (utm_*, ref,
    *   fbclid, gclid) removed, the rest SORTED and rejoined (param order
    *   never distinguishes pages).
    *
    * Pure codegen'd string expressions, zero shuffle — and every step is
    * replayable in the DuckDB oracle verbatim (literal `starts_with`, not
    * LIKE, because LIKE's `_` is a wildcard and `utm_%` would also match
    * `utmx=`). Canonicalization is deliberately lossy ONLY in the
    * directions above; real params and their values survive.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val lowered = lower(regexp_extract(noFrag, "(?i)^(https?://[^/?#]*)", 1))
    val noWww = regexp_replace(lowered, "://www\\.", "://")
    // default ports are SCHEME-specific: :80 is only redundant under
    // http, :443 only under https — a blanket strip would conflate
    // https://h:80 (a real non-default binding) with https://h
    val prefix = when(noWww.startsWith("http://"),
        regexp_replace(noWww, ":80$", ""))
      .when(noWww.startsWith("https://"),
        regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val rest = regexp_extract(noFrag, "(?i)^https?://[^/?#]*(.*)", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/$", "")
    val query = when(rest.contains("?"), regexp_extract(rest, "\\?(.*)$", 1))
      .otherwise(lit(""))
    val kept = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref=") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    val sortedQ = array_join(array_sort(kept), "&")
    val built = concat(prefix, path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
    // non-http(s) and scheme-less inputs don't match the prefix regex;
    // normalizing them to '' would collapse every ftp/relative/malformed
    // URL into ONE dedup group — pass them through verbatim instead
    // (unknown scheme ⇒ no safe normalization). NULL stays NULL.
    when(prefix === "", url).otherwise(built)
  }

  /** URL-level dedup over [[canonicalUrl]]: one keeper (smallest id) per
    * canonical URL. Emits (idCol, canon, kept) for every input row — the
    * curation stage that collapses crawl re-fetches of the same page
    * before any text-level dedup runs. One map-side-combined aggregate on
    * the canonical key plus a key-partitioned join back; document
    * payloads never shuffle.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = df.select(col(idCol), canonicalUrl(col(urlCol)).as("canon"))
    val keepers = canon.groupBy("canon").agg(min(col(idCol)).as("__keep"))
      .withColumnRenamed("canon", "__kc")
    // null-SAFE reattach (the groupedRowNumbers pattern): NULL-url rows
    // form a real group — an equi-join would silently drop them from the
    // output entirely, neither kept nor counted
    canon.join(keepers, col("canon") <=> col("__kc"))
      .select(col(idCol), col("canon"), (col(idCol) === col("__keep")).as("kept"))
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
