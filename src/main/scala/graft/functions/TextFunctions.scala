package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. All are composed from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs), so they inline into
  * whole-stage codegen and run per-row with zero shuffle — the property that
  * matters when the documents table is 100 TB.
  *
  * Every function has a DuckDB-expressible twin used by the correctness gate
  * (graft.queries.Pipeline).
  */
object TextFunctions {

  /** whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-flavoured pre-tokenizer pattern: contractions, space-prefixed
    * letter runs, digit runs, punctuation runs, residual whitespace. Kept
    * RE2-compatible (no lookarounds) so the DuckDB oracle can run the
    * identical pattern.
    */
  val BpeishPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** BPE-ish token count: matches of [[BpeishPattern]], whitespace-only
    * matches excluded — approximates an LLM tokenizer's pre-token count.
    */
  def bpeTokenCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(BpeishPattern), lit(0)),
      t => !t.rlike("^\\s+$")))

  /** distinct-token count — type/token ratio ingredient. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** stopword-profile hit ratio: |tokens ∩ profile| / |tokens|. */
  def stopwordRatio(text: Column, profile: Seq[String]): Column = {
    val t = tokens(text)
    val hits = size(filter(t, tok => tok.isin(profile.map(_.asInstanceOf[Any]): _*)))
    hits.cast("double") / size(t)
  }

  /** punctuation character ratio (explicit class, locale-free). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Heuristic quality score in [0,1]: length saturation × (1 − punct ratio)
    * × stopword presence bonus. The formula is arbitrary but fixed — the
    * point is a deterministic, shuffle-free per-document score.
    */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(tokenCount(text), lit(200)).cast("double") / 200.0
    val punctTerm = lit(1.0) - punctRatio(text)
    val stopTerm = lit(0.5) + lit(0.5) * stopwordRatio(text, LangProfiles.en)
    round(lenTerm * punctTerm * stopTerm, 6)
  }

  /** Stopword profiles for the n-gram-free language-ID heuristic. */
  object LangProfiles {
    val en = Seq("the", "a", "of", "and", "to", "is", "in")
    val de = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
    val fr = Seq("le", "la", "les", "et", "est", "une", "dans")
    val es = Seq("el", "los", "y", "es", "una", "que", "por")
  }

  /** Language ID by stopword-profile scoring with a fixed priority tie-break
    * (en > de > fr > es > und). An n-gram-model-free heuristic that stays
    * inside codegen; swap profiles for real fastText-style models offline.
    */
  def langId(text: Column): Column = {
    import LangProfiles._
    val sEn = stopwordRatio(text, en)
    val sDe = stopwordRatio(text, de)
    val sFr = stopwordRatio(text, fr)
    val sEs = stopwordRatio(text, es)
    when(sEn > 0 && sEn >= sDe && sEn >= sFr && sEn >= sEs, "en")
      .when(sDe > 0 && sDe >= sFr && sDe >= sEs, "de")
      .when(sFr > 0 && sFr >= sEs, "fr")
      .when(sEs > 0, "es")
      .otherwise("und")
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set (bag-of-words hash). Word-order-invariant dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** token k-grams of the document (NON-distinct, in order) — repetition
    * statistics need the multiset. The tokenized array is let-bound
    * through a lambda variable so it evaluates once per row; see the
    * measured comparison of the candidate formulations inline below.
    */
  def tokenNgrams(text: Column, k: Int): Column = {
    // the split is LET-BOUND through a 1-element transform (tk is a lambda
    // variable, so tokens() evaluates once per row), then one transform
    // over the start indexes joins each k-window with concat_ws. Naive
    // forms re-evaluate the tokens() subtree inside every lambda
    // invocation — higher-order lambdas defeat subexpression elimination —
    // re-splitting the text per element: measured on the sf0.1 5-shingle
    // build, let-bound 0.45 s vs 0.89 s (zip_with fold) vs 2.6 s (plain
    // transform referencing the split).
    val sh = transform(array(tokens(text)), tk =>
      when(size(tk) >= k,
        transform(sequence(lit(1), size(tk) - (k - 1)),
          i => concat_ws(" ", slice(tk, i, lit(k)))))
        .otherwise(array()))
    element_at(sh, 1)
  }

  /** Collapse runs of consecutive identical tokens to a single occurrence —
    * the repetition *scrub* companion to the repetition *statistics*
    * ([[dupTokenFraction]]): "the the the cat" → "the cat". Token i
    * survives iff i = 0 or it differs from token i−1 — one native
    * UTF8String-compare pass ([[NativeExpressions.scrubRunsNative]]), zero
    * shuffle; the indexed-lambda HOF it replaces interpreted the lambda per
    * token and dominated the curation pipeline's text stage
    * (differential-tested in FunctionsSpec).
    */
  def scrubTokenRuns(text: Column): Column =
    array_join(scrubTokens(tokens(text)), " ")

  /** The kept-token array of [[scrubTokenRuns]], for callers that keep
    * working with tokens (fingerprint, token count) instead of re-joining
    * and re-splitting the string.
    */
  def scrubTokens(toks: Column): Column =
    NativeExpressions.scrubRunsNative(toks)

  /** Number of tokens [[scrubTokenRuns]] removes. */
  def tokenRunsRemoved(text: Column): Column = {
    val toks = tokens(text)
    size(toks) - size(scrubTokens(toks))
  }

  /** duplicate-token fraction: 1 − |distinct tokens| / |tokens| — an
    * intra-document repetition signal (Gopher-style quality filter).
    */
  def dupTokenFraction(text: Column): Column = {
    val t = tokens(text)
    round((size(t) - size(array_distinct(t))).cast("double") / size(t), 6)
  }

  /** distinct character n-grams (shingles) of the document, first-occurrence
    * order — the native one-pass Expression ([[NativeExpressions.CharNgrams]]).
    */
  def charNgrams(text: Column, n: Int): Column =
    NativeExpressions.charNgramsNative(text, n)

  /** HOF formulation of [[charNgrams]] — kept as the differential-test twin.
    * Guarded: Spark's sequence(1, 0) would produce a *descending* [1,0], not
    * empty. ~30× slower per row than the native expression (interpreted
    * lambda per element + O(position) substr re-scans).
    */
  def charNgramsHof(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n)))))
      .otherwise(array())

  /* == PII scrubbing — the redaction stage of a training-data pipeline.
   * Regexes restricted to the dialect intersection of Java (Spark) and RE2
   * (DuckDB oracle): character classes, +, {m,} — no backrefs/lookaround.
   * All replacement is codegen'd regexp_replace, zero shuffle. == */

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
  val Ipv4Re  = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Replace emails, phone numbers and IPv4 addresses with typed placeholder
    * tokens. Email first (its domain could otherwise be nibbled by the IP
    * pattern), then phone, then IP.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
}
