package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups live under graft.queries.*; each contributes a map of
  * named DataFrame builders plus (where SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_join5")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Graph.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Events.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Two DuckDB representation hazards bit the driver's hash compare in
    * rounds 6–7 even when every VALUE matched; every oracle is swept for
    * them (r8) and new oracles must guard them too:
    *
    *   1. HUGEINT: DuckDB widens `sum(BIGINT)` — windowed or plain — to
    *      int128, which hashes differently from Spark's int64. Any integer
    *      sum that REACHES THE OUTPUT must be `CAST(... AS BIGINT)`
    *      (q71/q73 events, q103/q105 counts, q112's windowed `cum`; sums
    *      that only feed divisions/floors are safe — the arithmetic
    *      produces DOUBLE/BIGINT downstream, e.g. q87/q91's shard).
    *   2. Signed zero: DuckDB's `round()` preserves −0.0 from a tiny
    *      negative argument; Spark's BigDecimal-based round normalizes to
    *      +0.0, and the hash sees different double bits. Any output
    *      `round(expr, n)` whose expr can be a tiny negative carries a
    *      trailing `+ 0.0` (IEEE addition canonicalizes −0.0): q102's ilr,
    *      the q58/q59/q60/q61 cosines, q65's embedding means. Rounds of
    *      provably non-negative quantities (counts, quantities, RMS, BM25,
    *      nll, distances) need no guard.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.Graph.oracle ++
      graft.queries.Pipeline.oracle ++ graft.queries.Events.oracle
}
