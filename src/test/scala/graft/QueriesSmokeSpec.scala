package graft

/** Smoke: every gate query builds and executes at sf0.001 (the driver's t1).
  * Correctness is owned by the DuckDB oracle (graft.Verify + driver); this
  * catches runtime regressions (unresolved columns, bad casts) early.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has distinct name and runs at sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      withClue(s"query $name: ") {
        val df = fn(spark, sf0001)
        assert(df.columns.nonEmpty)
        assert(df.count() >= 0)
      }
    }
  }

  test("oracle entries reference existing queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }
}
