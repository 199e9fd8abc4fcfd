package graft

import graft.dsl._

/** The reference's symbol expression DSL (dsl/package.scala:36-62):
  * `'a + 'b`, `'a === 'b`, symbols as select targets.
  */
class DslSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq((1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "x"))
    .toDF("a", "b", "s")

  test("symbols select and project like columns") {
    assert(df.select('a, 'b).columns.toSeq === Seq("a", "b"))
  }

  test("symbol comparison and boolean ops build predicates") {
    assert(df.filter('a === 2L).count() === 1)
    assert(df.filter('a =!= 2L).count() === 2)
    assert(df.filter(('a >= 2L) && ('b <= 20L)).count() === 1)
    assert(df.filter(('a < 2L) || ('s === "y")).count() === 2)
    assert(df.filter('b > 'a).count() === 3) // symbol on both sides
  }

  test("symbol arithmetic composes") {
    val r = df.select(('a + 'b).as("ab"), ('b % 'a).as("m"), (-'a).as("neg"))
      .as[(Long, Long, Long)].collect().toSet
    assert(r.contains((11L, 0L, -1L)))
  }

  test("sort direction and null checks") {
    assert(df.orderBy('b.desc).select('a).as[Long].head() === 3L)
    assert(df.filter('s.isNotNull).count() === 3)
  }
}
