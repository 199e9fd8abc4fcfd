package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.api.EngineSession

class PkFkJoinReorderSpec extends SparkSpec {
  import spark.implicits._

  test("reorders dim-first join to start at largest relation, PK edges first") {
    PkFkJoinReorder.clear()
    val es = EngineSession(spark) // installs the rule
    val fact = (1 to 5000).map(i => (i % 50L, i % 20L, i.toDouble)).toDF("d1_key", "d2_key", "v")
    val dim1 = (0 until 50).map(i => (i.toLong, s"a$i")).toDF("d1_key", "d1_name")
    val dim2 = (0 until 20).map(i => (i.toLong, s"b$i")).toDF("d2_key", "d2_name")
    es.registerPrimaryKey("dim1", Seq("d1_key"))
    es.registerPrimaryKey("dim2", Seq("d2_key"))

    // deliberately bad authored order: dim1 ⋈ dim2 would be a cross join if
    // honored literally left-deep; rule should anchor on the fact table
    val q = dim1.join(fact, Seq("d1_key")).join(dim2, Seq("d2_key"))
      .groupBy("d1_name").agg(sum("v").as("sv"))

    val optimized = q.queryExecution.optimizedPlan.toString
    assert(q.count() === 50)
    // the rule rewrote the join (Project wrapper restoring output order is
    // its signature); correctness: result equals the unoptimized semantics
    val expected = dim1.join(fact, Seq("d1_key")).join(dim2, Seq("d2_key"))
      .groupBy("d1_name").agg(sum("v").as("sv")).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === expected)
    assert(optimized.nonEmpty)
  }

  test("rule is a no-op without registered keys") {
    PkFkJoinReorder.clear()
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, 2.0)).toDF("k", "v")
    val q = a.join(b, "k" :: Nil)
    assert(q.count() === 1)
    PkFkJoinReorder.clear()
  }

  test("unrelated registered PK leaves a self-join chain untouched (no oscillation)") {
    // regression: with ANY key registered, the rule used to size-greedy
    // reorder every >=3-relation inner join — on a pattern-style self-join
    // of one equal-size edge table the all-ties tie-break fell back to Map
    // iteration order, the fixed-point batch oscillated, and the plan grew
    // a Project per level per iteration until optimization overflowed the
    // stack. No edge touches a PK here, so the rule must decline.
    PkFkJoinReorder.clear()
    val es = EngineSession(spark) // installs the rule on the session
    es.registerPrimaryKey("unrelated_table", Seq("unrelated_key"))
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    // 4-hop cycle: four copies of the same relation, all sizes equal
    val q = edges.select($"src".as("a"), $"dst".as("b"))
      .join(edges.select($"src".as("b"), $"dst".as("c")), Seq("b"))
      .join(edges.select($"src".as("c"), $"dst".as("d")), Seq("c"))
      .join(edges.select($"src".as("d"), $"dst".as("a2")), Seq("d"))
    // optimizing must terminate (no StackOverflow) and not bloat the plan
    val depth = q.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(depth < 40, s"optimized plan unexpectedly large: $depth nodes")
    assert(q.count() === 4)
    PkFkJoinReorder.clear()
  }

  test("rule preserves results on a 4-table star with conditions intact") {
    PkFkJoinReorder.clear()
    PkFkJoinReorder.registerPrimaryKey("r1", Seq("k1"))
    PkFkJoinReorder.registerPrimaryKey("r2", Seq("k2"))
    val fact = (1 to 1000).map(i => (i % 10L, i % 7L, i % 3L)).toDF("k1", "k2", "k3")
    val d1 = (0 until 10).map(i => (i.toLong, i * 10)).toDF("k1", "a1")
    val d2 = (0 until 7).map(i => (i.toLong, i * 100)).toDF("k2", "a2")
    val d3 = (0 until 3).map(i => (i.toLong, i * 1000)).toDF("k3", "a3")
    val joined = d1.join(d2, expr("true"), "cross") // not reordered: cross has no condition
    val q = d3.join(fact, Seq("k3")).join(d1, Seq("k1")).join(d2, Seq("k2"))
    assert(q.count() === 1000)
    assert(q.agg(sum(col("a1") + col("a2") + col("a3"))).head().getLong(0) ===
      (1 to 1000).map(i => (i % 10) * 10 + (i % 7) * 100 + (i % 3) * 1000).sum)
    assert(joined.count() === 70)
    PkFkJoinReorder.clear()
  }
}
