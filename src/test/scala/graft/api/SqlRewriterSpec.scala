package graft.api

import graft.SparkSpec

/** SQL-text forms of the reference's two grammar extensions
  * (SQLParser.scala:328-336, 240-246).
  */
class SqlRewriterSpec extends SparkSpec {
  import spark.implicits._

  lazy val session = EngineSession(spark)

  test("UNION BY UPDATE upserts by key in SQL text") {
    Seq((1L, "old1"), (2L, "old2"), (3L, "keep3")).toDF("k", "v")
      .createOrReplaceTempView("ubu_base")
    Seq((1L, "new1"), (2L, "new2"), (9L, "new9")).toDF("k", "v")
      .createOrReplaceTempView("ubu_delta")
    val out = session.sql(
      "(SELECT k, v FROM ubu_base) UNION BY UPDATE k (SELECT k, v FROM ubu_delta)")
      .df.as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "new1", 2L -> "new2", 3L -> "keep3", 9L -> "new9"))
  }

  test("UNION BY UPDATE matches the unionByUpdate API operator") {
    val base = session.createDatasetFromSparkSQL(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    val delta = session.createDatasetFromSparkSQL(
      Seq((2L, 99.0), (5L, 50.0)).toDF("k", "v"))
    base.createOrReplaceTable("ubu2_base")
    delta.createOrReplaceTable("ubu2_delta")
    val viaApi = base.unionByUpdate(delta, Seq("k")).df
      .as[(Long, Double)].collect().toSet
    val viaSql = session.sql(
      "(SELECT * FROM ubu2_base) UNION BY UPDATE k (SELECT * FROM ubu2_delta)")
      .df.as[(Long, Double)].collect().toSet
    assert(viaSql === viaApi)
  }

  test("UNION BY UPDATE composes inside a larger statement") {
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").createOrReplaceTempView("ubu3_a")
    Seq((2L, 20.0)).toDF("k", "v").createOrReplaceTempView("ubu3_b")
    val n = session.sql(
      """SELECT count(*) AS n FROM (
        | (SELECT * FROM ubu3_a) UNION BY UPDATE k (SELECT * FROM ubu3_b)
        |) t WHERE v >= 2.0""".stripMargin)
      .df.as[Long].head()
    assert(n === 1L) // upsert leaves (1,1.0),(2,20.0); v>=2.0 keeps only (2,20.0)
  }

  test("MATCH(graph, pattern) in FROM resolves through the graph catalog") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    session.createGraph("msql", graft.graph.PropertyGraph.fromEdges(edges))
    val n = session.sql(
      "SELECT count(*) AS n FROM MATCH(msql, (a)-[]->(b)-[]->(c); (c)-[]->(a)) " +
        "WHERE a < b AND a < c")
      .df.as[Long].head()
    assert(n === 1L) // the single directed triangle, canonicalized
    session.dropGraph("msql")
  }

  test("plain SQL is untouched") {
    val r = session.sql("SELECT 1 AS union_col, 2 AS match_col").df.collect()
    assert(r.head.getInt(0) === 1 && r.head.getInt(1) === 2)
  }

  test("WITH RECURSIVE computes a transitive closure to fixpoint (UNION set semantics)") {
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
      .createOrReplaceTempView("rec_chain")
    val out = session.sql(
      """WITH RECURSIVE tc AS (
        |  SELECT src, dst FROM rec_chain
        |  UNION
        |  SELECT tc.src, e.dst FROM tc JOIN rec_chain e ON tc.dst = e.src
        |) SELECT src, dst FROM tc""".stripMargin)
      .df.as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L), (1L, 4L)))
  }

  test("WITH RECURSIVE(n) caps the rounds like the reference's Recursion(plan, n)") {
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
      .createOrReplaceTempView("rec_chain2")
    val out = session.sql(
      """WITH RECURSIVE(1) tc AS (
        |  SELECT src, dst FROM rec_chain2
        |  UNION
        |  SELECT tc.src, e.dst FROM tc JOIN rec_chain2 e ON tc.dst = e.src
        |) SELECT src, dst FROM tc""".stripMargin)
      .df.as[(Long, Long)].collect().toSet
    // one round past the base: paths of length ≤ 2 only
    assert(out === Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L)))
  }

  test("WITH RECURSIVE with UNION ALL accumulates working-table rows (generator)") {
    val out = session.sql(
      """WITH RECURSIVE(20) gen(x) AS (
        |  SELECT 1 AS x
        |  UNION ALL
        |  SELECT x + 1 FROM gen WHERE x < 5
        |) SELECT x FROM gen""".stripMargin)
      .df.as[Int].collect().sorted.toSeq
    assert(out === Seq(1, 2, 3, 4, 5))
  }

  test("WITH RECURSIVE terminates on a cyclic graph (set fixpoint)") {
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .createOrReplaceTempView("rec_cycle")
    val out = session.sql(
      """WITH RECURSIVE r AS (
        |  SELECT src, dst FROM rec_cycle
        |  UNION
        |  SELECT r.src, e.dst FROM r JOIN rec_cycle e ON r.dst = e.src
        |) SELECT count(*) AS n FROM r""".stripMargin)
      .df.as[Long].head()
    assert(out === 9L) // full 3x3 closure, despite the cycle
  }

  test("WITH RECURSIVE matches the iterateToFixpoint API operator") {
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L)).toDF("src", "dst")
      .createOrReplaceTempView("rec_api")
    val viaSql = session.sql(
      """WITH RECURSIVE tc AS (
        |  SELECT src, dst FROM rec_api
        |  UNION
        |  SELECT tc.src, e.dst FROM tc JOIN rec_api e ON tc.dst = e.src
        |) SELECT src, dst FROM tc""".stripMargin)
      .df.as[(Long, Long)].collect().toSet
    val edges = spark.table("rec_api")
    val viaApi = session.createDatasetFromSparkSQL(edges)
      .iterateToFixpoint(100) { cur =>
        session.createDatasetFromSparkSQL(
          cur.df.union(
            cur.df.as("t").join(edges.as("e"),
              org.apache.spark.sql.functions.col("t.dst") ===
                org.apache.spark.sql.functions.col("e.src"))
              .select($"t.src", $"e.dst")).distinct())
      }.df.as[(Long, Long)].collect().toSet
    assert(viaSql === viaApi)
  }

  test("WITH RECURSIVE does not clobber a same-named session temp view") {
    Seq(("shadow-me", 1L)).toDF("tag", "n").createOrReplaceTempView("tc_shadow")
    Seq((1L, 2L), (2L, 3L)).toDF("src", "dst").createOrReplaceTempView("rec_shadow")
    val out = session.sql(
      """WITH RECURSIVE tc_shadow AS (
        |  SELECT src, dst FROM rec_shadow
        |  UNION
        |  SELECT tc_shadow.src, e.dst FROM tc_shadow JOIN rec_shadow e ON tc_shadow.dst = e.src
        |) SELECT count(*) AS n FROM tc_shadow""".stripMargin)
      .df.as[Long].head()
    assert(out === 3L) // (1,2)(2,3)(1,3)
    // the pre-existing view is untouched and no internal view is left behind
    assert(spark.table("tc_shadow").columns.toSeq === Seq("tag", "n"))
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("__graft_rcte_")))
  }

  test("a column coincidentally named like the CTE does not make a branch recursive") {
    // `cand` appears as a column in the base branch — under the old
    // word-boundary match this branch would be misclassified as a step and
    // the require(base nonEmpty) would trip. (A coincidental column named
    // like the CTE inside a STEP branch remains unsupported — class doc.)
    Seq((1L, 2L), (2L, 3L)).toDF("src", "cand").createOrReplaceTempView("rec_alias")
    Seq((1L, 2L), (2L, 3L)).toDF("src", "dst").createOrReplaceTempView("rec_alias_e")
    val out = session.sql(
      """WITH RECURSIVE cand AS (
        |  SELECT src, cand AS dst FROM rec_alias
        |  UNION
        |  SELECT cand.src, e.dst FROM cand JOIN rec_alias_e e ON cand.dst = e.src
        |) SELECT count(*) AS n FROM cand""".stripMargin)
      .df.as[Long].head()
    assert(out === 3L)
  }

  test("WITH RECURSIVE without a trailing query fails with a specific message") {
    val e = intercept[IllegalArgumentException] {
      session.sql(
        "WITH RECURSIVE tc AS (SELECT 1 AS x UNION SELECT x + 1 FROM tc WHERE x < 3)")
    }
    assert(e.getMessage.contains("missing trailing query"))
  }

  test("a recursive CTE nested inside the body or trailing query is rejected") {
    val eBody = intercept[IllegalArgumentException] {
      session.sql(
        """WITH RECURSIVE tc AS (
          |  SELECT * FROM (WITH RECURSIVE inner_r AS (SELECT 1 AS x) SELECT x FROM inner_r)
          |  UNION SELECT x FROM tc
          |) SELECT * FROM tc""".stripMargin)
    }
    assert(eBody.getMessage.contains("nested inside the CTE body"))
    val eRest = intercept[IllegalArgumentException] {
      session.sql(
        """WITH RECURSIVE tc AS (SELECT 1 AS x UNION SELECT x FROM tc)
          |SELECT * FROM tc JOIN (WITH RECURSIVE r2 AS (SELECT 1 AS y) SELECT y FROM r2) q
          |""".stripMargin)
    }
    assert(eRest.getMessage.contains("leading clause"))
  }

  test("a trailing query that is itself WITH RECURSIVE chains") {
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
      .createOrReplaceTempView("rec_chain3")
    val out = session.sql(
      """WITH RECURSIVE fwd AS (
        |  SELECT src, dst FROM rec_chain3
        |  UNION
        |  SELECT fwd.src, e.dst FROM fwd JOIN rec_chain3 e ON fwd.dst = e.src
        |)
        |WITH RECURSIVE back AS (
        |  SELECT dst AS src, src AS dst FROM fwd
        |  UNION
        |  SELECT back.src, e.src AS dst FROM back JOIN rec_chain3 e ON back.dst = e.dst
        |) SELECT count(*) AS n FROM back""".stripMargin)
      .df.as[Long].head()
    assert(out === 6L) // the reversed closure of the 4-chain
  }

  test("keywords and parens inside string literals are content, not syntax") {
    val r = session.sql(
      "SELECT 'UNION BY UPDATE k (' AS a, 'MATCH(g, (x)-[]->(y))' AS b, ')(' AS c")
      .df.collect().head
    assert(r.getString(0) === "UNION BY UPDATE k (")
    assert(r.getString(1) === "MATCH(g, (x)-[]->(y))")
    // literals inside a real UNION BY UPDATE operand survive the rewrite
    Seq((1L, "x(")).toDF("k", "v").createOrReplaceTempView("ubu4_a")
    Seq((2L, "y)")).toDF("k", "v").createOrReplaceTempView("ubu4_b")
    val out = session.sql(
      "(SELECT k, concat(v, '(lit') AS v FROM ubu4_a) UNION BY UPDATE k " +
        "(SELECT k, concat(v, ')lit') AS v FROM ubu4_b)")
      .df.as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "x((lit", 2L -> "y))lit"))
  }

  test("QUALIFY filters on an inline window function and drops the helper column") {
    Seq(("a", 1), ("a", 2), ("a", 3), ("b", 10), ("b", 20)).toDF("g", "x")
      .createOrReplaceTempView("qual_t")
    val out = session.sql(
      """SELECT g, x FROM qual_t
        |QUALIFY row_number() OVER (PARTITION BY g ORDER BY x DESC) <= 2
        |ORDER BY g, x""".stripMargin)
      .df
    assert(out.columns.toSeq === Seq("g", "x"))
    assert(out.as[(String, Int)].collect().toSeq ===
      Seq(("a", 2), ("a", 3), ("b", 10), ("b", 20)))
  }

  test("QUALIFY can reference a window alias from the select list") {
    Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "x").createOrReplaceTempView("qual_t2")
    val out = session.sql(
      """SELECT g, x, rank() OVER (PARTITION BY g ORDER BY x) AS r FROM qual_t2
        |QUALIFY r = 1 ORDER BY g""".stripMargin)
      .df.as[(String, Int, Int)].collect().toSeq
    assert(out === Seq(("a", 1, 1), ("b", 3, 1)))
  }

  test("QUALIFY composes with WHERE, GROUP BY and LIMIT around it") {
    Seq(("a", 1), ("a", 2), ("a", 5), ("b", 3), ("b", 4), ("c", 9))
      .toDF("g", "x").createOrReplaceTempView("qual_t3")
    val out = session.sql(
      """SELECT g, CAST(sum(x) AS BIGINT) AS s FROM qual_t3 WHERE x < 9 GROUP BY g
        |QUALIFY row_number() OVER (ORDER BY s DESC) <= 1
        |ORDER BY g LIMIT 5""".stripMargin)
      .df.as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 8L)))
  }

  test("QUALIFY in a subquery fails with a clear message") {
    val e = intercept[IllegalArgumentException] {
      session.sql("SELECT * FROM (SELECT g FROM t QUALIFY row_number() OVER (ORDER BY g) = 1) z")
    }
    assert(e.getMessage.contains("QUALIFY inside a subquery"))
  }

  test("ASOF JOIN SQL text matches the asofJoin API operator") {
    Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"), (3L, 50L, "t4"))
      .toDF("key", "time", "trade").createOrReplaceTempView("asof_l")
    Seq((1L, 10L, 100.0), (1L, 20L, 101.0), (2L, 6L, 200.0))
      .toDF("key", "qtime", "price").createOrReplaceTempView("asof_r")
    val viaSql = session.sql(
      """SELECT trade, asof_price FROM asof_l l ASOF JOIN asof_r r
        |ON l.key = r.key AND l.time >= r.qtime ORDER BY trade""".stripMargin)
      .df.as[(String, Option[Double])].collect().toMap
    val viaApi = graft.operators.AsofJoin.asofJoin(
        spark.table("asof_l"), spark.table("asof_r"),
        "key", "key", "time", "qtime", Seq("price"))
      .select("trade", "asof_price").as[(String, Option[Double])].collect().toMap
    assert(viaSql === viaApi)
    assert(viaSql === Map("t1" -> Some(100.0), "t2" -> Some(101.0),
      "t3" -> None, "t4" -> None))
  }

  test("ASOF JOIN composes with WHERE and cleans its internal view up") {
    Seq((1L, 10L)).toDF("k", "t").createOrReplaceTempView("asof2_l")
    Seq((1L, 5L, 7.0), (1L, 9L, 8.0)).toDF("k", "t", "v")
      .createOrReplaceTempView("asof2_r")
    val out = session.sql(
      """SELECT l.k, asof_v FROM asof2_l l ASOF LEFT JOIN asof2_r r
        |ON l.k = r.k AND l.t >= r.t WHERE asof_v IS NOT NULL""".stripMargin)
      .df.as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 8.0)))
    assert(!spark.catalog.tableExists("__asof_1") &&
      spark.sessionState.catalog.listTables("default").forall(!_.table.startsWith("__asof")))
  }

  test("ASOF JOIN with a malformed condition fails with a clear message") {
    Seq((1L, 10L)).toDF("k", "t").createOrReplaceTempView("asof3_l")
    Seq((1L, 5L)).toDF("k", "t").createOrReplaceTempView("asof3_r")
    val e = intercept[IllegalArgumentException] {
      session.sql("SELECT * FROM asof3_l a ASOF JOIN asof3_r b ON a.k < b.k")
    }
    assert(e.getMessage.contains("ASOF JOIN"))
  }

  test("a table aliased literally `asof` fails with the reserved-word advice") {
    // `FROM t asof JOIN u ON asof.k = u.k` reads as an ASOF JOIN here
    // (asof is reserved, as in DuckDB) — the condition qualified by the
    // swallowed alias must surface the rename advice, not a shape error
    // and never a silent as-of rewrite of a plain join
    Seq((1L, 10L)).toDF("k", "t").createOrReplaceTempView("asof4_l")
    Seq((1L, 5L)).toDF("k", "t").createOrReplaceTempView("asof4_r")
    val e = intercept[IllegalArgumentException] {
      session.sql("SELECT * FROM asof4_l asof JOIN asof4_r u ON asof.k = u.k")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      session.sql(
        "SELECT * FROM asof4_l asof JOIN asof4_r u ON asof.k = u.k AND asof.t >= u.t")
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("ASOF JOIN with qualified table names is rejected, not suffix-matched") {
    // must NOT silently resolve the bare suffix `trades` of `mydb.trades`
    val e = intercept[IllegalArgumentException] {
      session.sql(
        "SELECT * FROM mydb.trades t ASOF JOIN mydb.quotes q ON t.k = q.k AND t.ts >= q.ts")
    }
    assert(e.getMessage.contains("unqualified"))
  }

  test("non-linear recursion (CTE self-joined in the step) reaches the full closure") {
    // path 1→2→3→4→5: with tc JOIN tc as the step, semi-naive deltas alone
    // would miss pairs combining rows from different rounds (e.g. length-3
    // paths after round 2); the non-linear branch must see the full total
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
      .createOrReplaceTempView("nl_edges")
    val out = session.sql(
      """WITH RECURSIVE tc AS (
        |  SELECT src, dst FROM nl_edges
        |  UNION
        |  SELECT a.src, b.dst FROM tc a JOIN tc b ON a.dst = b.src
        |) SELECT count(*) AS n FROM tc""".stripMargin)
      .df.as[Long].head()
    assert(out === 10L) // all ordered reachable pairs of the 5-chain
  }

  test("non-linear recursion under UNION ALL is rejected with a clear message") {
    Seq((1L, 2L)).toDF("src", "dst").createOrReplaceTempView("nl2_edges")
    val e = intercept[IllegalArgumentException] {
      session.sql(
        """WITH RECURSIVE tc AS (
          |  SELECT src, dst FROM nl2_edges
          |  UNION ALL
          |  SELECT a.src, b.dst FROM tc a JOIN tc b ON a.dst = b.src
          |) SELECT count(*) AS n FROM tc""".stripMargin)
    }
    assert(e.getMessage.contains("referenced more than once"))
  }
}
