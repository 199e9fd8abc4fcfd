package graft.api

import graft.SparkSpec

class EngineDataFrameSpec extends SparkSpec {
  import spark.implicits._

  lazy val session = EngineSession(spark)
  lazy val r = session.createDatasetFromSparkSQL(
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (3, "a", 30.0)).toDF("k", "tag", "v"))
  lazy val s = session.createDatasetFromSparkSQL(
    Seq((2, "x"), (3, "y"), (4, "z")).toDF("k", "name"))

  test("select is a filter (reference semantics)") {
    assert(r.select("v > 15.0").count() === 3)
  }

  test("project is distinct-producing") {
    assert(r.project("k, tag").count() === 3) // (3,a) dup collapsed
    assert(r.projectAll("k, tag").count() === 4)
  }

  test("union is distinct, unionAll keeps duplicates") {
    val a = r.projectAll("k")
    assert(a.union(a).count() === 3)
    assert(a.unionAll(a).count() === 8)
  }

  test("difference has intended EXCEPT semantics (not the reference bug)") {
    val left = r.projectAll("k").distinct()
    val right = s.projectAll("k").distinct()
    assert(left.difference(right).collect().map(_.getInt(0)).toSet === Set(1))
    assert(left.intersection(right).collect().map(_.getInt(0)).toSet === Set(2, 3))
  }

  test("join with string condition and join types") {
    val joined = r.subqueryAlias("r").join(s.subqueryAlias("s"), "r.k = s.k", "inner")
    assert(joined.count() === 3)
    val semi = r.subqueryAlias("r").join(s.subqueryAlias("s"), "r.k = s.k", "left_semi")
    assert(semi.count() === 3) // k∈{2,3,3}
    val anti = r.subqueryAlias("r").join(s.subqueryAlias("s"), "r.k = s.k", "left_anti")
    assert(anti.collect().map(_.getInt(0)).toSet === Set(1))
  }

  test("naturalJoin joins on shared column names") {
    assert(r.naturalJoin(s).count() === 3)
    assert(r.naturalJoin(s, "left").count() === 4)
  }

  test("aggregate with expression strings") {
    val agg = r.aggregate(Seq("sum(v) as total", "count(1) as n"), Seq("tag"))
    val m = agg.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(m("a") === 70.0 && m("b") === 20.0)
    val g = r.aggregate(Seq("max(v) as mx"), Nil)
    assert(g.collect().head.getDouble(0) === 30.0)
  }

  test("sql passthrough and temp views") {
    r.createOrReplaceTable("r_view")
    assert(session.sql("SELECT count(*) AS n FROM r_view").collect().head.getLong(0) === 4L)
    assert(session.table("r_view").count() === 4)
  }

  test("primary key registry") {
    session.registerPrimaryKey("r_view", Seq("k"))
    assert(session.primaryKeyOf("r_view") === Some(Seq("k")))
    assert(session.primaryKeyOf("nope") === None)
  }

  test("co-bucketed tables join without a shuffle") {
    val l = Seq.tabulate(200)(i => (i.toLong, i * 2.0)).toDF("k", "lv")
    val r = Seq.tabulate(200)(i => (i.toLong, s"r$i")).toDF("k", "rv")
    session.writeBucketed(l, "bkt_l", Seq("k"), 4)
    session.writeBucketed(r, "bkt_r", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_l").join(spark.table("bkt_r"), "k" :: Nil)
      assert(j.count() === 200)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), "bucketed join must not shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("limit and sort") {
    val top = r.sort("v desc").limit(1).collect()
    assert(top.head.getDouble(2) === 30.0)
  }
}
