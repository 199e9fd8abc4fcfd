package graft.api

import graft.SparkSpec

class IterativeSpec extends SparkSpec {
  import spark.implicits._

  lazy val session = EngineSession(spark)

  test("unionByUpdate: updates replace, unmatched survive") {
    val base = session.createDatasetFromSparkSQL(
      Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("k", "v"))
    val updates = session.createDatasetFromSparkSQL(
      Seq((2, "new2"), (4, "new4")).toDF("k", "v"))
    val r = base.unionByUpdate(updates, Seq("k")).collect()
      .map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(r === Map(1 -> "old1", 2 -> "new2", 3 -> "old3", 4 -> "new4"))
  }

  test("iterate runs fixed rounds (Recursion semantics)") {
    val start = session.createDatasetFromSparkSQL(Seq(Tuple1(1L)).toDF("x"))
    val r = start.iterate(5)(d => session.createDatasetFromSparkSQL(d.df.selectExpr("x * 2 AS x")))
    assert(r.collect().head.getLong(0) === 32L)
  }

  test("iterate releases prior rounds' checkpoint blocks (storage back to baseline)") {
    // each round localCheckpoints; without the release, 20 rounds leave 20
    // persisted RDDs in the block store for the app lifetime
    // unpersist is async (blocking=false): poll until it settles
    def settled(maxExpected: Int): Int = {
      var tries = 0
      var n = spark.sparkContext.getRDDStorageInfo.length
      while (n > maxExpected && tries < 40) {
        Thread.sleep(100); n = spark.sparkContext.getRDDStorageInfo.length; tries += 1
      }
      n
    }
    val baseline = spark.sparkContext.getRDDStorageInfo.length
    val start = session.createDatasetFromSparkSQL(Seq(Tuple1(1L)).toDF("x"))
    val r = start.iterate(20)(d => session.createDatasetFromSparkSQL(d.df.selectExpr("x + 1 AS x")))
    assert(r.collect().head.getLong(0) === 21L)
    // only the final round's checkpoint may remain
    assert(settled(baseline + 1) <= baseline + 1)

    val fix = start.iterateToFixpoint(25) { d =>
      session.createDatasetFromSparkSQL(d.df.selectExpr("least(x + 1, 10L) AS x"))
    }
    assert(fix.collect().head.getLong(0) === 10L)
    assert(settled(baseline + 2) <= baseline + 2)
  }

  test("iterateToFixpoint stops at convergence under the cap") {
    // transitive closure of 1->2->3->4 from {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val start = session.createDatasetFromSparkSQL(Seq(Tuple1(1L)).toDF("node"))
    val closed = start.iterateToFixpoint(10) { reach =>
      session.createDatasetFromSparkSQL(
        reach.df.union(
          reach.df.join(edges, reach.df("node") === edges("src")).select(edges("dst").as("node")))
          .distinct())
    }
    assert(closed.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 4L))
  }

  test("UDAFs: geometric mean and variance") {
    import graft.functions.Udafs
    val df = Seq(2.0, 8.0).toDF("x")
    val gm = df.agg(Udafs.geometricMean($"x")).head().getDouble(0)
    assert(math.abs(gm - 4.0) < 1e-9)
    val vp = Seq(1.0, 2.0, 3.0, 4.0).toDF("x").agg(Udafs.variancePop($"x")).head().getDouble(0)
    assert(math.abs(vp - 1.25) < 1e-9)
    Udafs.registerAll(spark)
    val viaSql = Seq(2.0, 8.0).toDF("x").createOrReplaceTempView("gm_in")
    assert(math.abs(spark.sql("SELECT geometric_mean(x) FROM gm_in").head().getDouble(0) - 4.0) < 1e-9)
  }
}
