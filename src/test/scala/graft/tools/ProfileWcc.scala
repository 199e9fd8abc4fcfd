package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** One-off profiler for the q43_wcc directive: where do the ~5 s go at
  * sf0.1? Run with
  * `sbt "Test/runMain graft.tools.ProfileWcc /root/testdata/sf0.1"`.
  * Test scope: a measurement harness, not part of the library.
  */
object ProfileWcc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-wcc")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // aggregate executor-side time across all stages, to split wall time
    // into compute vs scheduling/launch overhead
    val stageStats = new java.util.concurrent.atomic.AtomicReference(
      (0L, 0L, 0L, 0)) // (executorRunMs, shuffleFetchMs, taskCount, stages)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stageStats.updateAndGet { case (r, f, t, s) =>
          (r + m.executorRunTime,
            f + m.shuffleReadMetrics.fetchWaitTime,
            t + sc.stageInfo.numTasks, s + 1)
        }
      }
    })

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def edges = orders.filter(col("o_orderkey") % 17 === 0)
      .select((col("o_custkey") % 997).as("src"), (col("o_orderkey") % 997).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    println(s"[profile] edges=${edges.count()} " +
      s"nodes=${edges.select(col("src").as("id")).union(edges.select(col("dst"))).distinct().count()}")

    def timed[A](label: String)(f: => A): A = {
      stageStats.set((0L, 0L, 0L, 0))
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a beat
      Thread.sleep(300)
      val (run, fetch, tasks, stages) = stageStats.get()
      println(f"[profile] $label%-28s wall=$wall%6.2fs executorRun=${run / 1e3}%6.2fs " +
        f"fetchWait=${fetch / 1e3}%5.2fs tasks=$tasks%5d stages=$stages%3d")
      r
    }

    // warm-up: JIT + codegen + parquet footer caches
    timed("warmup count")(edges.count())

    for (pass <- 1 to 3) {
      val g = graft.graph.PropertyGraph.fromEdges(edges)
      val (res, rounds) = timed(s"wcc pass $pass")(
        { val t = g.connectedComponentsWithRounds(); (t._1.count(), t._2) })
      println(s"[profile]   rounds=$rounds resultRows=$res")
    }

    // per-round wall time: replicate the loop with a timer per round
    {
      val g = graft.graph.PropertyGraph.fromEdges(edges)
      val und = edges.select(col("src").as("a"), col("dst").as("b"))
        .union(edges.select(col("dst").as("a"), col("src").as("b")))
        .distinct().repartition(col("a"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      und.count()
      var state = und.select(col("a").as("id")).union(und.select(col("b")))
        .distinct().select(col("id"), col("id").cast("long").as("component"))
        .localCheckpoint(true)
      var i = 0
      var converged = false
      while (!converged && i < 50) {
        val t0 = System.nanoTime()
        val nbrMin = und.join(state.withColumnRenamed("id", "a"), Seq("a"))
          .groupBy(col("b").as("id")).agg(min("component").as("nbrComponent"))
        val relaxed = state.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("component").as("prev"),
            least(col("component"), coalesce(col("nbrComponent"), col("component"))).as("c1"))
        val stepped =
          if (i < 3) relaxed.select(col("id"), col("prev"), col("c1").as("component"))
          else {
            val lookup = relaxed.select(col("id").as("c1"), col("c1").as("jump"))
            relaxed.join(lookup, Seq("c1"), "left")
              .select(col("id"), col("prev"),
                least(col("c1"), coalesce(col("jump"), col("c1"))).as("component"))
          }
        val next = stepped.localCheckpoint(false)
        val changed = next.agg(count(when(col("component") =!= col("prev"), 1)))
          .head().getLong(0)
        org.apache.spark.sql.GraftSqlBridge.releaseCheckpoint(state)
        state = next.select("id", "component")
        converged = changed == 0
        i += 1
        println(f"[profile]   round $i%2d wall=${(System.nanoTime() - t0) / 1e9}%5.2fs changed=$changed")
      }
      und.unpersist(false)
    }

    // fixed-cost floor: the same checkpoint+count round shape over a
    // 1000-row frame that never changes — pure scheduler/shuffle overhead
    {
      var state = spark.range(1000).select(col("id"), col("id").as("component"))
        .localCheckpoint(true)
      for (r <- 1 to 5) {
        val t0 = System.nanoTime()
        val next = state.groupBy("id").agg(min("component").as("component"))
          .localCheckpoint(false)
        next.agg(count(when(col("component") =!= col("id"), 1))).head()
        org.apache.spark.sql.GraftSqlBridge.releaseCheckpoint(state)
        state = next
        println(f"[profile]   noop round $r wall=${(System.nanoTime() - t0) / 1e9}%5.2fs")
      }
    }
    spark.stop()
  }
}
