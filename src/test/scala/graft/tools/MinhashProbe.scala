package graft.tools

import org.apache.spark.sql.SparkSession

/** One-question probe for the round-9 MinHash gate regressions (q55 1.58×,
  * q115 1.93×, q119 1.49× vs r8): does `Dedup.spread()`'s measured-small
  * repartition inside `shingleTids` pay for itself on these lineages, or
  * is it pure overhead ahead of paths that persist + localCheckpoint?
  * Times the three gates interleaved, min-of-3, spread ON (default cap)
  * vs OFF (`graft.spread.smallInputBytes = 0`).
  *
  * `sbt "Test/runMain graft.tools.MinhashProbe /root/testdata/sf0.1"`
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("minhash-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", 5000)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val gates = Seq("q55_minhash_lsh", "q115_incremental_fuzzy", "q119_store_dedup")
    def timeOne(name: String, cap: String): Double = {
      spark.conf.set("graft.spread.smallInputBytes", cap)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      spark.conf.unset("graft.spread.smallInputBytes")
      System.gc(); Thread.sleep(100)
      (System.nanoTime() - t0) / 1e9
    }
    // one uncounted warmup of each side
    gates.foreach { g => timeOne(g, (32L << 20).toString); timeOne(g, "0") }
    val results = gates.map { g =>
      val on = (1 to 3).map(_ => timeOne(g, (32L << 20).toString)).min
      val off = (1 to 3).map(_ => timeOne(g, "0")).min
      (g, on, off)
    }
    results.foreach { case (g, on, off) =>
      println(f"$g%-24s spreadON=$on%6.3f s  spreadOFF=$off%6.3f s  on/off=${on / off}%5.2f")
    }
    spark.stop()
  }
}
