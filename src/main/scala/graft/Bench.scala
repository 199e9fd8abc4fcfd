package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Session warmup (codegen, parquet footer listing,
  * shuffle machinery) is paid by an uncounted warmup pass so per-query times
  * measure the query, not JVM cold start.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: fully read every input table once (page cache + parquet footers)
    // and exercise shuffle/agg/join codegen paths, all uncounted. A cold page
    // cache otherwise dominates the first scan of each table and the bench
    // measures I/O, not queries.
    try {
      val t = Tables(spark, sfDir)
      Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
          t.lineitem, t.events, t.documents, t.embeddings)
        .foreach(df => df.foreach(_ => ()))
      t.lineitem.groupBy("l_returnflag").count().count()
      t.orders.join(t.customer, t.orders("o_custkey") === t.customer("c_custkey")).count()
    } catch { case _: Throwable => () }

    // two full passes, per-query minimum (standard min-of-N reporting):
    // single-pass times carry ±10-15% JIT/GC/scheduler noise that dwarfs
    // real plan differences; the second pass also amortizes per-query
    // codegen. Pass count is recorded in the JSON.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // optional comma-separated subset for local iteration (driver sets no env)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val times = scala.collection.mutable.Map.empty[String, Double]
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to runs; name <- names if !errors.contains(name)) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (!times.get(name).exists(_ <= dt)) times(name) = dt
      } catch { case e: Throwable => errors(name) = e.getClass.getName }
    }
    // failed queries report -1 (never a plausible wall-time) + an errors map,
    // so a broken query fails the bench visibly instead of looking fast.
    val qs = names.map { k =>
      "\"" + k + "\":" + (if (errors.contains(k)) "-1" else times(k).toString)
    }.mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1).map { case (k, e) =>
      "\"" + k + "\":\"" + e + "\""
    }.mkString("{", ",", "}")
    val total = names.collect { case k if !errors.contains(k) => times(k) }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"sf":"$sfDir"}"""
    println(json)
    // the driver snapshots only a stdout tail (2000 chars — fewer than the
    // per-query map needs past ~65 queries); the full line also lands in a
    // file so every per-query time stays machine-readable
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
  }
}
