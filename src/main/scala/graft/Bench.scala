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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getName) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // failed queries report -1 (never a plausible wall-time) + an errors map,
    // so a broken query fails the bench visibly instead of looking fast.
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + e + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
