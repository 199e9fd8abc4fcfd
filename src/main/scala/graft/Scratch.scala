package graft

import org.apache.spark.sql.SparkSession

/** temporary profiling harness — deleted before commit */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- sys.env.getOrElse("SCRATCH_EXPLAIN", "q74_tfidf").split(",")) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
