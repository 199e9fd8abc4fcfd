package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: print a gate's executed plan. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = if (args.nonEmpty) args(0) else "q222_dsl_exprs"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(q)(spark, d)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
