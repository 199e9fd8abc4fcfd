package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: what leaf order does PkFkJoinReorder produce on the
  * smallest-first (nation ⨝ customer ⨝ orders) chain?
  */
object ProbePkfk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val t = graft.Tables(spark, d)
    import graft.plans.PkFkJoinReorder
    if (!spark.experimental.extraOptimizations.contains(PkFkJoinReorder))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PkFkJoinReorder
    PkFkJoinReorder.registerPrimaryKey("customer", Seq("c_custkey"))
    PkFkJoinReorder.registerPrimaryKey("nation", Seq("n_nationkey"))
    try {
      val j = t.nation
        .join(t.customer, col("c_nationkey") === col("n_nationkey"))
        .join(t.orders, col("o_custkey") === col("c_custkey"))
      def name(cols: Set[String]): String =
        if (cols.contains("o_orderkey")) "orders"
        else if (cols.contains("c_custkey")) "customer"
        else if (cols.contains("n_nationkey")) "nation"
        else "?"
      val order = j.queryExecution.optimizedPlan.collectLeaves()
        .map(l => name(l.output.map(_.name).toSet)).mkString(",")
      println(s"ORDER-WITH-RULE: $order")
      println(j.queryExecution.optimizedPlan.treeString.take(2500))
      val agg = j.groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"))
      val orderAgg = agg.queryExecution.optimizedPlan.collectLeaves()
        .map(l => name(l.output.map(_.name).toSet)).mkString(",")
      println(s"ORDER-AGG: $orderAgg")
      agg.orderBy("n_name").show(5)
    } finally PkFkJoinReorder.clear()
    spark.stop()
  }
}
