package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does Catalyst CBO join-reorder fire on ANALYZE'd temp
  * views, and what leaf order does it produce on a worst-first 3-join?
  */
object ProbeCbo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val t = graft.Tables(spark, d)
    val es = new graft.api.EngineSession(spark)
    t.nation.write.mode("overwrite").saveAsTable("cbo_nation")
    t.customer.write.mode("overwrite").saveAsTable("cbo_customer")
    t.orders.write.mode("overwrite").saveAsTable("cbo_orders")
    es.analyzeTable("cbo_nation")
    es.analyzeTable("cbo_customer")
    es.analyzeTable("cbo_orders")
    es.enableCbo()
    try {
      def q() = spark.sql(
        """SELECT n_name, count(*) AS n_orders
          |FROM cbo_orders
          | JOIN cbo_customer ON o_custkey = c_custkey
          | JOIN cbo_nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val j0 = q()
      val j = { spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true"); q() }
      def name(cols: Set[String]): String =
        if (cols.exists(_.startsWith("o_"))) "orders"
        else if (cols.exists(_.startsWith("c_"))) "customer"
        else if (cols.exists(_.startsWith("n_"))) "nation"
        else "?"
      val order = j.queryExecution.optimizedPlan.collectLeaves()
        .map(l => name(l.output.map(_.name).toSet)).mkString(",")
      val order0 = j0.queryExecution.optimizedPlan.collectLeaves()
        .map(l => name(l.output.map(_.name).toSet)).mkString(",")
      println(s"NO-CBO-ORDER: $order0")
      println(s"CBO-ORDER: $order")
      println(j.queryExecution.optimizedPlan.treeString.take(1800))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.conf.set("spark.sql.statistics.histogram.enabled", "false")
      Seq("cbo_nation", "cbo_customer", "cbo_orders").foreach { v =>
        spark.sql(s"DROP TABLE IF EXISTS $v")
      }
    }
    spark.stop()
  }
}
