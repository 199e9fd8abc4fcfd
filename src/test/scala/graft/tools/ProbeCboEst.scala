package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: Catalyst CBO row-count ESTIMATES vs exact counts on the
  * reference's controlled-cardinality W-shapes (star = W1, line = W4/W6)
  * over ANALYZE'd catalog tables — the measurement behind q239's
  * tolerance band.
  */
object ProbeCboEst {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val t = graft.Tables(spark, s"/root/testdata/$sf")
      val es = new graft.api.EngineSession(spark)
      t.lineitem.select("l_orderkey", "l_suppkey", "l_partkey")
        .write.mode("overwrite").saveAsTable("cboe_lineitem")
      t.orders.select("o_orderkey", "o_custkey").write.mode("overwrite").saveAsTable("cboe_orders")
      t.supplier.select("s_suppkey", "s_nationkey").write.mode("overwrite").saveAsTable("cboe_supplier")
      t.part.select("p_partkey").write.mode("overwrite").saveAsTable("cboe_part")
      t.customer.select("c_custkey", "c_nationkey").write.mode("overwrite").saveAsTable("cboe_customer")
      t.nation.select("n_nationkey", "n_regionkey").write.mode("overwrite").saveAsTable("cboe_nation")
      t.region.select("r_regionkey").write.mode("overwrite").saveAsTable("cboe_region")
      try {
        Seq("cboe_lineitem" -> "l_orderkey, l_suppkey, l_partkey",
          "cboe_orders" -> "o_orderkey, o_custkey",
          "cboe_supplier" -> "s_suppkey, s_nationkey",
          "cboe_part" -> "p_partkey",
          "cboe_customer" -> "c_custkey, c_nationkey",
          "cboe_nation" -> "n_nationkey, n_regionkey",
          "cboe_region" -> "r_regionkey").foreach { case (n, cols) =>
          spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS")
          spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS FOR COLUMNS $cols")
        }
        spark.conf.set("spark.sql.cbo.enabled", "true")
        def probe(name: String, sql: String): Unit = {
          val df = spark.sql(sql)
          val est = df.queryExecution.optimizedPlan.stats.rowCount
          val exact = df.count()
          val ratio = est.map(_.toDouble / math.max(exact, 1))
          println(f"[cbo] $sf $name%-10s exact=$exact%9d est=${est.getOrElse(BigInt(-1))}%12s " +
            s"ratio=${ratio.map(r => f"$r%.3f").getOrElse("none")}")
          spark.conf.set("spark.sql.cbo.enabled", "false")
          val off = spark.sql(sql).queryExecution.optimizedPlan.stats.rowCount
          println(s"[cbo] $sf $name cbo-off rowCount=${off.getOrElse(-1)}")
          spark.conf.set("spark.sql.cbo.enabled", "true")
        }
        probe("star", """SELECT * FROM cboe_lineitem
          | JOIN cboe_orders ON l_orderkey = o_orderkey
          | JOIN cboe_supplier ON l_suppkey = s_suppkey
          | JOIN cboe_part ON l_partkey = p_partkey""".stripMargin)
        probe("line", """SELECT * FROM cboe_region
          | JOIN cboe_nation ON n_regionkey = r_regionkey
          | JOIN cboe_customer ON c_nationkey = n_nationkey
          | JOIN cboe_orders ON o_custkey = c_custkey""".stripMargin)
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        Seq("cboe_lineitem", "cboe_orders", "cboe_supplier", "cboe_part",
          "cboe_customer", "cboe_nation", "cboe_region")
          .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
      }
    }
    spark.stop()
  }
}
