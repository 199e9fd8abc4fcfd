import org.apache.spark.sql.functions._

object GhdProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src").orderBy("dst")
    val seed = (for { u <- 1001L to 1005L; v <- 1001L to 1005L; if u != v }
      yield (u, v)).toDF("src", "dst")
    val edges = graft.Tables(spark, "/root/testdata/sf0.001").orders
      .select((col("o_custkey") % 211).as("src"), (col("o_orderkey") % 211).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 6)
      .select("src", "dst").unionByName(seed).distinct()
      .localCheckpoint(true)
    val g = graft.graph.PropertyGraph.fromEdges(edges)
    val m6 = g.pattern("(a)-[]->(b)-[]->(c)-[]->(d)-[]->(e); (a)-[]->(e); (b)-[]->(e); (c)-[]->(e)", wcoj = true)
    val p6 = m6.queryExecution.executedPlan.toString
    println("[plan] S6 leapfrog nodes: " + "LeapFrogJoin".r.findAllIn(p6).size)
    val m7 = g.pattern("(a)-[]->(b)-[]->(c)-[]->(d)-[]->(e); (a)-[]->(e); (a)-[]->(c); (b)-[]->(d); (c)-[]->(e)", wcoj = true)
    val p7 = m7.queryExecution.executedPlan.toString
    println("[plan] S7 leapfrog nodes: " + "LeapFrogJoin".r.findAllIn(p7).size)
    println("[plan] S7 joins: " + p7.split("\n").filter(l => l.contains("Join")).take(12).mkString(" ;; "))
    spark.stop()
  }
}
