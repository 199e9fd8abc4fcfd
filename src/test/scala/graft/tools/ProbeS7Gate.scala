package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: the FULL q228 gate path (pattern(wcoj=true) → groupBy →
  * route pin) at sf0.1, vs the same with the edge frame pre-pinned — to
  * attribute the 17 s bench reading between re-computation of the capped
  * edge subplan (8 edge copies + plan-time cardinality jobs) and the
  * enumeration itself.
  */
object ProbeS7Gate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[s7gate] $label%-12s out=$n%8d time=${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    // the gate exactly as SparkEntry runs it
    for (i <- 1 to 2)
      time(s"gate#$i") {
        graft.SparkEntry.queries("q228_s7_dense5")(spark, sfDir).count()
      }
    // same pattern, edges pre-pinned
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src").orderBy("dst")
    val seed = (for { u <- 1001L to 1005L; v <- 1001L to 1005L; if u != v }
      yield (u, v)).toDF("src", "dst")
    val edges = graft.Tables(spark, sfDir).orders
      .select((col("o_custkey") % 211).as("src"), (col("o_orderkey") % 211).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 6)
      .select("src", "dst").unionByName(seed).distinct()
      .localCheckpoint(true)
    val g = graft.graph.PropertyGraph.fromEdges(edges)
    for (i <- 1 to 2)
      time(s"pinned#$i") {
        val m = g.pattern(
          "(a)-[]->(b)-[]->(c)-[]->(d)-[]->(e); (a)-[]->(e); (a)-[]->(c); (b)-[]->(d); (c)-[]->(e)",
          wcoj = true)
        m.groupBy("a").agg(count(lit(1)).as("cnt")).orderBy("a").count()
      }
    spark.stop()
  }
}
