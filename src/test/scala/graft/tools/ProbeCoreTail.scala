package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: the q240 core+tail shape (triangle + 3-hop tail) at a
  * given SF through the three candidate routes —
  *   hybrid   : wcoj=true, core bag + binary periphery (r14 default)
  *   one-bag  : wcoj=true, graft.wcoj.hybridCore=false (the r13 route)
  *   binary   : wcoj=false + distinct (set semantics via the GHD route)
  * — to verify the hybrid is ≥ both pure routes where it fires.
  */
object ProbeCoreTail {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
    val pat =
      if (args.length > 1 && args(1) == "s7tail")
        "(a)-[]->(b)-[]->(c)-[]->(d)-[]->(e); (a)-[]->(e); (a)-[]->(c); (b)-[]->(d); (c)-[]->(e); (e)-[]->(t1)-[]->(t2)"
      else "(a)-[]->(b)-[]->(c); (c)-[]->(a); (c)-[]->(d)-[]->(e)-[]->(f)"

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[coretail] $label%-14s out=$n%10d time=$s%7.2fs")
      s
    }

    def run(label: String, hybrid: Boolean): Unit = {
      spark.conf.set("graft.wcoj.hybridCore", hybrid.toString)
      for (i <- 1 to 3) time(s"$label#$i") {
        g.pattern(pat, wcoj = true)
          .groupBy("a").agg(count(lit(1)).as("cnt")).count()
      }
      spark.conf.unset("graft.wcoj.hybridCore")
    }

    run("hybrid", hybrid = true)
    run("onebag", hybrid = false)
    for (i <- 1 to 3) time(s"binary#$i") {
      g.pattern(pat).distinct()
        .groupBy("a").agg(count(lit(1)).as("cnt")).count()
    }
    // total match mass for context
    println("[coretail] matches=" +
      g.pattern(pat, wcoj = true).count())
    spark.stop()
  }
}
