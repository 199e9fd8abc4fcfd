package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: q228 (S7) attribute-order sensitivity on the seeded
  * capped graph at sf0.1 — the gate ballooned to 17 s through the planner
  * order while ScaleCheck's hand-ordered run took 0.5 s.
  */
object ProbeS7Order {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
    def r(n1: String, n2: String) =
      (edges.select(col("src").as(n1), col("dst").as(n2)), Seq(n1, n2))
    // S7: ab, bc, cd, de, ae, ac, bd, ce
    val rels = Seq(r("a", "b"), r("b", "c"), r("c", "d"), r("d", "e"),
      r("a", "e"), r("a", "c"), r("b", "d"), r("c", "e"))
    for (order <- Seq(
        Seq("a", "b", "c", "d", "e"),
        Seq("c", "a", "b", "d", "e"),
        Seq("c", "b", "a", "d", "e"),
        Seq("e", "d", "c", "b", "a"),
        Seq("c", "e", "a", "b", "d"))) {
      val t0 = System.nanoTime()
      val n = graft.wcoj.WcojJoin.leapfrogCatalyst(spark, rels, order).count()
      println(f"[s7] order=${order.mkString(",")} out=$n%8d " +
        f"time=${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    // the planner's own order for this bag
    val o = graft.plans.MultiwayJoin.wcojAttrOrder(
      rels, Set("a", "b", "c", "d", "e"), cardinality = true)
    println(s"[s7] planner order: ${o.mkString(",")}")
    spark.stop()
  }
}
