package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: the core+tail hybrid on a SYNTHETIC shape where the three
  * routes genuinely diverge —
  *   - the triangle core runs on a dense-ish random digraph (n nodes,
  *     degree d): a binary plan materializes the n·d² path-2 intermediate
  *     where WCOJ is bounded by the (much smaller) triangle count;
  *   - the tail relations are LARGE and non-nullable (spark.range), so the
  *     r13 whole-query one-bag route actually fires when forced and pays
  *     trie-building (range-sort) over tail rows the hybrid streams through
  *     hash joins.
  * All columns non-nullable longs — every route eligible; the comparison is
  * pure plan choice.
  */
object ProbeCoreTailSynth {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nodes = 50000L
    val deg = 30
    // deterministic pseudo-random digraph: node i -> hash-scattered dsts
    val edges = spark.range(nodes * deg)
      .select((col("id") % nodes).as("src"),
        pmod(hash((col("id") * 2654435761L).cast("long")).cast("long"), lit(nodes)).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    // tail c -> d: each node fans to `factor` keys; d -> e: fanout 2
    val ordTail = spark.range(nodes * factor)
      .select((col("id") % nodes).as("c"), col("id").as("d"))
      .localCheckpoint(true)
    val liTail = spark.range(nodes * factor * 2)
      .select(shiftright(col("id"), 1).as("d"), col("id").bitwiseAND(lit(1L)).as("e"))
      .localCheckpoint(true)

    def rels() = Seq(
      (edges.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b")),
      (edges.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c")),
      (edges.select(col("src").as("c"), col("dst").as("a")), Seq("c", "a")),
      (ordTail, Seq("c", "d")),
      (liTail, Seq("d", "e")))

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[coretailsynth] $label%-10s out=$n%10d time=$s%7.2fs")
      s
    }
    def agg(df: DataFrame): Long =
      df.groupBy("a").agg(count(lit(1)).as("cnt")).count()
    def routeOf(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      val lf = p.contains("LeapFrogJoin")
      val bin = Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin").exists(p.contains)
      if (lf && bin) "hybrid" else if (lf) "onebag" else "binary"
    }

    // route sanity
    spark.conf.set("graft.wcoj.hybridCore", "true")
    println("[coretailsynth] route(hybrid-conf)=" + routeOf(graft.plans.MultiwayJoin.join(rels(), wcoj = true)))
    spark.conf.set("graft.wcoj.hybridCore", "false")
    println("[coretailsynth] route(onebag-conf)=" + routeOf(graft.plans.MultiwayJoin.join(rels(), wcoj = true)))
    spark.conf.unset("graft.wcoj.hybridCore")

    for (i <- 1 to 3) {
      spark.conf.set("graft.wcoj.hybridCore", "true")
      time(s"hybrid#$i")(agg(graft.plans.MultiwayJoin.join(rels(), wcoj = true)))
      spark.conf.set("graft.wcoj.hybridCore", "false")
      time(s"onebag#$i")(agg(graft.plans.MultiwayJoin.join(rels(), wcoj = true)))
      spark.conf.unset("graft.wcoj.hybridCore")
      time(s"binary#$i")(agg(graft.plans.MultiwayJoin.join(rels())))
    }
    spark.stop()
  }
}
