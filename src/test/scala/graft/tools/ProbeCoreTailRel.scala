package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: RELATIONAL core+tail — a triangle over the capped graph
  * joined through a fact-table tail (c → orders → lineitem), via
  * MultiwayJoin directly. This is the shape where the r13 one-bag route
  * pays real costs the hybrid avoids: trie-building (range-sorting) the
  * 150k-row orders and 600k-row lineitem projections, where the hybrid
  * streams them through codegen'd hash joins against the tiny enumerated
  * core.
  */
object ProbeCoreTailRel {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val factor = if (args.length > 1) args(1).toInt else 1
    val t = graft.Tables(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src").orderBy("dst")
    val seed = (for { u <- 1001L to 1005L; v <- 1001L to 1005L; if u != v }
      yield (u, v)).toDF("src", "dst")
    def rep(df: org.apache.spark.sql.DataFrame, cols: (String, Long)*): org.apache.spark.sql.DataFrame =
      if (factor == 1) df
      else df.crossJoin(spark.range(factor).select(col("id").as("__rep")))
        .select(cols.map { case (c, off) => (col(c) + col("__rep") * off).as(c) }: _*)
    val edges = rep(t.orders
      .select((col("o_custkey") % 211).as("src"), (col("o_orderkey") % 211).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 6)
      .select("src", "dst").unionByName(seed).distinct(),
      "src" -> 10000L, "dst" -> 10000L)
      .localCheckpoint(true)
    // "string" mode: the order key rides as a STRING (entity-resolution
    // shape) — the one-bag route must dictionary-encode the whole tail
    // domain (distinct + range-sort + zipWithIndex + encode/decode joins)
    // where the hybrid hash-joins the strings directly
    val stringKeys = args.contains("string")
    def dKey(c: org.apache.spark.sql.Column) =
      if (stringKeys) concat(lit("ord_"), c.cast("string")) else c
    val ordTail0 = rep(
      t.orders.select(($"o_custkey" % 211).as("c"), $"o_orderkey".as("d")).distinct(),
      "c" -> 10000L, "d" -> 100000000L)
    val ordTail = ordTail0.select($"c", dKey($"d").as("d")).localCheckpoint(true)
    val liTail0 = rep(
      t.lineitem.select($"l_orderkey".as("d"), $"l_linenumber".cast("long").as("e")).distinct(),
      "d" -> 100000000L, "e" -> 10L)
    val liTail = liTail0.select(dKey($"d").as("d"), $"e").localCheckpoint(true)

    def rels() = Seq(
      (edges.select($"src".as("a"), $"dst".as("b")), Seq("a", "b")),
      (edges.select($"src".as("b"), $"dst".as("c")), Seq("b", "c")),
      (edges.select($"src".as("c"), $"dst".as("a")), Seq("c", "a")),
      // tail: every matched c fans out to its orders, each order to its
      // line numbers — distinct projections so wcoj set semantics == bag
      (ordTail, Seq("c", "d")),
      (liTail, Seq("d", "e")))

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[coretailrel] $label%-10s out=$n%10d time=$s%7.2fs")
      s
    }

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("a").agg(count(lit(1)).as("cnt")).count()

    for (i <- 1 to 3) {
      spark.conf.set("graft.wcoj.hybridCore", "true")
      time(s"hybrid#$i")(agg(graft.plans.MultiwayJoin.join(rels(), wcoj = true)))
      spark.conf.set("graft.wcoj.hybridCore", "false")
      time(s"onebag#$i")(agg(graft.plans.MultiwayJoin.join(rels(), wcoj = true)))
      spark.conf.unset("graft.wcoj.hybridCore")
      time(s"binary#$i")(agg(graft.plans.MultiwayJoin.join(rels())))
    }
    if (args.contains("explain")) {
      def ops(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
        df.groupBy("a").agg(count(lit(1)).as("cnt")).count()
        val p = df.queryExecution.executedPlan.toString
        val interesting = p.linesIterator.filter(l =>
          l.contains("Join") || l.contains("LeapFrog") || l.contains("Exchange") ||
            l.contains("Sort ")).map(_.take(150)).mkString("\n")
        println(s"[coretailrel] ---- $label plan ----\n$interesting")
      }
      spark.conf.set("graft.wcoj.hybridCore", "true")
      ops(graft.plans.MultiwayJoin.join(rels(), wcoj = true), "hybrid")
      spark.conf.unset("graft.wcoj.hybridCore")
      ops(graft.plans.MultiwayJoin.join(rels()), "binary")
    }
    spark.stop()
  }
}
