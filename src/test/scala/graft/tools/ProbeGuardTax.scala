package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: the skew guard's clean-input tax in isolation (the
  * ScaleCheck `wcoj_guard_tax` pair without the 5-minute rest of the tool)
  * — guard on vs off on the unskewed replicated triangle at the default
  * 64 MB cell budget, alternated to cancel warm-up drift.
  */
object ProbeGuardTax {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.Tables(spark, "/root/testdata/sf0.1").orders
      .select((col("o_custkey") % 211).as("src"), (col("o_orderkey") % 211).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    for (factor <- Seq(1, 10)) {
      val edges = (if (factor == 1) base
        else base.crossJoin(spark.range(factor).select(col("id").as("__rep")))
          .select((col("src") + col("__rep") * 1000L).as("src"),
            (col("dst") + col("__rep") * 1000L).as("dst")))
        .localCheckpoint(true)
      def run(): Long = graft.wcoj.WcojJoin.leapfrog(spark,
        Seq((edges.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b")),
          (edges.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c")),
          (edges.select(col("src").as("c"), col("dst").as("a")), Seq("c", "a"))),
        Seq("a", "b", "c")).count()
      run(); run() // warm
      var onT = Double.MaxValue; var offT = Double.MaxValue
      for (i <- 1 to 5; on <- if (i % 2 == 0) Seq(true, false) else Seq(false, true)) {
        spark.conf.set("graft.wcoj.skewGuard", on.toString)
        val t0 = System.nanoTime(); run()
        val s = (System.nanoTime() - t0) / 1e9
        if (on) onT = math.min(onT, s) else offT = math.min(offT, s)
      }
      println(f"[probe] guard_tax x$factor%-3d on=$onT%6.2fs off=$offT%6.2fs " +
        f"tax=${(onT / offT - 1) * 100}%+5.1f%% route=" +
        spark.conf.get("graft.wcoj.lastRoute", "?"))
    }
    spark.stop()
  }
}
