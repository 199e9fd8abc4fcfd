package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: column-register vs array-register streaming HLL at the
  * SAME p, interleaved min-of-3 — is the p ≤ 8 route boundary actually
  * the faster choice, or is the single array Aggregator cheaper than 2^p
  * conditional max aggregates even at small p?
  */
object ProbeHllForms {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def stream = graft.Tables.adaptEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
    var n = 0
    def run(form: String, p: Int): Double = {
      n += 1
      val name = s"probe_hll_$n"
      val agg =
        if (form == "columns")
          graft.streaming.EventStreams.windowedDistinctHll(
            stream, "user_id", "1 hour", Some("0 seconds"), p)
        else
          graft.streaming.EventStreams.windowedDistinctHllArray(
            stream, "user_id", "1 hour", Some("0 seconds"), p)
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStreams.withStatePartitions(spark, 4) {
        agg.writeStream.outputMode("append").format("memory")
          .queryName(name).start()
      }
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = spark.table(name).count()
      spark.catalog.dropTempView(name)
      println(f"[hll] $form%8s p=$p%-3d $dt%6.2fs rows=$rows")
      dt
    }
    for (p <- Seq(6, 8)) {
      val c = (1 to 3).map(_ => run("columns", p)).min
      val a = (1 to 3).map(_ => run("array", p)).min
      println(f"[hll] p=$p min columns=$c%.2f array=$a%.2f ratio=${c / a}%.2f")
    }
    spark.stop()
  }
}
