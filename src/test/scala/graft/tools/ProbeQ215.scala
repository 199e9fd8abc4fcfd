package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the q215 sentinel tail (round-12 directive): the gate pays
  * TWO far-future sentinel micro-batches after the data batch — the first
  * advances both watermarks, the second forces the batch in which the
  * evicted null rows deterministically emit. Variant B drops the second
  * WRITE and instead relies on the engine's no-data micro-batch
  * (spark.sql.streaming.noDataMicroBatches, on by default) to surface the
  * eviction rows, polling the sink row count to a fixpoint. If B matches
  * A's rows at lower wall cost, the gate adopts it; if not (or if the race
  * with stop() reappears), the decomposition tells us the residual is
  * state-store floor, not harness waits.
  */
object ProbeQ215 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(variant: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val name = s"probe_oivj_$variant${System.nanoTime()}"
      val root = java.nio.file.Files.createTempDirectory("graft_probe_oivj")
      val sent = s"$root/sent"
      try {
        new java.io.File(sent).mkdirs()
        val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
        val ev = graft.Tables(spark, sfDir).events
          .select("event_id", "user_id", "ts", "event_type")
        val sentSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType)))
        def side(tpe: String) = graft.Tables.adaptEventTs(
            spark.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet").parquet(sfDir))
          .select("event_id", "user_id", "ts", "event_type")
          .unionByName(spark.readStream.schema(sentSchema).parquet(sent))
          .filter(col("event_type") === tpe).drop("event_type")
        val joined = graft.streaming.EventStreams.intervalJoin(side("click"), side("view"),
            "user_id", toleranceSeconds = 1800, watermark = "0 seconds",
            joinType = "left_outer")
          .select(col("event_id").as("click_id"),
            col("event_id_r").as("view_id"), col("user_id"),
            col("ts").as("click_ts"), col("ts_r").as("view_ts"))
        val q = graft.streaming.EventStreams.withStatePartitions(spark, 4) {
          joined.writeStream.outputMode("append").format("memory")
            .queryName(name).start()
        }
        val rows =
          try {
            q.processAllAvailable()
            val mx = ev.agg(max("ts")).collect()(0).getTimestamp(0)
            import spark.implicits._
            def sentinel(h: Long): Unit = {
              val far = new java.sql.Timestamp(mx.getTime + h * 3600 * 1000)
              Seq((-2 * h, -1L, far, "click"), (-2 * h - 1, -1L, far, "view"))
                .toDF("event_id", "user_id", "ts", "event_type")
                .write.mode("append").parquet(sent)
              q.processAllAvailable()
            }
            variant match {
              case "two_sentinels" =>
                sentinel(48); sentinel(96)
                spark.table(name).filter(col("user_id") >= 0).count()
              case "one_sentinel_poll" =>
                sentinel(48)
                // no-data batches surface evictions without a second write:
                // poll the sink to a fixpoint (bounded wait)
                var last = -1L
                var cur = spark.table(name).filter(col("user_id") >= 0).count()
                var spins = 0
                while (cur != last && spins < 40) {
                  last = cur
                  Thread.sleep(250)
                  q.processAllAvailable()
                  cur = spark.table(name).filter(col("user_id") >= 0).count()
                  spins += 1
                }
                cur
            }
          } finally q.stop()
        spark.catalog.dropTempView(name)
        (rows, (System.nanoTime() - t0) / 1e9)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }

    for (v <- Seq("two_sentinels", "one_sentinel_poll", "two_sentinels", "one_sentinel_poll")) {
      val (rows, secs) = run(v)
      println(f"[probe215] $v%-18s rows=$rows%8d time=$secs%6.2fs")
    }
    spark.stop()
  }
}
