package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the q215 state-store floor (round-12 directive #7):
  * the four-store outer interval join timed under the default
  * HDFS-backed state store vs RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`), same sentinel
  * machinery as the gate. Decides whether the 15.5×-vs-batch premium
  * has a provider component worth switching for at this SF.
  */
object ProbeQ215Rocks {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(provider: Option[String], parts: Int = 4): (Long, Double) = {
      provider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      val t0 = System.nanoTime()
      val name = s"probe_rocks_${System.nanoTime()}"
      val root = graft.queries.GateTmp.dir("graft_probe_rocks")
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
        val q = graft.streaming.EventStreams.withStatePartitions(spark, parts) {
          joined.writeStream.outputMode("append").format("memory")
            .option("checkpointLocation", s"$root/ckpt")
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
            sentinel(48)
            def maxDataBatch = q.recentProgress.filter(_.numInputRows > 0)
              .map(_.batchId).foldLeft(-1L)(math.max)
            val bSent = maxDataBatch
            def evictionBatchRan = q.recentProgress.exists(_.batchId > bSent)
            val deadline = System.nanoTime() + 3L * 1000 * 1000 * 1000
            while (!evictionBatchRan && System.nanoTime() < deadline) {
              Thread.sleep(25)
              q.processAllAvailable()
            }
            if (!evictionBatchRan) sentinel(96)
            spark.table(name).filter(col("user_id") >= 0).count()
          } finally q.stop()
        spark.catalog.dropTempView(name)
        (rows, (System.nanoTime() - t0) / 1e9)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }

    val rocks = Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run(None) // warm (codegen, file listing)
    for (i <- 1 to 3) {
      val (nH, tH) = run(None)
      val (nR, tR) = run(rocks)
      require(nH == nR, s"providers disagree: $nH vs $nR")
      println(f"[rocks] iter=$i hdfs=$tH%6.2fs rocksdb=$tR%6.2fs rows=$nH")
    }
    // state-partition sweep under the default provider: 4 join state
    // stores x P partitions = 4P store instances per micro-batch; at this
    // state volume the commit count may dominate
    for (i <- 1 to 3; parts <- Seq(1, 2, 4, 8)) {
      val (n, t) = run(None, parts)
      println(f"[parts] iter=$i parts=$parts%-2d time=$t%6.2fs rows=$n")
    }
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.stop()
  }
}
