package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: exchange count in the upsert merge plan + file counts per
  * bucket dir + the StockCompare-16 shape timed standalone.
  */
object ProbeUpsert {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), lit(1).as("version"), col("text"))
      .localCheckpoint(true)
    def delta(v: Int, m: Int) = docs.filter(col("doc_id") % m === 0)
      .withColumn("version", lit(v))
    val (d2, d3) = (delta(2, 997).localCheckpoint(true),
      delta(3, 883).localCheckpoint(true))

    // job-level attribution: wall time per upsertBatch minus Spark job time
    // = driver/FS overhead (renames, exists probes, listings, scheduling)
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime()): Unit
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != 0L) jobTimes.add((t0, System.nanoTime() - t0)): Unit
      }
    })
    locally {
      val root = java.nio.file.Files.createTempDirectory("probe_upsert_attr")
      for ((b, i) <- Seq(docs, d2, d3).zipWithIndex) {
        jobTimes.clear()
        val t0 = System.nanoTime()
        graft.streaming.DocStreams.upsertBatch(b, s"$root/t",
          "doc_id", "version", buckets = 64)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val js = jobTimes.toArray(Array.empty[(Long, Long)])
        val jobSecs = js.map(_._2).sum / 1e9
        println(f"[upsert] attr batch=$i wall=$wall%5.2fs jobs=${js.length} " +
          f"jobTime=$jobSecs%5.2fs driverFs=${wall - jobSecs}%5.2fs " +
          s"perJob=${js.map(t => f"${t._2 / 1e9}%.2f").mkString(",")}")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
    // A/B: the same attribution with AQE off (each exchange otherwise
    // becomes its own query-stage job: 4 jobs/refresh instead of 2)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    locally {
      val root = java.nio.file.Files.createTempDirectory("probe_upsert_noaqe")
      for ((b, i) <- Seq(docs, d2, d3).zipWithIndex) {
        jobTimes.clear()
        val t0 = System.nanoTime()
        graft.streaming.DocStreams.upsertBatch(b, s"$root/t",
          "doc_id", "version", buckets = 64)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val js = jobTimes.toArray(Array.empty[(Long, Long)])
        val jobSecs = js.map(_._2).sum / 1e9
        println(f"[upsert] noaqe batch=$i wall=$wall%5.2fs jobs=${js.length} " +
          f"jobTime=$jobSecs%5.2fs driverFs=${wall - jobSecs}%5.2fs " +
          s"perJob=${js.map(t => f"${t._2 / 1e9}%.2f").mkString(",")}")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // decompose the exact StockCompare-16 engine lambda: which part of the
    // timed closure is NOT the upserts (temp-dir churn, readback, delete)
    for (round <- 1 to 3) {
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      var root: java.nio.file.Path = null
      val tDir = t { root = java.nio.file.Files.createTempDirectory("sc_upsert") }
      val tU1 = t { graft.streaming.DocStreams.upsertBatch(docs, s"$root/t", "doc_id", "version", 64) }
      val tU2 = t { graft.streaming.DocStreams.upsertBatch(d2, s"$root/t", "doc_id", "version", 64) }
      val tU3 = t { graft.streaming.DocStreams.upsertBatch(d3, s"$root/t", "doc_id", "version", 64) }
      val tRead = t { spark.read.parquet(s"$root/t").count(): Unit }
      val tDel = t { org.apache.commons.io.FileUtils.deleteDirectory(root.toFile) }
      println(f"[upsert] sc16 round=$round dir=$tDir%.2f u1=$tU1%.2f u2=$tU2%.2f " +
        f"u3=$tU3%.2f read=$tRead%.2f del=$tDel%.2f total=${tDir+tU1+tU2+tU3+tRead+tDel}%.2f")
    }
    for (round <- 1 to 3) {
      val root = java.nio.file.Files.createTempDirectory("probe_upsert")
      val t0 = System.nanoTime()
      val per = Seq(docs, d2, d3).map { b =>
        val s0 = System.nanoTime()
        graft.streaming.DocStreams.upsertBatch(b, s"$root/t",
          "doc_id", "version", buckets = 64)
        (System.nanoTime() - s0) / 1e9
      }
      val n = spark.read.parquet(s"$root/t").count()
      println(f"[upsert] round=$round ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n " +
        s"per=${per.map(s => f"$s%.2f").mkString(",")}")
      if (round == 1) {
        val dirs = new java.io.File(s"$root/t").listFiles().filter(_.isDirectory)
        val fileCounts = dirs.map(_.listFiles()
          .count(f => f.isFile && f.getName.endsWith(".parquet")))
        println(s"[upsert] bucketDirs=${dirs.length} " +
          s"filesPerDir(min,max)=(${fileCounts.min},${fileCounts.max})")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
    // A/B: the same engine rounds with the batch cache off
    spark.conf.set("graft.upsert.cacheBatch", "false")
    for (round <- 1 to 3) {
      val root = java.nio.file.Files.createTempDirectory("probe_upsert_nc")
      val t0 = System.nanoTime()
      val per = Seq(docs, d2, d3).map { b =>
        val s0 = System.nanoTime()
        graft.streaming.DocStreams.upsertBatch(b, s"$root/t",
          "doc_id", "version", buckets = 64)
        (System.nanoTime() - s0) / 1e9
      }
      val n = spark.read.parquet(s"$root/t").count()
      println(f"[upsert] nocache round=$round ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n " +
        s"per=${per.map(s => f"$s%.2f").mkString(",")}")
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
    spark.conf.unset("graft.upsert.cacheBatch")

    // the StockCompare-16 stock side, timed with the same warm state
    for (round <- 1 to 3) {
      val root = java.nio.file.Files.createTempDirectory("probe_upsert_stock")
      val t0 = System.nanoTime()
      docs.write.parquet(s"$root/v1")
      var v = 1
      for (b <- Seq(d2, d3)) {
        val cur = spark.read.parquet(s"$root/v$v")
        cur.unionByName(b)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy(col("version").desc)))
          .filter(col("rn") === 1).drop("rn")
          .write.parquet(s"$root/v${v + 1}")
        v += 1
      }
      val n = spark.read.parquet(s"$root/v$v").count()
      println(f"[upsert] stock round=$round ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
    spark.stop()
  }
}
