package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for q214's cross-box wall-time swing (round-12
  * finding #4 / directive #4): the SAME three-cycle rolling-crawl ingest
  * run twice, once with every gate artifact (source dir, signature store,
  * output, stream checkpoint) on a DISK-backed temp root and once on
  * tmpfs — per-cycle wall times printed for both. A large disk-vs-tmpfs
  * gap on identical code is the committed proof that the swing is
  * checkpoint/store I/O outside the code's control, which is why the gate
  * now places its root via [[graft.queries.GateTmp]].
  */
object ProbeQ214Decomp {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, sfDir).documents
    val snum = expr("CAST(substring(source, 4, 10) AS INT)")

    def run(base: java.nio.file.Path, label: String): Unit = {
      val root = java.nio.file.Files.createTempDirectory(base, "probe_ingest")
      val (src, store, out) = (s"$root/src", s"$root/store", s"$root/out")
      try {
        val t0 = System.nanoTime()
        docs.filter(snum < 7).write.mode("append").parquet(src)
        val q = graft.streaming.DocStreams.ingestDedupStream(
          spark.readStream.schema(docs.schema).parquet(src), store, out,
          s"$root/ckpt", threshold = 0.3, portableIds = true)
        val cycles = scala.collection.mutable.ArrayBuffer.empty[Double]
        def cycle(f: => Unit): Unit = {
          val c0 = System.nanoTime(); f; q.processAllAvailable()
          cycles += (System.nanoTime() - c0) / 1e9
        }
        try {
          cycle(())
          cycle(docs.filter(snum >= 7 && snum < 14).write.mode("append").parquet(src))
          cycle(docs.filter(snum >= 14).write.mode("append").parquet(src))
        } finally q.stop()
        val n = spark.read.parquet(out).count()
        val total = (System.nanoTime() - t0) / 1e9
        println(f"[q214] $label%-6s total=$total%6.2fs " +
          s"cycles=${cycles.map(s => f"$s%.2f").mkString(",")} rows=$n")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }

    val disk = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val shm = java.nio.file.Paths.get("/dev/shm")
    run(disk, "warm") // warm codegen/listing once
    for (i <- 1 to 3) {
      run(disk, s"disk#$i")
      if (java.nio.file.Files.isWritable(shm)) run(shm, s"tmpfs#$i")
    }
    spark.stop()
  }
}
