package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: file counts per partition dir in the wide-compaction
  * spec's layout, before and after the pooled compaction.
  */
object ProbeCompact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("probe_compact").toString + "/t"
    val df = (0L until 400L).map(i => (i, i % 100, s"row $i"))
      .toDF("id", "grp", "text")
    for (k <- 0 until 2)
      df.filter(col("id") % 2 === k).repartition(2)
        .write.mode("append").partitionBy("grp").parquet(dir)
    def counts(): Map[String, Int] =
      new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(d => d.getName ->
          d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet")))
        .toMap
    val before = counts()
    println(s"dirs=${before.size} hist=${before.values.groupBy(identity).map { case (k, v) => k -> v.size }.toSeq.sorted}")
    val report = graft.operators.Layout.compactPartitions(spark, dir, 1L << 30, parallelism = 8)
    println(s"report=${report.size} peak=${graft.operators.Layout.lastCompactPeakConcurrency}")
    val after = counts()
    println(s"after hist=${after.values.groupBy(identity).map { case (k, v) => k -> v.size }.toSeq.sorted}")
    val missed = before.filter(_._2 > 1).keySet -- report.map(_._1).toSet
    println(s"fragmented-but-missed=${missed.toSeq.sorted.take(20)}")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
    spark.stop()
  }
}
