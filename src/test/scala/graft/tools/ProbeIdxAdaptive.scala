package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: observed overlap of the persisted-index mass-adaptive
  * ANN path (q238's subject) against the exact ranking, per shipped SF —
  * the measurement behind the gate's floor.
  */
object ProbeIdxAdaptive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = graft.Tables(spark, s"/root/testdata/$sf").embeddings
      val q = e.filter(col("vec_id") < 5)
      val dir = java.nio.file.Files.createTempDirectory("probe_ivfidx")
      Similarity.buildIvfIndex(e, "embedding", "vec_id", dir.toString, centroidMod = 100)
      try {
        val exact = Similarity.cosineTopK(q, e, "embedding", "vec_id", k = 10)
          .select("query_id", "vec_id")
        val stored = Similarity.ivfTopKFromIndexAdaptive(spark, dir.toString, q,
            "embedding", "vec_id", k = 10, massFrac = 0.25)
          .select("query_id", "vec_id")
        val hit = exact.join(stored, Seq("query_id", "vec_id")).count()
        val probes = stored.count()
        println(s"[probe] $sf overlap=$hit/50 stored_rows=$probes")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    spark.stop()
  }
}
