package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where the q187/q238 gate wall time goes — build vs the
  * direct adaptive query vs the persisted-index query (min of 3 each,
  * after one warm pass). Drove the r15 rework of the store-open cost.
  */
object ProbeIdxCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", 5000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val e = graft.Tables(spark, "/root/testdata/sf0.1").embeddings.localCheckpoint(true)
    val q = e.filter(col("vec_id") < 5).localCheckpoint(true)
    def t(name: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-18s min=${ts.min}%6.2fs runs=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    val dir = java.nio.file.Files.createTempDirectory("probe_cost")
    try {
      // warm
      Similarity.buildIvfIndex(e, "embedding", "vec_id", dir.toString, 100)
      Similarity.ivfTopKFromIndex(spark, dir.toString, q, "embedding", "vec_id", 10).count()
      Similarity.ivfTopKAdaptive(q, e, "embedding", "vec_id", 10, 100).count()
      t("build") {
        Similarity.buildIvfIndex(e, "embedding", "vec_id", dir.toString, 100)
      }
      t("direct_adaptive") {
        Similarity.ivfTopKAdaptive(q, e, "embedding", "vec_id", 10, 100).count()
      }
      t("from_index") {
        Similarity.ivfTopKFromIndex(spark, dir.toString, q, "embedding", "vec_id", 10).count()
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    spark.stop()
  }
}
