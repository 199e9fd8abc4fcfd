package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: q184's per-query overlap at each SF (fixed probes = 3). */
object ProbeQ184 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = graft.Tables(spark, s"/root/testdata/$sf").embeddings
      val q = e.filter(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(q, e, "embedding", "vec_id", k = 10)
        .select("query_id", "vec_id")
      val nCents = e.filter(col("vec_id") % 100 === 0).count()
      val probes = math.max(3, math.ceil(nCents * 0.4).toInt)
      val ivf = Similarity.ivfTopK(q, e, "embedding", "vec_id",
          k = 10, centroidMod = 100, probes = probes)
        .select("query_id", "vec_id")
      val ov = exact.join(ivf, Seq("query_id", "vec_id"))
        .groupBy("query_id").agg(count(lit(1)).as("overlap"))
        .orderBy("query_id").collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"[q184] $sf probes=$probes cells=$nCents overlaps $ov")
    }
    spark.stop()
  }
}
