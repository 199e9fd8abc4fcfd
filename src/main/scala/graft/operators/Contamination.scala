package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection: which held-out documents share
  * k-token shingles with the training split?
  *
  * The check is an inverted-index semi join on the shingle value — the 100 TB
  * shape: explode both splits to (doc, shingle), hash-partition by shingle,
  * count matches per held-out document. No doc×doc work anywhere; the join
  * key is the shingle itself, so skew is bounded by shingle frequency (cap
  * ultra-frequent shingles upstream if a corpus needs it).
  */
object Contamination {

  /** Per held-out doc: how many of its distinct `k`-token shingles appear in
    * ANY training doc. Returns (doc_id, n_shingles, n_shared, shared_frac)
    * for contaminated docs (n_shared ≥ 1).
    *
    * `isTrain` must be a deterministic predicate over the input's columns
    * (e.g. [[Sampling.hashSplit]]'s md5-bucket rule) so the split is
    * reproducible across engines and runs.
    */
  def shingleOverlap(df: DataFrame, textCol: String, idCol: String,
      isTrain: org.apache.spark.sql.Column, k: Int = 3): DataFrame = {
    val withSplit = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      isTrain.as("is_train"))
    val shingles = withSplit.select(col("doc_id"), col("is_train"),
      explode(Dedup.shingleArray(col("text"), k)).as("shingle"))
    val trainShingles = shingles.filter(col("is_train")).select("shingle").distinct()
    val holdout = shingles.filter(!col("is_train"))
    val shared = holdout
      .join(trainShingles, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val sizes = holdout.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    shared.join(sizes, "doc_id" :: Nil)
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6).as("shared_frac"))
  }
}
