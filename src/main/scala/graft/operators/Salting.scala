package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the scale concern SURVEY §7.3 notes
  * the reference handles with its share optimizer, and stock Spark handles
  * partially with AQE skew-join — which only helps sort-merge paths).
  *
  * Salted broadcast-free equi join: the skewed (large) side gets a random
  * salt in [0, factor); the small-but-not-broadcastable side is replicated
  * `factor` times with every salt value. The join key becomes (key, salt),
  * splitting each hot key's rows across `factor` tasks.
  */
object Salting {

  /** Join types where replicating the right side is multiset-safe: an
    * unmatched RIGHT row appears `factor` times under right/full outer, so
    * those are rejected rather than silently wrong.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "cross",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")

  /** @param left  the skewed side (salted randomly per row)
    * @param right the replicated side (factor× blow-up — keep it the smaller input)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor >= 1)
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would emit unmatched right rows $factor times; " +
        "use inner/left/left_semi/left_anti (salt the other side for right-skew)")
    val salted = left.withColumn("__salt", (rand(seed = 42) * factor).cast("int"))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-k hot keys of a column by frequency — use to decide whether salting
    * is worth the replication (one pass, partial-agg'd).
    */
  def hotKeys(df: DataFrame, key: String, k: Int): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(k)
}
