package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Approximate / sketch operators for corpus-scale profiling, where exact
  * answers would shuffle the world for a number nobody needs to 15 digits:
  *
  *   - HyperLogLog++ distinct counts ([[approxDistinct]]) — one pass, fixed
  *     memory, mergeable across partitions (Spark's native HLL aggregate);
  *   - approximate quantiles ([[approxQuantiles]]) — Greenwald-Khanna, one
  *     pass, bounded relative error;
  *   - Bloom filters ([[bloomFilter]], [[inBloom]]) — build a compact
  *     membership sketch of one relation's key column and prune another
  *     relation BEFORE its shuffle (the manual form of the
  *     InjectRuntimeFilter rewrite EngineSession.enableRuntimeFiltering
  *     turns on inside Catalyst);
  *   - Count-Min frequency sketch ([[countMinSketch]]) — heavy-hitter
  *     estimation without a full groupBy.
  *
  * All sketches are built distributed (per-partition sketches merged on the
  * driver by Spark's DataFrameStatFunctions) and applied as broadcast
  * side-data, so both the build and the probe stay one-pass at 100 TB.
  */
object Sketches {

  /** Approximate distinct counts per group: (groupCols..., approx_distinct).
    * `rsd` is the target relative standard deviation (HLL precision knob).
    */
  def approxDistinct(df: DataFrame, col0: String, groupCols: Seq[String] = Nil,
      rsd: Double = 0.05): DataFrame = {
    val agg = approx_count_distinct(col(col0), rsd).as("approx_distinct")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Approximate quantiles of a numeric column at the given probabilities
    * (one pass; `relativeError` 0 degenerates to an exact sort-based answer).
    */
  def approxQuantiles(df: DataFrame, col0: String, probabilities: Seq[Double],
      relativeError: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(col0, probabilities.toArray, relativeError).toSeq

  /** Build a Bloom filter over a key column: `expectedItems` insertions at
    * `fpp` false-positive rate. The sketch is a few MB regardless of input
    * size — broadcastable.
    */
  def bloomFilter(df: DataFrame, col0: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(col0, expectedItems, fpp)

  /** Prune `df` to rows whose key *might* be in the filter (no false
    * negatives: every true match survives; a small `fpp` fraction of
    * non-matches leaks through — follow with the exact join).
    */
  def inBloom(df: DataFrame, col0: String, bf: BloomFilter): DataFrame =
    bloomFlag(df, col0, bf).filter(col("in_bloom")).drop("in_bloom")

  /** Non-destructive probe: adds boolean `flagCol` = "might be in the
    * filter". Callers that must route BOTH outcomes (e.g. incremental dedup:
    * bloom-miss rows are definitely new and skip the exact join) use this
    * instead of the filtering [[inBloom]].
    */
  def bloomFlag(df: DataFrame, col0: String, bf: BloomFilter,
      flagCol: String = "in_bloom"): DataFrame = {
    // Native codegen probe over an EXPLICIT broadcast — not a Scala UDF
    // (boxes every row, breaks the whole-stage-codegen span on the probe
    // scan) and not Spark's BloomFilterMightContain-over-a-Literal (a
    // megabyte filter inlined as a plan literal gets re-walked by every
    // canonicalization/equality pass and re-serialized into every stage
    // that references the probe subtree — measured 2x on the incremental
    // dedup gate). The broadcast ships the filter once per executor and
    // the plan carries only the handle.
    val bcast = df.sparkSession.sparkContext.broadcast(bf)
    val probe = org.apache.spark.sql.GraftSqlBridge.columnOf(
      BloomMightContainBcast(bcast,
        org.apache.spark.sql.GraftSqlBridge.exprOf(col(col0).cast("long"))))
    // NULL keys flag false (a NULL is never "in" the filter)
    df.withColumn(flagCol, coalesce(probe, lit(false)))
  }

  /** Codegen'd Bloom-membership probe bound to a broadcast filter: the
    * generated code resolves the broadcast once per partition into a local
    * field and calls `mightContainLong` per row — the probe stays inside
    * whole-stage codegen with a constant-size plan node.
    */
  case class BloomMightContainBcast(
      bcast: org.apache.spark.broadcast.Broadcast[BloomFilter],
      child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == org.apache.spark.sql.types.LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom probe key must be LongType, got ${child.dataType}")

    override def prettyName: String = "bloom_might_contain"

    @transient private lazy val filter: BloomFilter = bcast.value

    override protected def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcastRef = ctx.addReferenceObj("bloomBcast", bcast,
        classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
      val bfVar = ctx.addMutableState(
        classOf[BloomFilter].getName, "bloomFilter",
        v => s"$v = (${classOf[BloomFilter].getName}) $bcastRef.value();")
      defineCodeGen(ctx, ev, c => s"$bfVar.mightContainLong($c)")
    }

    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
      copy(child = newChild)
  }

  /** Mergeable HLL sketches (Apache DataSketches, Spark's `hll_sketch_agg`
    * family): ONE binary sketch per group, storable alongside the batch
    * that produced it. This is the incremental-distinct pattern of a
    * 100 TB pipeline — per-batch/per-source sketches are built once at
    * ingest and later UNIONED ([[hllMergeEstimate]]) without ever
    * rescanning the batches, unlike a plain approx/exact distinct which
    * must see all data every time.
    */
  def hllSketchPerGroup(df: DataFrame, col0: String,
      groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(col0)).as("hll_sketch"))

  /** Union previously-built sketches (e.g. one per ingested batch) down to
    * distinct-count estimates per group — input is the sketch table, not
    * the data.
    */
  def hllMergeEstimate(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "hll_sketch"): DataFrame = {
    val merged =
      if (groupCols.isEmpty) sketches.agg(hll_union_agg(col(sketchCol)).as("hll_sketch"))
      else sketches.groupBy(groupCols.map(col): _*)
        .agg(hll_union_agg(col(sketchCol)).as("hll_sketch"))
    merged.withColumn("distinct_est", hll_sketch_estimate(col("hll_sketch")))
      .drop("hll_sketch")
  }

  /** Count-Min frequency sketch of a column: point-lookup estimated counts
    * with ε/δ error bounds, built in one distributed pass.
    */
  def countMinSketch(df: DataFrame, col0: String, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(col0, eps, confidence, seed)

  /* ---------- portable DataFrame-native Count-Min sketch ----------
   *
   * Spark's `stat.countMinSketch` merges per-partition sketches on the
   * driver into one opaque binary — fine as side-data, but not storable as
   * a TABLE, not mergeable in SQL, and not replayable by another engine.
   * The rows-CMS below keeps the sketch as a (d, bucket, cnt) DataFrame:
   *   - build is ONE scan + one shuffle whose key space is at most
   *     depth × width rows, regardless of input size;
   *   - per-batch sketch tables merge by summing counts — the same
   *     incremental-ingest shape as [[hllSketchPerGroup]]/[[hllMergeEstimate]],
   *     no rescan of history;
   *   - estimates join the probe set against the sketch with the sketch
   *     BROADCAST (bounded d×w rows), so the probe side never shuffles;
   *   - the hash family is engine-portable integer arithmetic
   *     (tid·a + b mod p mod w, all within int64), so a SQL oracle can
   *     replay the sketch bit-for-bit.
   */

  /** Pairwise-independent-ish hash family for the rows-CMS: one (a, b) per
    * depth row, h_i(x) = ((x·a_i + b_i) mod [[CmsPrime]]) mod width. Keys
    * must lie in [0, 2^32) ([[graft.operators.Dedup.portableTokenId]]'s
    * range) so x·a stays within int64 in every engine.
    */
  val CmsPerms: Seq[(Long, Long)] =
    Seq((1000003L, 12345L), (999983L, 54321L), (823117L, 98765L), (611953L, 13579L))
  val CmsPrime = 2147483647L // 2^31 − 1

  private def cmsBucket(key: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(key * a + b, lit(CmsPrime)), lit(width))

  /** The exploded (d, bucket) pairs for one key — ONE definition shared by
    * the build and probe sides, because the two mappings must stay
    * bit-identical or every estimate is silently garbage.
    */
  private def cmsDbExpr(keyCol: String, perms: Seq[(Long, Long)], width: Int): Column =
    explode(array(perms.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("d"), cmsBucket(col(keyCol), a, b, width).as("bucket"))
    }: _*))

  /** The key-domain precondition, enforced: keys outside [0, 2^32) would
    * overflow key·a — wrapping silently in Spark while the SQL oracle
    * errors or disagrees, breaking the replayability contract with no
    * diagnostic. Same un-prunable assert_true pattern as kmeans' dimension
    * guard: rows pass through, malformed ones fail loudly.
    */
  private def cmsKeyChecked(df: DataFrame, keyCol: String): DataFrame =
    df.filter(assert_true(col(keyCol) >= 0 && col(keyCol) < lit(1L << 32),
      lit(s"rows-CMS keys must lie in [0, 2^32): hash wider ids first " +
        s"(e.g. Dedup.portableTokenId)")).isNull)

  /** Build a rows-CMS over int64 keys in `keyCol` (hash string keys first,
    * e.g. with [[graft.operators.Dedup.portableTokenId]]): returns
    * (groupCols..., d, bucket, cnt) — one sketch per `groupCols` value
    * (e.g. per ingest batch), or one global sketch when empty. Each input
    * row contributes `weightCol` (default 1) to one bucket per depth row —
    * pass a weight to build from pre-aggregated (key, count) multisets
    * without re-expanding them. The explode happens map-side and partial
    * aggregation collapses it to ≤ depth × width rows per partition before
    * the shuffle.
    */
  def cmsBuildRows(df: DataFrame, keyCol: String, groupCols: Seq[String] = Nil,
      perms: Seq[(Long, Long)] = CmsPerms, width: Int = 64,
      weightCol: Option[String] = None): DataFrame = {
    val reserved = groupCols.toSet.intersect(Set("d", "bucket", "cnt", "__w"))
    require(reserved.isEmpty,
      s"cmsBuildRows reserves column name(s) ${reserved.mkString(", ")} for " +
        "the sketch output — rename the group column(s)")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    // a NULL weight would be skipped by sum() and a negative one would
    // subtract — both silently break the no-underestimate guarantee, so
    // malformed weights fail as loudly as out-of-domain keys do
    val weightChecked = weightCol.fold(df)(c =>
      df.filter(assert_true(col(c).isNotNull && col(c) >= 0,
        lit(s"rows-CMS weights ($c) must be non-null and non-negative")).isNull))
    cmsKeyChecked(weightChecked, keyCol)
      .select(groupCols.map(col) :+ w.as("__w") :+ cmsDbExpr(keyCol, perms, width).as("db"): _*)
      .select(groupCols.map(col) :+ col("__w") :+ col("db.d").as("d") :+ col("db.bucket").as("bucket"): _*)
      .groupBy((groupCols :+ "d" :+ "bucket").map(col): _*)
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Merge per-batch rows-CMS tables (built with the SAME perms/width) into
    * one global sketch by summing bucket counts — input is the sketch
    * table(s), never the data that produced them.
    */
  def cmsMergeRows(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point-lookup estimates: adds `estCol` = min over depth rows of the
    * probed bucket's count (0 for never-seen buckets) to `probes`. The
    * sketch side is broadcast (≤ depth × width rows by construction), so
    * the probe side keeps its partitioning; the only exchange is the
    * per-probe-row min aggregation. CMS guarantee: est ≥ true count.
    */
  def cmsEstimate(probes: DataFrame, sketch: DataFrame, keyCol: String,
      perms: Seq[(Long, Long)] = CmsPerms, width: Int = 64,
      estCol: String = "est"): DataFrame = {
    val inCols = probes.columns.toSeq
    require(!inCols.contains(estCol),
      s"cmsEstimate output column '$estCol' collides with an input column — " +
        "pass a different estCol")
    require(!inCols.contains("__rid"),
      "cmsEstimate reserves column name __rid")
    // a synthetic per-row id keeps duplicate probe rows distinct through
    // the explode→min round-trip (grouping on the value struct alone would
    // silently collapse them); ephemeral — grouped on, then dropped
    cmsKeyChecked(probes, keyCol)
      .withColumn("__rid", monotonically_increasing_id())
      .select(struct(inCols.map(col): _*).as("_p"), col("__rid"),
        cmsDbExpr(keyCol, perms, width).as("db"))
      .select(col("_p"), col("__rid"), col("db.d").as("d"), col("db.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col("_p"), col("__rid"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as(estCol))
      .select(inCols.map(c => col(s"_p.$c").as(c)) :+ col(estCol): _*)
  }

  /** Exact-vs-sketch profiling row for a column: exact distinct, HLL
    * estimate, and the relative error between them — the calibration check
    * a pipeline runs at small scale before trusting sketches at large.
    */
  def distinctErrorProfile(df: DataFrame, col0: String, rsd: Double = 0.05): DataFrame =
    df.agg(
        countDistinct(col(col0)).as("exact_distinct"),
        approx_count_distinct(col(col0), rsd).as("approx_distinct"))
      .select(col("exact_distinct"), col("approx_distinct"),
        round(abs(col("approx_distinct") - col("exact_distinct")).cast("double") /
          col("exact_distinct"), 6).as("rel_error"))
}
