package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are pure DataFrame plans —
  * shuffles only on groupBy/join keys, no driver-side state — so the same
  * code runs on a 1000-executor cluster.
  */
object Dedup {

  /** Exact dedup by content hash: keep the lowest id per identical text.
    * One shuffle on the 128-bit hash — never on the raw text bytes.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Fixed MinHash permutation parameters (aᵢ·tid + bᵢ) mod P. */
  final case class Perm(a: Long, b: Long)
  val DefaultPerms: Seq[Perm] = Seq(
    Perm(2, 1), Perm(3, 5), Perm(5, 11), Perm(7, 17),
    Perm(11, 23), Perm(13, 31), Perm(17, 41), Perm(19, 47))
  val MinHashMod = 10007L

  /** (doc_id, tok) distinct token pairs — the exploded set representation. */
  def tokenSet(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))

  /** (doc_id, tok) distinct k-token shingles. Shingles, not unigrams, are
    * what MinHash needs for discrimination: on a corpus with a small shared
    * vocabulary every unigram set is near-identical (this test corpus has 31
    * distinct tokens!) and LSH degenerates to all-pairs; k-shingles grow the
    * universe to |V|^k and make Jaccard meaningful.
    */
  def shingleSet(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val shingles = when(size(toks) >= k,
      array_distinct(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array())
    df.select(col(idCol).as("doc_id"), explode(shingles).as("tok"))
  }

  /** Global token dictionary: tok → dense id by lexicographic rank.
    *
    * Scale note: ids are assigned by a range-partitioned parallel sort +
    * per-partition zipWithIndex, NOT a single-partition row_number window —
    * the same deterministic ranks (identical to the DuckDB oracle's
    * row_number-over-sorted-tokens), with no global-rank bottleneck. When an
    * engine-independent id is not required, prefer hashing the token
    * directly (minHashLsh's useDictionary=false path).
    */
  def tokenDict(tokenSets: DataFrame): DataFrame = {
    val spark = tokenSets.sparkSession
    val sorted = tokenSets.select("tok").distinct().orderBy("tok")
    val withId = sorted.rdd.map(_.getString(0)).zipWithIndex()
      .map { case (tok, i) => Row(tok, i + 1L) }
    spark.createDataFrame(withId, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tok", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tid", org.apache.spark.sql.types.LongType))))
  }

  /** K MinHash signature columns sig_0..sig_{k-1} per doc. */
  def minHashSignatures(df: DataFrame, textCol: String, idCol: String,
      perms: Seq[Perm] = DefaultPerms): DataFrame = {
    val ts = tokenSet(df, textCol, idCol)
    val withTid = ts.join(tokenDict(ts), "tok" :: Nil).select("doc_id", "tid")
    val aggs = perms.zipWithIndex.map { case (p, i) =>
      min((col("tid") * p.a + p.b) % MinHashMod).as(s"sig_$i")
    }
    withTid.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH candidate pairs with exact-Jaccard verification.
    *
    * Signatures are banded (`bandSize` sigs per band); docs sharing any band
    * value become candidates (the only pairwise work — never O(N²)); each
    * candidate pair is verified with exact Jaccard over token-id sets and
    * kept if ≥ `threshold`. Returns (doc1, doc2, jaccard).
    */
  /** @param useDictionary false (default) = xxhash64 shingle ids, fully
    *   parallel — the 100 TB path; true = lexicographic-rank shingle ids
    *   (needed ONLY for the cross-engine oracle, costs a global window — see
    *   [[tokenDict]]). MinHash quality is identical either way (ids are just
    *   labels; jaccard estimates depend only on set membership), and the
    *   reported pairs are always exact-Jaccard verified.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, perms: Seq[Perm] = DefaultPerms, bandSize: Int = 4,
      shingle: Int = 3, useDictionary: Boolean = false): DataFrame = {
    val ts = if (shingle <= 1) tokenSet(df, textCol, idCol) else shingleSet(df, textCol, idCol, shingle)
    // persist: the token-id set feeds signatures, sizes and both sides of the
    // intersection join — without it Spark recomputes the explode+dict join
    // in every branch. Small relative to the corpus (ids, not text).
    val withTid = (
      if (useDictionary) ts.join(tokenDict(ts), "tok" :: Nil).select("doc_id", "tid")
      else ts.select(col("doc_id"), pmod(xxhash64(col("tok")), lit(1000003L)).as("tid"))
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aggs = perms.zipWithIndex.map { case (p, i) =>
      min((col("tid") * p.a + p.b) % MinHashMod).as(s"sig_$i")
    }
    val sigs = withTid.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nBands = perms.size / bandSize
    val candidates = (0 until nBands).map { b =>
      val bandCols = (0 until bandSize).map(j => s"sig_${b * bandSize + j}")
      val l = sigs.select(col("doc_id").as("doc1"), concat_ws("_", bandCols.map(col): _*).as("band"))
      val r = sigs.select(col("doc_id").as("doc2"), concat_ws("_", bandCols.map(col): _*).as("band"))
      l.join(r, "band" :: Nil).filter(col("doc1") < col("doc2")).select("doc1", "doc2")
    }.reduce(_ unionByName _).distinct()

    val sizes = withTid.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val t1 = withTid.select(col("doc_id").as("doc1"), col("tid"))
    val t2 = withTid.select(col("doc_id").as("doc2"), col("tid"))
    val interCount = candidates.join(t1, "doc1" :: Nil).join(t2, Seq("doc2", "tid"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
    val result = interCount
      .join(sizes.select(col("doc_id").as("doc1"), col("sz").as("sz1")), "doc1" :: Nil)
      .join(sizes.select(col("doc_id").as("doc2"), col("sz").as("sz2")), "doc2" :: Nil)
      .select(col("doc1"), col("doc2"),
        round(col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // materialize the (small) verified-pair set eagerly and truncate its
    // lineage, so the two big intermediates can be released NOW instead of
    // leaking in long-lived sessions; later actions on the returned frame
    // read the checkpointed pairs, never the exploded shingle sets.
    val out = result.localCheckpoint(true)
    withTid.unpersist(false)
    sigs.unpersist(false)
    out
  }

  /** Collapse verified near-dup PAIRS into clusters and pick one keeper per
    * cluster — the final step of the dedup pipeline (candidates → exact
    * verify → cluster → keep-one). Clusters are connected components of the
    * pair graph (transitive closure: if A~B and B~C, one of {A,B,C}
    * survives); the keeper is the minimum id. Returns (doc_id, keep_id) for
    * every document that appears in a pair; a doc is dropped iff
    * doc_id != keep_id. Distribution is the hash-min label propagation of
    * [[graft.graph.PropertyGraph.connectedComponents]] — per-round shuffles
    * on doc id, no driver-side state.
    */
  def dedupClusters(pairs: DataFrame, id1: String = "doc1", id2: String = "doc2"): DataFrame = {
    // materialize the (small) pair set once: the component loop derives its
    // vertex set AND per-round edge joins from it — without this the
    // (typically expensive) pair-generation plan re-executes per derivation
    val edges = pairs
      .select(col(id1).cast("long").as("src"), col(id2).cast("long").as("dst"))
      .localCheckpoint(true)
    graft.graph.PropertyGraph.fromEdges(edges)
      .connectedComponents()
      .select(col("id").as("doc_id"), col("component").as("keep_id"))
  }

  /** LCG token hash for SimHash — engine-independent (DuckDB twin uses the
    * same constants; BIGINT math avoids INT32 overflow there).
    */
  private def lcg(tid: Column): Column = (tid * 1103515245L + 12345L) % 2147483648L

  /** `bits`-bit SimHash per document over dictionary token ids: per bit j,
    * sign of Σ_tokens (2·bitⱼ(h(tid)) − 1); simhash = Σ 2ʲ·[sum > 0].
    */
  def simHash(df: DataFrame, textCol: String, idCol: String, bits: Int = 16): DataFrame = {
    val ts = tokenSet(df, textCol, idCol)
    val withTid = ts.join(tokenDict(ts), "tok" :: Nil)
      .select(col("doc_id"), lcg(col("tid")).as("h"))
    val bitSums = (0 until bits).map { j =>
      sum(shiftright(col("h"), j) % 2 * 2 - 1).as(s"bs_$j")
    }
    val simhash = (0 until bits).map { j =>
      when(col(s"bs_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    withTid.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  /** Character-n-gram Jaccard near-dup pairs within cheap blocking keys
    * (candidate pairs only form inside a block — the blocking column set
    * must be low-cardinality-per-block at scale).
    */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], n: Int, threshold: Double): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"), struct(blockCols.map(col): _*).as("blk"),
        explode(TextFunctions.charNgrams(col(textCol), n)).as("gram"))
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val g1 = grams.select(col("doc_id").as("doc1"), col("blk"), col("gram"))
    val g2 = grams.select(col("doc_id").as("doc2"), col("blk"), col("gram"))
    val inter = g1.join(g2, Seq("blk", "gram")).filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc1"), col("sz").as("sz1")), "doc1" :: Nil)
      .join(sizes.select(col("doc_id").as("doc2"), col("sz").as("sz2")), "doc2" :: Nil)
      .select(col("doc1"), col("doc2"),
        round(col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold within a blocking column
    * (e.g. a cluster/label id). Pairwise work bounded per block.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val v1 = df.select(col(idCol).as("id1"), col(blockCol).as("blk"), col(vecCol).as("v1"))
    val v2 = df.select(col(idCol).as("id2"), col(blockCol).as("blk"), col(vecCol).as("v2"))
    v1.join(v2, "blk" :: Nil).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
