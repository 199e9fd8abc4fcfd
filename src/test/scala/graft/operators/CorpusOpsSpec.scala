package graft.operators

import org.scalactic.Tolerance._

import graft.SparkSpec

/** Round-9 continuation operators: strided-suffix duplicated spans,
  * script/homoglyph profiling, hardness-tilted domain weights, tokenizer
  * fertility, and streaming SimHash dedup.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------- maximalDupSpans ----------

  test("maximalDupSpans finds the shared run with its maximal length") {
    // docs 1 and 2 share the 7-token run "a b c d e f g" starting at
    // position 1 (stride 1 so every start position seeds); doc 3 is noise
    val docs = Seq(
      (1L, "a b c d e f g x1 y1 z1"),
      (2L, "a b c d e f g x2 y2 z2"),
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val out = Dedup.maximalDupSpans(docs, "text", "doc_id",
      stride = 1, minLen = 5, maxLen = 8, maxBucket = 50, topN = 10).collect()
    assert(out.nonEmpty)
    val top = out.minBy(_.getAs[Long]("rk"))
    assert(top.getAs[String]("span") === "a b c d e")
    assert(top.getAs[Long]("dup_len") === 7L)
    assert(top.getAs[Long]("n_docs") === 2L)
    // the shorter tail seeds ("b c d e f g …") report their shorter matches
    assert(out.forall(r => r.getAs[Long]("dup_len") <= 8L &&
      r.getAs[Long]("dup_len") >= 5L))
  }

  test("maximalDupSpans match length is capped by the shorter suffix") {
    // shared 5-token tail at the very end of both docs: suffixes have
    // exactly 5 tokens, so dup_len must be 5 even though slices of a
    // shorter array would spuriously compare equal at larger j
    val docs = Seq(
      (1L, "x1 x2 m n o p q"),
      (2L, "y1 y2 y3 m n o p q")).toDF("doc_id", "text")
    val out = Dedup.maximalDupSpans(docs, "text", "doc_id",
      stride = 1, minLen = 5, maxLen = 8, maxBucket = 50, topN = 10).collect()
    val hit = out.find(_.getAs[String]("span") == "m n o p q")
    assert(hit.isDefined)
    assert(hit.get.getAs[Long]("dup_len") === 5L)
  }

  test("maximalDupSpans drops seeds over the bucket cap (skew guard)") {
    // one boilerplate seed repeated across 30 docs; cap at 10 suffixes
    val hot = (1L to 30L).map(i => (i, s"the same hot seed line tail$i"))
    val pair = Seq((100L, "u v w x y z1 q"), (101L, "u v w x y z2 r"))
    val docs = (hot ++ pair).toDF("doc_id", "text")
    val out = Dedup.maximalDupSpans(docs, "text", "doc_id",
      stride = 1, minLen = 5, maxLen = 8, maxBucket = 10, topN = 50).collect()
    assert(!out.exists(_.getAs[String]("span").startsWith("the same hot")))
    assert(out.exists(_.getAs[String]("span") == "u v w x y"))
  }

  test("maximalDupSpans agrees with a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val stride = 1 + rnd.nextInt(3)
      val docs = (1L to 12L).map { i =>
        (i, Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val (minLen, maxLen, maxBucket, topN) = (3, 6, 40, 15)
      val got = Dedup.maximalDupSpans(docs.toDF("doc_id", "text"), "text",
          "doc_id", stride, minLen, maxLen, maxBucket, topN)
        .collect()
        .map(r => (r.getAs[Long]("rk"), r.getAs[String]("span"),
          r.getAs[Long]("dup_len"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_occ"))).toSeq.sortBy(_._1)

      // reference: same semantics, single-machine
      case class Sfx(doc: Long, p: Int, toks: Vector[String]) {
        def span: String = toks.take(minLen).mkString(" ")
        def key: String = toks.mkString(" ")
      }
      val sfx = docs.flatMap { case (id, text) =>
        val toks = text.trim.split("\\s+").toVector
        if (toks.size < minLen) Nil
        else (1 to (toks.size - (minLen - 1)) by stride).map(p =>
          Sfx(id, p, toks.slice(p - 1, p - 1 + maxLen)))
      }
      val agg = sfx.groupBy(_.span).filter(_._2.size <= maxBucket)
        .flatMap { case (span, g) =>
          val sorted = g.sortBy(s => (s.key, s.doc, s.p))
          val matches = sorted.zip(sorted.drop(1)).collect {
            case (a, b) if a.doc != b.doc =>
              minLen + (minLen + 1 to maxLen).count(j =>
                j <= math.min(a.toks.size, b.toks.size) &&
                  a.toks.take(j) == b.toks.take(j)).toLong
          }
          val nd = g.map(_.doc).distinct.size
          if (nd >= 2 && matches.nonEmpty)
            Some((span, matches.max, nd.toLong, g.size.toLong))
          else None
        }.toSeq
      val want = agg.sortBy { case (span, dl, _, _) => (-dl, span) }
        .take(topN).zipWithIndex
        .map { case ((span, dl, nd, no), i) => (i + 1L, span, dl, nd, no) }
      assert(got === want, s"trial $trial (stride $stride)")
    }
  }

  // ---------- scriptProfile ----------

  test("scriptProfile counts scripts, flags in-word homoglyphs") {
    val docs = Seq(
      (1L, "pure latin words only"),
      (2L, "pаypal login pаge"), // Cyrillic а inside Latin words
      (3L, "latin plus αβγ tokens"), // Greek across words
      (4L, "12345 67890"),
      (5L, "буквы")).toDF("doc_id", "text") // pure Cyrillic
    val out = Scoring.scriptProfile(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("dominant") === "latin")
    assert(out(1L).getAs[Double]("mix_ratio") === 0.0)
    assert(out(1L).getAs[Long]("confusable_words") === 0L)
    assert(out(2L).getAs[Long]("confusable_words") === 2L)
    assert(out(2L).getAs[Long]("n_cyr") === 2L)
    assert(out(3L).getAs[String]("dominant") === "latin")
    assert(out(3L).getAs[Long]("n_greek") === 3L)
    assert(out(3L).getAs[Long]("confusable_words") === 0L)
    assert(out(3L).getAs[Double]("mix_ratio") > 0.0)
    assert(out(4L).getAs[String]("dominant") === "none")
    assert(out(4L).getAs[Long]("n_digit") === 10L)
    assert(out(4L).getAs[Double]("mix_ratio") === 0.0)
    assert(out(5L).getAs[String]("dominant") === "cyrillic")
  }

  test("scriptProfile dominant ties break latin > cyrillic > greek") {
    val docs = Seq((1L, "ab аб"), (2L, "аб αβ"))
      .toDF("doc_id", "text")
    val out = Scoring.scriptProfile(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("dominant") === "latin")
    assert(out(2L).getAs[String]("dominant") === "cyrillic")
  }

  // ---------- hardnessTiltedWeights ----------

  test("hardnessTiltedWeights up-weights the harder domain, weights sum to 1") {
    // easy: repeats of one common token; hard: all-distinct rare tokens
    val easy = (1L to 8L).map(i => (i, "common common common common", "easy"))
    val hard = (9L to 12L).map(i =>
      (i, s"rare${i}a rare${i}b rare${i}c rare${i}d", "hard"))
    val docs = (easy ++ hard).toDF("doc_id", "text", "source")
    val out = Sampling.hardnessTiltedWeights(docs, "source", "text", "doc_id",
        eta = 1.0, clipLo = 0.5, clipHi = 2.0)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    val (e, h) = (out("easy"), out("hard"))
    assert(h.getAs[Double]("mean_nll") > e.getAs[Double]("mean_nll"))
    assert(h.getAs[Double]("excess") > 0 && e.getAs[Double]("excess") < 0)
    assert(h.getAs[Double]("tilt") > 1.0 && e.getAs[Double]("tilt") < 1.0)
    Seq(e, h).foreach { r =>
      val t = r.getAs[Double]("tilt")
      assert(t >= 0.5 && t <= 2.0)
    }
    val total = out.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - 1.0) < 1e-5)
    // the tilt must actually shift mass off the doc-count share
    assert(h.getAs[Double]("weight") > 4.0 / 12.0)
  }

  test("hardnessTiltedWeights single domain degenerates to weight 1, tilt 1") {
    val docs = Seq((1L, "a b c", "only"), (2L, "a b d", "only"))
      .toDF("doc_id", "text", "source")
    val out = Sampling.hardnessTiltedWeights(docs, "source", "text", "doc_id")
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("excess") === 0.0)
    assert(out.head.getAs[Double]("tilt") === 1.0)
    assert(math.abs(out.head.getAs[Double]("weight") - 1.0) < 1e-6)
  }

  // ---------- fertilityByGroup ----------

  test("fertilityByGroup rolls encodeStats up per group") {
    // merge (a,b) fuses "ab" to one symbol: "ab ab" = 2 words, 2 symbols
    val docs = Seq(
      (1L, "ab ab", "g1"), (2L, "cd", "g1"), (3L, "ab cd", "g2"))
      .toDF("doc_id", "text", "lang")
    val out = Bpe.fertilityByGroup(docs, "text", "doc_id", "lang",
        Seq(("a", "b")))
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    // g1: doc1 "ab ab" -> 2 syms; doc2 "cd" -> 2 syms (no merge) = 3 words,
    // 4 syms, 6 chars
    assert(out("g1").getAs[Long]("n_docs") === 2L)
    assert(out("g1").getAs[Long]("n_words") === 3L)
    assert(out("g1").getAs[Long]("n_bpe") === 4L)
    assert(out("g1").getAs[Double]("fertility") === 4.0 / 3.0 +- 1e-6)
    assert(out("g1").getAs[Double]("chars_per_sym") === 1.5)
    // g2: "ab cd" -> 1 + 2 = 3 syms, 2 words, 4 chars
    assert(out("g2").getAs[Long]("n_bpe") === 3L)
    assert(out("g2").getAs[Double]("fertility") === 1.5)
  }

  test("fertilityByGroup keeps wordless docs as zero contributions") {
    val docs = Seq((1L, "", "g"), (2L, "xy", "g")).toDF("doc_id", "text", "lang")
    val out = Bpe.fertilityByGroup(docs, "text", "doc_id", "lang", Nil).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_docs") === 2L)
    assert(out.head.getAs[Long]("n_words") === 1L)
    assert(out.head.getAs[Long]("n_bpe") === 2L)
  }

  // ---------- clusterOutliers ----------

  test("clusterOutliers flags the injected far point, not the cluster body") {
    // two tight 2-d clusters of 6 points each + one far outlier attached
    // to the first cluster's side of space
    val near = (1L to 6L).map(i => (i, Array(0.0f, 0.0f + i * 0.01f))) ++
      (11L to 16L).map(i => (i, Array(10.0f, 10.0f + (i - 10) * 0.01f)))
    val far = Seq((99L, Array(3.0f, 3.0f)))
    val df = (near ++ far).toDF("vec_id", "embedding")
    val out = Clustering.clusterOutliers(df, "embedding", "vec_id",
      k = 2, iters = 3, zCut = 2.0)
    val rows = out.collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(rows(99L).getAs[Boolean]("is_outlier"),
      s"far point not flagged: ${rows(99L)}")
    assert((1L to 6L).forall(i => !rows(i).getAs[Boolean]("is_outlier")))
    assert((11L to 16L).forall(i => !rows(i).getAs[Boolean]("is_outlier")))
  }

  test("clusterOutliers: zero-variance cluster reports z = 0, never outliers") {
    val df = ((1L to 5L).map(i => (i, Array(1.0f, 1.0f))) ++
      (11L to 15L).map(i => (i, Array(5.0f, 5.0f))))
      .toDF("vec_id", "embedding")
    val out = Clustering.clusterOutliers(df, "embedding", "vec_id",
      k = 2, iters = 2).collect()
    assert(out.forall(_.getAs[Double]("z") === 0.0))
    assert(out.forall(!_.getAs[Boolean]("is_outlier")))
  }

  // ---------- rendezvousShard ----------

  test("rendezvous sharding: growing n moves keys ONLY onto the new shard") {
    import org.apache.spark.sql.functions.col
    val keys = (1L to 2000L).toDF("k")
    val out = keys.select(col("k"),
        Layout.rendezvousShard(col("k"), 8).as("s8"),
        Layout.rendezvousShard(col("k"), 9).as("s9"))
      .collect()
    val moved = out.filter(r => r.getLong(1) != r.getLong(2))
    // the consistent-hashing property: a key moves iff the NEW candidate
    // wins, so every moved key lands on shard 8 (the added one)
    assert(moved.forall(_.getLong(2) === 8L))
    // and roughly 1/9 of keys move (binomial, loose bounds)
    assert(moved.length > 2000 / 9 / 2 && moved.length < 2000 / 9 * 2,
      s"moved ${moved.length} of 2000")
    // shards are balanced-ish under n = 8
    val byShard = out.groupBy(_.getLong(1)).view.mapValues(_.length)
    assert(byShard.size === 8)
    assert(byShard.values.forall(c => c > 125 && c < 375), byShard.toMap)
  }

  // ---------- leakFreeSplit ----------

  test("leakFreeSplit agrees with a brute-force reference on random corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rnd = new scala.util.Random(77)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 1 to 4) {
      val docs = (1L to 40L).map { i =>
        (i, Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val trainBuckets = 128 + rnd.nextInt(100)
      val got = Sampling.leakFreeSplit(docs.toDF("doc_id", "text"), "text",
          "doc_id", trainBuckets, k = 3)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"),
          r.getAs[Boolean]("leaky"), r.getAs[Boolean]("kept_train")))
        .sortBy(_._1)

      val threshold = f"${trainBuckets - 1}%02x"
      def splitOf(id: Long): String =
        if (md5hex(id.toString).take(2) <= threshold) "train" else "holdout"
      def shingles(text: String): Set[String] = {
        val t = text.trim.split("\\s+").toVector
        if (t.size < 3) Set.empty
        else t.sliding(3).map(_.mkString(" ")).toSet
      }
      val holdoutSh = docs.filter(d => splitOf(d._1) == "holdout")
        .flatMap(d => shingles(d._2)).toSet
      val want = docs.map { case (id, text) =>
        val sp = splitOf(id)
        val leak = sp == "train" && shingles(text).exists(holdoutSh.contains)
        (id, sp, leak, sp == "train" && !leak)
      }.sortBy(_._1)
      assert(got.toSeq === want.toSeq, s"trial $trial (trainBuckets $trainBuckets)")
    }
  }

  // ---------- distinctNgramRatio ----------

  test("distinctNgramRatio counts occurrences vs distinct per group") {
    val docs = Seq(
      (1L, "a b c a b c", "s1"), // trigrams: abc bca cab abc -> 4 occ, 3 distinct
      (2L, "a b c", "s1"), // abc -> 1 occ (dup of doc 1's)
      (3L, "x y", "s1"), // too short: nothing
      (4L, "p q r s", "s2")) // pqr qrs -> 2 occ, 2 distinct
      .toDF("doc_id", "text", "source")
    val out = Scoring.distinctNgramRatio(docs, "text", "source", n = 3)
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(out("s1").getAs[Long]("n_ngrams") === 5L)
    assert(out("s1").getAs[Long]("n_distinct") === 3L)
    assert(out("s1").getAs[Double]("distinct_ratio") === 0.6)
    assert(out("s2").getAs[Long]("n_ngrams") === 2L)
    assert(out("s2").getAs[Double]("distinct_ratio") === 1.0)
  }

  test("hardnessTiltedWeights agrees with a driver-side reference on random corpora") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 3) {
      val docs = (1L to 30L).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "), s"dom${i % 4}")
      }
      val df = docs.toDF("doc_id", "text", "source")
      val got = Sampling.hardnessTiltedWeights(df, "source", "text", "doc_id",
          eta = 1.0, clipLo = 0.5, clipHi = 2.0)
        .collect()
        .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_docs"),
          r.getAs[Double]("mean_nll"), r.getAs[Double]("excess"),
          r.getAs[Double]("tilt"), r.getAs[Double]("weight")))
        .sortBy(_._1)

      // reference: corpus-fit unigram nll per doc, then the exact
      // micro/nano fixed-point chain
      def r(x: Double, dp: Int): Double =
        BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
      val toks = docs.flatMap(_._2.split("\\s+"))
      val cnt = toks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val total = toks.size.toDouble
      val nll: Map[Long, Double] = docs.map { case (id, text, _) =>
        val ts = text.split("\\s+").toSeq
        val micro = ts.map(t =>
          math.round(r(-math.log(cnt(t) / total), 6) * 1e6)).sum
        id -> r(micro.toDouble / (1e6 * ts.size), 4)
      }.toMap
      val byDom = docs.groupBy(_._3)
      val corpusMean = r(docs.map(d =>
        math.round(nll(d._1) * 1e6)).sum.toDouble / (1e6 * docs.size), 6)
      val raw = byDom.map { case (dom, g) =>
        val mean = r(g.map(d => math.round(nll(d._1) * 1e6)).sum.toDouble
          / (1e6 * g.size), 6)
        val excess = r(mean - corpusMean, 6)
        val tilt = math.min(math.max(r(math.exp(excess), 6), 0.5), 2.0)
        (dom, g.size.toLong, mean, excess, tilt,
          r(g.size.toDouble / docs.size * tilt, 9))
      }.toSeq
      val z = raw.map(t => math.round(t._6 * 1e9)).sum.toDouble
      val want = raw.map { case (dom, n, mean, ex, tilt, rw) =>
        (dom, n, mean, ex, tilt, r(math.round(rw * 1e9) / z, 6))
      }.sortBy(_._1)
      assert(got.toSeq === want, s"trial $trial")
    }
  }
}
