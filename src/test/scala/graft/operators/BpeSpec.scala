package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-machine BPE (textbook formulation over symbol lists)
    * — the differential twin of the distributed string-replace pipeline.
    */
  private def referenceBpe(texts: Seq[String], merges: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w.map(_.toString).toVector, g.size.toLong) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (m <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, c) <- words; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((m, l, r, n))
        words = words.groupBy { case (w, _) =>
          // greedy left-to-right non-overlapping fuse
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i < w.length - 1 && w(i) == l && w(i + 1) == r) { b += (l + r); i += 2 }
            else { b += w(i); i += 1 }
          }
          b.result()
        }.map { case (w, g) => (w, g.map(_._2).sum) }
      }
    }
    out.toSeq
  }

  test("learned merges match the reference implementation on a crafted corpus") {
    val texts = Seq(
      "low low low low low", "lower lower newest newest",
      "newest newest newest newest", "wider wider new new")
    val df = texts.toDF("text")
    val got = Bpe.learnMerges(df, "text", merges = 6)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === referenceBpe(texts, 6))
    // sanity: BPE on this corpus must learn multi-char symbols by round 6
    assert(got.exists { case (_, l, r, _) => (l + r).length > 2 })
  }

  test("greedy fuse is left-to-right non-overlapping: aaa -> (aa)(a)") {
    val df = Seq("aaa aaa").toDF("text")
    val got = Bpe.learnMerges(df, "text", merges = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    // round 1: pair (a,a) appears twice per word BUT the fuse is greedy:
    // each "aaa" becomes ["aa","a"], so round 2's top pair is (aa, a)
    assert(got(0)._2 === "a" && got(0)._3 === "a" && got(0)._4 === 4L)
    assert(got(1)._2 === "aa" && got(1)._3 === "a" && got(1)._4 === 2L)
  }

  test("random corpora: distributed == reference for every merge") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcd"
    for (_ <- 1 to 5) {
      val texts = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(8))(
          Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(4))).mkString).mkString(" "))
      val got = Bpe.learnMerges(texts.toDF("text"), "text", merges = 5)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      assert(got === referenceBpe(texts, 5), s"corpus: ${texts.take(3)}...")
    }
  }

  test("stops early when no pairs remain") {
    val df = Seq("a b c").toDF("text")
    val got = Bpe.learnMerges(df, "text", merges = 5).count()
    assert(got === 0L, "single-char words have no adjacent pairs")
  }

  test("encodeStats: no merges counts chars; merges fuse greedily per word") {
    val df = Seq((1L, "aaa ab"), (2L, "")).toDF("doc_id", "text")
    val plain = Bpe.encodeStats(df, "text", "doc_id", Nil)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(plain === Seq((1L, 2L, 5L, 5L), (2L, 0L, 0L, 0L)))
    val fused = Bpe.encodeStats(df, "text", "doc_id", Seq(("a", "a")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // "aaa" -> (aa)(a) = 2 symbols, "ab" -> (a)(b) = 2 symbols
    assert(fused === Seq((1L, 2L, 5L, 4L), (2L, 0L, 0L, 0L)))
    val chain = Bpe.encodeStats(df, "text", "doc_id", Seq(("a", "a"), ("aa", "a")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // round 2 fuses (aa)(a) -> (aaa): 1 symbol
    assert(chain === Seq((1L, 2L, 5L, 3L), (2L, 0L, 0L, 0L)))
  }
}
