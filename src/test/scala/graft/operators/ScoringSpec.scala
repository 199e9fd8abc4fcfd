package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions, VectorFunctions}

class ScoringSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "spark joins data with hash join"),
    (2L, "sort merge join beats hash join on big data"),
    (3L, "the quick brown fox")).toDF("doc_id", "text")

  test("tfidf: rare terms outweigh common terms; tf counts the multiset") {
    val r = Scoring.tfidf(docs, "text", "doc_id")
      .select("doc_id", "tok", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    assert(r((2L, "join"))._1 === 2L) // two "join" occurrences in doc 2
    assert(r((1L, "join"))._2 === 2L) // "join" appears in 2 docs
    assert(r((3L, "fox"))._2 === 1L)
    // same tf: unique-to-one-doc term weighs more than a 2-doc term
    assert(r((3L, "fox"))._3 > r((1L, "spark"))._3 - 1e-12 ||
      r((1L, "spark"))._2 === 1L)
    // idf never zero even for a term in every doc (smooth variant)
    assert(r.values.forall(_._3 > 0.0))
  }

  test("bm25: doc matching more query terms scores higher; non-matching absent") {
    val r = Scoring.bm25(docs, "text", "doc_id", Seq("hash", "join"))
      .as[(Long, Double)].collect().toMap
    assert(r.contains(1L) && r.contains(2L))
    assert(!r.contains(3L)) // no query term
    assert(r(2L) > 0.0 && r(1L) > 0.0)
  }

  test("contamination: shared shingles counted per held-out doc") {
    val df = Seq(
      (1L, "a b c d e"),     // train
      (2L, "a b c x y"),     // holdout: shares shingle "a b c" with doc 1
      (3L, "p q r s t"))     // holdout: no overlap
      .toDF("doc_id", "text")
    val r = Contamination.shingleOverlap(df, "text", "doc_id",
        isTrain = col("doc_id") === 1L, k = 3)
      .select("doc_id", "n_shingles", "n_shared")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(2L) === ((3L, 1L))) // 3 shingles, 1 shared ("a b c")
    assert(!r.contains(3L))    // uncontaminated docs are absent
  }

  test("unigramLogLoss: rare-token docs score higher nll; counts exact") {
    // corpus: 8 tokens total; p(a)=5/8, p(b)=2/8, p(z)=1/8
    val df = Seq(
      (1L, "a a a b"),   // common tokens -> low mean -ln p
      (2L, "a b"),
      (3L, "a z")        // contains the rarest token -> highest nll
    ).toDF("doc_id", "text")
    val out = Scoring.unigramLogLoss(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq === Seq(4L, 2L, 2L))
    def lp(p: Double) = BigDecimal(-math.log(p)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    def m(xs: Double*) = BigDecimal(xs.sum / xs.size).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._3 === m(lp(5 / 8.0), lp(5 / 8.0), lp(5 / 8.0), lp(2 / 8.0)))
    assert(out(2)._3 === m(lp(5 / 8.0), lp(1 / 8.0)))
    assert(out(2)._3 > out(0)._3) // rare-token doc is "surprising"
  }

  test("bigramLogLoss: unusual token ORDER scores high where unigrams cannot see it") {
    // corpus transitions: "a b" ×3 docs and one doc "b a" — same unigram
    // bag, reversed order. bigram counts: (a,b)=3, (b,a)=1; contexts:
    // c(a)=3, c(b)=1; vocab V=2.
    val df = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"),
      (4L, "b a"),   // common tokens, rare ORDER -> highest bigram nll
      (5L, "a")      // single token: no transitions, excluded
    ).toDF("doc_id", "text")
    val out = Scoring.bigramLogLoss(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L)) // doc 5 excluded
    assert(out.map(_._2).toSeq === Seq(1L, 1L, 1L, 1L))
    def nll(bc: Double, cc: Double) = {
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(r6(-math.log((bc + 1) / (cc + 2.0))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0)._3 === nll(3, 3)) // p(b|a) = 4/5
    assert(out(3)._3 === nll(1, 1)) // p(a|b) = 2/3
    assert(out(3)._3 > out(0)._3)   // reversed-order doc is "surprising"
    // determinism under repartitioning (the integer-sum recipe)
    val again = Scoring.bigramLogLoss(df.repartition(5), "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(again.toSeq === out.toSeq)
  }

  test("importanceLogRatio: target-domain docs score positive, off-domain negative") {
    // target = category 't' docs; token 'x' is target-heavy, 'y' corpus-only
    val df = Seq(
      (1L, "x x y", "t"), (2L, "x x x", "t"),
      (3L, "y y y", "o"), (4L, "x y y", "o")
    ).toDF("doc_id", "text", "cat")
    val out = Scoring.importanceLogRatio(df, "text", "doc_id", $"cat" === "t")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq === Seq(3L, 3L, 3L, 3L))
    // x: corpus 6, target 5; y: corpus 6, target 1; V=2, ctot=12, ttot=6
    def lr(tc: Double, cc: Double) = {
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r6(math.log((tc + 1) / (6 + 2.0))) - r6(math.log((cc + 1) / (12 + 2.0)))
    }
    def m(xs: Double*) = BigDecimal(xs.sum / xs.size).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1)._3 === m(lr(5, 6), lr(5, 6), lr(5, 6))) // all-x doc
    assert(out(2)._3 === m(lr(1, 6), lr(1, 6), lr(1, 6))) // all-y doc
    assert(out(1)._3 > 0 && out(2)._3 < 0)
    assert(out(1)._3 > out(0)._3 && out(0)._3 > out(2)._3)
  }

  test("tokenNgrams keeps the multiset; dupTokenFraction measures repeats") {
    val df = Seq("a b a b a", "x y z").toDF("text")
    val bgs = df.select(TextFunctions.tokenNgrams($"text", 2)).as[Seq[String]].collect()
    assert(bgs(0) === Seq("a b", "b a", "a b", "b a")) // NOT deduplicated
    assert(bgs(1) === Seq("x y", "y z"))
    val dup = df.select(TextFunctions.dupTokenFraction($"text")).as[Double].collect()
    assert(dup(0) === 0.6) // 5 tokens, 2 distinct -> 3/5
    assert(dup(1) === 0.0)
  }

  test("int8 quantization: max |v| maps to ±127, half-up rounding") {
    val df = Seq((1L, Seq(2.0f, -4.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = df.select(VectorFunctions.quantizeInt8($"embedding",
        VectorFunctions.int8Scale($"embedding")).as("q"))
      .as[Seq[Int]].collect().head
    assert(q === Seq(64, -127, 32)) // scale = 127/4 = 31.75; floor(63.5+0.5)=64
  }
}

class LogisticFitSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // linearly separable by the single feature: positives at x=+1, negatives
  // at x=-1
  private lazy val sep = ((1L to 40L).map(i => (i, 1.0, 1.0)) ++
    (41L to 80L).map(i => (i, -1.0, 0.0))).toDF("id", "x", "y")

  test("GD separates separable data; one score per row in [0,1]") {
    val (scored, w) = Scoring.logisticFitScore(sep, "id",
      features = Seq(lit(1.0), col("x")), label = col("y"), iters = 8, lr = 1.0)
    val rows = scored.as[(Long, Double, Double)].collect()
    assert(rows.length === 80)
    assert(rows.forall { case (_, _, s) => s >= 0.0 && s <= 1.0 })
    val pos = rows.filter(_._2 == 1.0).map(_._3).min
    val neg = rows.filter(_._2 == 0.0).map(_._3).max
    assert(pos > neg, s"separable data must separate: min-pos $pos <= max-neg $neg")
    assert(w.length === 2 && w(1) > 0, "feature weight points toward the positives")
  }

  test("fit is deterministic under repartitioning (rounded recipe)") {
    val (s1, w1) = Scoring.logisticFitScore(sep.repartition(17), "id",
      Seq(lit(1.0), col("x")), col("y"), iters = 5, lr = 0.7)
    val (s2, w2) = Scoring.logisticFitScore(sep.repartition(3), "id",
      Seq(lit(1.0), col("x")), col("y"), iters = 5, lr = 0.7)
    assert(w1.toSeq === w2.toSeq)
    assert(s1.orderBy("id").collect().toSeq === s2.orderBy("id").collect().toSeq)
  }

  test("weights stay at zero on a balanced uninformative feature") {
    // y is independent of x and balanced, so every gradient component
    // cancels exactly: avg((0.5 - y) * x) = 0 for x in {+1,-1} paired
    val bal = Seq((1L, 1.0, 1.0), (2L, 1.0, 0.0), (3L, -1.0, 1.0),
      (4L, -1.0, 0.0)).toDF("id", "x", "y")
    val (_, w) = Scoring.logisticFitScore(bal, "id", Seq(col("x")), col("y"),
      iters = 3, lr = 1.0)
    assert(w.toSeq === Seq(0.0))
  }
}

class RankBlendSpec extends graft.SparkSpec {
  import spark.implicits._

  test("percentiles are (rank-1)/(n-1) with id tie-breaks; blend is their mean") {
    val df = Seq((1L, 10.0, 5.0), (2L, 20.0, 1.0), (3L, 30.0, 3.0))
      .toDF("id", "a", "b")
    val r = Scoring.rankBlend(df, "id",
        Seq("a" -> col("a"), "b" -> col("b")))
      .select("id", "a_pct", "b_pct", "blend")
      .as[(Long, Double, Double, Double)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) === ((1L, 0.0, 1.0, 0.5)))
    assert(r(2L) === ((2L, 0.5, 0.0, 0.25)))
    assert(r(3L) === ((3L, 1.0, 0.5, 0.75)))
  }

  test("ties rank deterministically by id and survive repartitioning") {
    val df = (1L to 40L).map(i => (i, (i % 4).toDouble)).toDF("id", "v")
    val one = Scoring.rankBlend(df.repartition(7), "id", Seq("v" -> col("v")))
      .select("id", "blend").as[(Long, Double)].collect().toSet
    val two = Scoring.rankBlend(df.repartition(2), "id", Seq("v" -> col("v")))
      .select("id", "blend").as[(Long, Double)].collect().toSet
    assert(one === two)
    // equal values order by id: id 4 (v=0) ranks after ids 8,12,... no —
    // among v=0 rows {4,8,...,40}, id 4 is first
    val byId = one.toMap
    assert(byId(4L) < byId(8L))
  }

  test("fixed-point blend is exact half-up at micro-unit ties for any signal count") {
    // 4 equal signals with percentiles (0, 1/3, 2/3, 1) per row: the
    // micro-sum is divisible by 4 only sometimes — the floor(x + 0.5)
    // integer form must stay deterministic and match hand arithmetic
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    val r = Scoring.rankBlend(df, "id",
        Seq("a" -> col("v"), "b" -> col("v"), "c" -> col("v"), "d" -> col("v")))
      .select("id", "a_pct", "blend").as[(Long, Double, Double)].collect()
    // all four signals identical → the micro-unit round trip must return
    // exactly the shared 6-dp percentile (incl. the repeating 1/3, 2/3)
    assert(r.nonEmpty)
    assert(r.forall { case (_, p, b) => b == p })
  }

  test("a single-row corpus lands every percentile at 0") {
    val r = Scoring.rankBlend(Seq((1L, 9.0)).toDF("id", "v"), "id",
        Seq("v" -> col("v")))
      .select("v_pct", "blend").as[(Double, Double)].collect()
    assert(r.toSeq === Seq((0.0, 0.0)))
  }
}

class TokenDriftSpec extends graft.SparkSpec {
  import spark.implicits._

  test("identical snapshots show zero drift everywhere") {
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("id", "text")
    val r = Scoring.tokenDrift(docs, docs, "text", topN = 10)
      .select("p_a", "p_b", "js").as[(Double, Double, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (pa, pb, js) => pa == pb && js == 0.0 })
  }

  test("hand-checked smoothing over the union vocabulary") {
    // A = x x x y, B = z z z y → union vocab {x, y, z}, totals 4 + 3 each
    val a = Seq((1L, "x x x y")).toDF("id", "text")
    val b = Seq((2L, "z z z y")).toDF("id", "text")
    val r = Scoring.tokenDrift(a, b, "text", topN = 10)
      .select("tok", "n_a", "n_b", "p_a", "p_b")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("x") === (("x", 3L, 0L, math.rint(4.0 / 7 * 1e9) / 1e9, math.rint(1.0 / 7 * 1e9) / 1e9)))
    assert(r("z") === (("z", 0L, 3L, math.rint(1.0 / 7 * 1e9) / 1e9, math.rint(4.0 / 7 * 1e9) / 1e9)))
    assert(r("y")._4 === r("y")._5) // same count both sides → no drift
    // the two movers outrank the stable token
    val ranks = Scoring.tokenDrift(a, b, "text", topN = 10)
      .select("tok", "rk").as[(String, Long)].collect().toMap
    assert(ranks("y") === 3L && Set(ranks("x"), ranks("z")) === Set(1L, 2L))
  }

  test("per-token JSD contributions are nonnegative and symmetric under swap") {
    val a = Seq((1L, "p q r r"), (2L, "p p s")).toDF("id", "text")
    val b = Seq((3L, "q q t"), (4L, "r t t")).toDF("id", "text")
    val ab = Scoring.tokenDrift(a, b, "text", topN = 100)
      .select("tok", "p_a", "p_b", "js")
      .as[(String, Double, Double, Double)].collect()
    // pointwise JSD is >= 0; the 6-dp ln rounding can dip it microscopically
    assert(ab.forall(_._4 >= -1e-6))
    val ba = Scoring.tokenDrift(b, a, "text", topN = 100)
      .select("tok", "p_a", "p_b", "js")
      .as[(String, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(ab.forall { case (tok, pa, pb, js) =>
      ba(tok) == ((tok, pb, pa, js))
    })
  }
}
