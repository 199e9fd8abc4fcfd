package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles repeated whitespace and padding") {
    val df = Seq("  a  b\tc ", "one", "x y z w").toDF("text")
    assert(df.select(TextFunctions.tokenCount($"text")).as[Int].collect().toSeq === Seq(3, 1, 4))
  }

  test("fingerprint is word-order invariant, distinct-sensitive") {
    val df = Seq(("a", "the cat sat"), ("b", "sat the cat"), ("c", "the cat sat sat"), ("d", "the dog sat"))
      .toDF("id", "text")
    val fps = df.select($"id", TextFunctions.fingerprint($"text").as("fp"))
      .as[(String, String)].collect().toMap
    assert(fps("a") === fps("b")) // order-insensitive
    assert(fps("a") === fps("c")) // duplicate tokens collapse
    assert(fps("a") !== fps("d"))
  }

  test("charNgrams of short and exact-length strings") {
    val df = Seq("ab", "abc", "abcd").toDF("text")
    val r = df.select(TextFunctions.charNgrams($"text", 3)).as[Seq[String]].collect()
    assert(r(0) === Seq.empty)
    assert(r(1) === Seq("abc"))
    assert(r(2) === Seq("abc", "bcd"))
  }

  test("native charNgrams matches the HOF twin incl. repeats and multi-byte") {
    val df = Seq("abcabcab", "ééxéé", "aaaa", "", "ab").toDF("text")
    val native = df.select(TextFunctions.charNgrams($"text", 3)).as[Seq[String]].collect()
    val hof = df.select(TextFunctions.charNgramsHof($"text", 3)).as[Seq[String]].collect()
    assert(native.toSeq === hof.toSeq)
    assert(native(2) === Seq("aaa")) // dedup keeps first occurrence only
  }

  test("langId picks profile with most stopword hits") {
    val df = Seq(
      ("e", "the cat and the dog is here"),
      ("g", "der hund und die katze ist da"),
      ("f", "le chat et la maison est dans"),
      ("u", "xyzzy plugh quux")).toDF("id", "text")
    val r = df.select($"id", TextFunctions.langId($"text")).as[(String, String)].collect().toMap
    assert(r("e") === "en" && r("g") === "de" && r("f") === "fr" && r("u") === "und")
  }

  test("cosine and dot on float arrays") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b")
    val cos = df.select(VectorFunctions.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(cos(0)) < 1e-12)
    assert(math.abs(cos(1) - 1.0) < 1e-12)
    assert(df.select(VectorFunctions.dot($"a", $"b")).as[Double].collect().toSeq === Seq(0.0, 2.0))
  }

  test("signBucket maps sign pattern to bits") {
    val df = Seq(Seq(1.0f, -1.0f, 0.5f), Seq(-1.0f, -1.0f, -1.0f)).toDF("v")
    assert(df.select(VectorFunctions.signBucket($"v", 3)).as[Long].collect().toSeq === Seq(5L, 0L))
  }

  test("native codegen expressions: hamming64 and cosine_sim") {
    import NativeExpressions._
    val df = Seq((0xFFL, 0x0FL), (5L, 5L), (0L, -1L)).toDF("a", "b")
    assert(df.select(hamming64($"a", $"b")).as[Int].collect().toSeq === Seq(4, 0, 64))

    val vecs = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 3.0f)), (Seq(2.0f, 2.0f), Seq(1.0f, 1.0f)))
      .toDF("x", "y")
    val cos = vecs.select(cosineNative($"x", $"y")).as[Double].collect()
    assert(math.abs(cos(0)) < 1e-12 && math.abs(cos(1) - 1.0) < 1e-12)
    // native result identical to the HOF composition (same accumulation order)
    val hof = vecs.select(VectorFunctions.cosineHof($"x", $"y")).as[Double].collect()
    assert(cos.toSeq === hof.toSeq)

    // SQL registration
    NativeExpressions.registerAll(spark)
    vecs.createOrReplaceTempView("native_vecs")
    val viaSql = spark.sql("SELECT cosine_sim(x, y) FROM native_vecs").as[Double].collect()
    assert(viaSql.toSeq === cos.toSeq)
    // type check error is clean
    val err = intercept[Exception](Seq((1, 2)).toDF("a", "b").select(cosineNative($"a", $"b")).collect())
    assert(err.getMessage.toLowerCase.contains("cosine_sim") || err.getMessage.contains("array<float>"))

    // the text natives registered for SQL callers
    Seq((1L, "a a b b b c")).toDF("id", "text").createOrReplaceTempView("native_txt")
    val (scrubbed, maxBg) = spark.sql(
      """SELECT array_join(scrub_runs(split(text, ' ')), ' '),
        |  ngram_max_count(split(text, ' '), 1) FROM native_txt""".stripMargin)
      .as[(String, Long)].head()
    assert(scrubbed === "a b c" && maxBg === 3L)

    // round-8 registrations: repetition signals + Luhn masking from SQL
    val (rep, masked) = spark.sql(
      """SELECT ngram_rep_chars(split(text, ' '), 2),
        |  luhn_scrub('pay 4532015112830366 now') FROM native_txt""".stripMargin)
      .as[(Seq[Long], String)].head()
    // "a a b b b c": top 2-gram is "b b" (2 occurrences × 2 chars = 4);
    // its windows at positions 3 and 4 cover tokens 3–5 → dup chars = 3;
    // six 1-char tokens → total 6
    assert(rep === Seq(4L, 3L, 6L))
    assert(masked === "pay [CC] now")
    // non-literal n fails loudly, not silently
    val badN = intercept[Exception](spark.sql(
      "SELECT ngram_max_count(split(text, ' '), id) FROM native_txt").collect())
    assert(badN.getMessage.contains("integer literal"))
  }

  test("untyped (legacy-API) UDAF registers and matches the typed Aggregator") {
    Udafs.registerAll(spark)
    Udafs.registerUntyped(spark, "geomean_untyped", new Udafs.UntypedGeometricMean)
    Seq(("a", 2.0), ("a", 8.0), ("b", 5.0)).toDF("g", "x")
      .createOrReplaceTempView("udaf_t")
    val m = spark.sql(
      """SELECT g, geometric_mean(x) AS typed, geomean_untyped(x) AS untyped
        |FROM udaf_t GROUP BY g""".stripMargin)
      .as[(String, Double, Double)].collect()
      .map { case (g, t, u) => g -> ((t, u)) }.toMap
    assert(math.abs(m("a")._1 - 4.0) < 1e-9)
    assert(math.abs(m("a")._2 - 4.0) < 1e-9)
    assert(math.abs(m("b")._1 - m("b")._2) < 1e-9)
  }

  test("native scrub_runs matches the indexed-lambda HOF twin on random streams") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "bb", "bbb", "ü¢", "x")
    val rows = (1 to 200).map { i =>
      (i, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))))
    } :+ (0, Seq.empty[String])
    val df = rows.toDF("id", "toks")
    val both = df.select($"id",
        graft.functions.NativeExpressions.scrubRunsNative($"toks").as("native"),
        filter($"toks", (t, i) => (i === 0) || (t =!= get($"toks", i - 1))).as("hof"))
      .as[(Int, Seq[String], Seq[String])].collect()
    both.foreach { case (id, n, h) => assert(n === h, s"row $id") }
  }

  test("native nfc composes decomposed sequences; ASCII and composed pass through") {
    import org.apache.spark.sql.functions._
    graft.functions.NativeExpressions.registerAll(spark)
    val rows = Seq(
      (1, "cafe\u0301"),         // decomposed e + combining acute -> composed
      (2, "café"),           // already composed: unchanged
      (3, "plain ascii text"),    // ASCII fast path: unchanged
      (4, "über straße gárden"), // mixed marks
      (5, "")                     // empty
    ).toDF("id", "s")
    val out = rows.select($"id",
        graft.functions.NativeExpressions.nfcNormalizeNative($"s").as("n"))
      .as[(Int, String)].collect().toMap
    val ref = rows.as[(Int, String)].collect().toMap.view.mapValues(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)).toMap
    assert(out === ref)
    assert(out(1) === "café" && out(2) === "café")
    assert(out(3) === "plain ascii text" && out(5) === "")
    // idempotence + SQL registration + null propagation
    rows.createOrReplaceTempView("nfc_t")
    val sql = spark.sql("SELECT id, nfc(nfc(s)) AS n FROM nfc_t")
      .as[(Int, String)].collect().toMap
    assert(sql === out)
    assert(spark.sql("SELECT nfc(CAST(NULL AS STRING))").collect().head.isNullAt(0))
  }

  test("native multi_pattern_count matches brute force incl. overlaps and multi-byte") {
    import org.apache.spark.sql.functions._
    // brute force: for each pattern, count every start offset where it
    // occurs (self-overlapping included) — the Aho-Corasick contract
    def ref(s: String, pats: Seq[String]): Long =
      pats.map(p => (0 to s.length - p.length).count(i => s.startsWith(p, i)).toLong).sum
    val pats = Seq("ab", "aba", "ba", "üx", "c")
    val rnd = new scala.util.Random(99)
    val alphabet = "abcü"
    val rows = (1 to 300).map(i =>
      (i, (0 until rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)) ++
      Seq((0, ""), (1001, "ababab"), (1002, "aaaa"), (1003, "üxüxü"))
    val df = rows.toDF("id", "s")
    val out = df.select($"id",
        graft.functions.NativeExpressions.multiPatternCountNative($"s", pats).as("n"))
      .as[(Int, Long)].collect().toMap
    rows.foreach { case (id, s) =>
      assert(out(id) === ref(s, pats), s"row $id: '$s'")
    }
    // "ababab": ab×3, aba×2, ba×2 = 7 — overlapping matches all counted
    assert(out(1001) === 7L)
    // SQL registration with literal patterns + null propagation
    graft.functions.NativeExpressions.registerAll(spark)
    df.createOrReplaceTempView("ac_t")
    val viaSql = spark.sql("SELECT id, multi_pattern_count(s, 'ab', 'aba', 'ba', 'üx', 'c') FROM ac_t")
      .as[(Int, Long)].collect().toMap
    assert(viaSql === out)
    assert(spark.sql("SELECT multi_pattern_count(CAST(NULL AS STRING), 'x')")
      .collect().head.isNullAt(0))
    // non-literal pattern fails loudly
    val bad = intercept[Exception](spark.sql(
      "SELECT multi_pattern_count(s, s) FROM ac_t").collect())
    assert(bad.getMessage.contains("string-literal"))
  }

  test("native ngram_max_count matches the explode+groupBy twin on random docs") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "b", "c", "ü")
    val rows = (1 to 150).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val native = df.select($"doc_id",
          graft.functions.NativeExpressions.ngramMaxCountNative(
            TextFunctions.tokens($"text"), n).as("m"))
        .as[(Long, Long)].collect().toMap
      val twin = df.select($"doc_id",
          explode(TextFunctions.tokenNgrams($"text", n)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max($"c").as("m"))
        .as[(Long, Long)].collect().toMap
      // docs with < n tokens are absent from the exploded twin and 0 native
      rows.foreach { case (id, _) =>
        assert(native(id) === twin.getOrElse(id, 0L), s"doc $id n=$n")
      }
    }
  }

  test("scrubPii redacts emails, phones and IPs; clean text untouched") {
    val df = Seq(
      "mail me at jane.doe+x@sub.example.co.uk today",
      "call 555-123-4567 or visit 10.0.0.255 now",
      "nothing sensitive here 123").toDF("text")
    val out = df.select(TextFunctions.scrubPii($"text")).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1) === "call <PHONE> or visit <IP> now")
    assert(out(2) === "nothing sensitive here 123")
  }

  test("quality score bounded in [0,1]") {
    val df = Seq("the quick brown fox!", "", "a b c").toDF("text")
    val q = df.select(TextFunctions.qualityScore($"text")).as[Double].collect()
    assert(q.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("native minhash_sigs matches the HOF transform+array_min chain") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong(1L << 32)))
    }
    val df = rows.toDF("id", "tids")
    val perms = Dedup.DefaultPerms.map(p => (p.a, p.b))
    val native = df.select($"id", NativeExpressions.minhashSigsNative(
      $"tids", perms, Dedup.MinHashMod).as("s")).as[(Long, Seq[Long])].collect().toMap
    val hofCols = perms.zipWithIndex.map { case ((a, b), i) =>
      org.apache.spark.sql.functions.array_min(
        org.apache.spark.sql.functions.transform($"tids",
          t => (t * a + b) % Dedup.MinHashMod)).as(s"sig_$i")
    }
    val hof = df.select(($"id" +: hofCols): _*).collect()
      .map(r => r.getLong(0) -> perms.indices.map(i => r.getLong(i + 1))).toMap
    assert(native.view.mapValues(_.toSeq).toMap === hof.view.mapValues(_.toSeq).toMap)
  }

  test("native shingle_tids matches the HOF shingle+md5+conv chain as a set") {
    import graft.operators.Dedup
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b"),                          // fewer tokens than the shingle
      (3L, "x y z x y z x y z"),            // repeated shingles dedupe
      (4L, "naïve café déjà vu encore une fois"), // multi-byte UTF-8
      (5L, "one two three")).toDF("id", "text")
    for (k <- Seq(1, 3)) {
      val native = texts.select($"id",
          NativeExpressions.shingleTidsNative(TextFunctions.tokens($"text"), k).as("t"))
        .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
      val sh =
        if (k <= 1) array_distinct(TextFunctions.tokens($"text"))
        else Dedup.shingleArray($"text", k)
      val hof = texts.select($"id",
          array_distinct(transform(sh, t => Dedup.portableTokenId(t))).as("t"))
        .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
      assert(native === hof, s"k=$k diverged")
    }
  }

  test("native simhash64 matches the HOF aggregate formulation") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark shuffles and broadcasts and aggregates"),
      (3L, "one"),
      (4L, "")).toDF("doc_id", "text")
    val native = Dedup.simHash(docs, "text", "doc_id", bits = 16)
      .as[(Long, Long)].collect().toMap
    val hof = Dedup.simHashHof(docs, "text", "doc_id", bits = 16)
      .as[(Long, Long)].collect().toMap
    assert(native === hof)
  }
}
