package graft.operators

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  lazy val nums = (1L to 1000L).map(i => (i, i % 100)).toDF("id", "bucket")

  test("approxDistinct is close to exact (100 distinct buckets)") {
    val est = Sketches.approxDistinct(nums, "bucket").as[Long].head()
    assert(math.abs(est - 100L) <= 10L)
    val grouped = Sketches.approxDistinct(nums, "id", Seq("bucket"))
    assert(grouped.count() === 100L)
  }

  test("approxQuantiles brackets the true median") {
    val Seq(q50) = Sketches.approxQuantiles(nums, "id", Seq(0.5), 0.01)
    assert(q50 >= 450.0 && q50 <= 550.0)
  }

  test("bloom filter: no false negatives, prunes most non-members") {
    val members = nums.filter($"id" <= 100)
    val bf = Sketches.bloomFilter(members, "id", expectedItems = 100, fpp = 0.01)
    val kept = Sketches.inBloom(nums, "id", bf).as[(Long, Long)].collect().map(_._1).toSet
    assert((1L to 100L).forall(kept.contains)) // every member survives
    assert(kept.size <= 120)                   // ~1% fpp of the 900 non-members
  }

  test("count-min sketch estimates frequencies within bound") {
    val cms = Sketches.countMinSketch(nums, "bucket", eps = 0.001, confidence = 0.99)
    // bucket 5 appears 10 times in 1..1000 (% 100); CMS never underestimates
    val est = cms.estimateCount(5L)
    assert(est >= 10L && est <= 15L)
  }

  test("rows-CMS: never underestimates, per-batch merge equals direct build") {
    import org.apache.spark.sql.functions._
    // zipf-ish keys: key k appears (101 - k) times, across two "batches"
    val rows = (1L to 100L).flatMap(k => Seq.fill((101 - k).toInt)(k))
    val df = rows.toDF("k")
      .withColumn("batch", when($"k" % 2 === 0, "b1").otherwise("b2"))
    val width = 32 // small enough to force collisions

    val direct = Sketches.cmsBuildRows(df, "k", Nil, width = width)
    val merged = Sketches.cmsMergeRows(
      Sketches.cmsBuildRows(df, "k", Seq("batch"), width = width))
    // merging per-batch sketches (batches never rescanned) is bit-identical
    // to the sketch built over all data at once
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)

    val probes = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(probes, direct, "k", width = width)
      .as[(Long, Long, Long)].collect()
    est.foreach { case (k, exact, e) =>
      assert(e >= exact, s"CMS underestimated key $k: $e < $exact")
    }
    // with width 32 < 100 keys, collisions must inflate at least one key
    assert(est.exists { case (_, exact, e) => e > exact })

    // differential against a Scala replica of the bucket math: EVERY
    // estimate — inserted or never-seen (empty buckets take the left-join
    // coalesce path) — must equal min over d of that bucket's true count
    def bucketOf(k: Long, a: Long, b: Long): Int =
      (((k * a + b) % Sketches.CmsPrime) % width).toInt
    val trueCounts: Map[(Int, Int), Long] = rows
      .flatMap(k => Sketches.CmsPerms.zipWithIndex.map { case ((a, b), i) =>
        (i, bucketOf(k, a, b)) })
      .groupBy(identity).map { case (db, hits) => (db, hits.size.toLong) }
    def expected(k: Long): Long = Sketches.CmsPerms.zipWithIndex.map {
      case ((a, b), i) => trueCounts.getOrElse((i, bucketOf(k, a, b)), 0L)
    }.min
    val probeKeys = (1L to 100L) ++ Seq(100000L, 424242L, 4294967295L)
    Sketches.cmsEstimate(probeKeys.toDF("k"), direct, "k", width = width)
      .as[(Long, Long)].collect().foreach { case (k, e) =>
        assert(e === expected(k), s"estimate for key $k")
      }

    // duplicate probe rows stay distinct rows (the estimate is added to
    // probes, never aggregated over them)
    val dup = Sketches.cmsEstimate(Seq(5L, 5L).toDF("k"), direct, "k", width = width)
      .as[(Long, Long)].collect()
    assert(dup.length === 2 && dup.toSet.size === 1)

    // weighted build from the pre-aggregated (key, count) multiset is
    // bit-identical to the row-expanded build
    val weighted = Sketches.cmsBuildRows(
      df.groupBy("k").agg(count(lit(1)).as("w")), "k",
      width = width, weightCol = Some("w"))
    assert(weighted.except(direct).isEmpty && direct.except(weighted).isEmpty)

    // out-of-domain keys fail loudly instead of silently wrapping
    intercept[Exception] {
      Sketches.cmsBuildRows(Seq(-1L).toDF("k"), "k", width = width).count()
    }

    // reserved/colliding column names are rejected up front, not emitted as
    // duplicate/ambiguous output columns
    intercept[IllegalArgumentException] {
      Sketches.cmsBuildRows(df.withColumn("bucket", lit(1)), "k", Seq("bucket"))
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(Seq(5L).toDF("est"), direct, "est")
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(Seq(5L).toDF("k").withColumn("__rid", lit(1L)),
        direct, "k")
    }
  }

  test("distinctErrorProfile reports calibrated relative error") {
    val r = Sketches.distinctErrorProfile(nums, "bucket")
      .as[(Long, Long, Double)].head()
    assert(r._1 === 100L)
    assert(r._3 < 0.1)
  }

  test("mergeable HLL sketches: per-batch build, union without rescanning") {
    import org.apache.spark.sql.functions._
    // two ingest "batches" with overlapping keys
    val batch1 = (1L to 600L).toDF("k").withColumn("batch", lit("b1"))
    val batch2 = (401L to 1000L).toDF("k").withColumn("batch", lit("b2"))
    val sketches = Sketches.hllSketchPerGroup(batch1.union(batch2), "k", Seq("batch"))
    assert(sketches.count() === 2) // one binary sketch per batch

    // union of the two PER-BATCH sketches — the batches themselves never
    // rescanned — estimates the global distinct count
    val merged = Sketches.hllMergeEstimate(sketches, Nil)
      .select("distinct_est").as[Long].head()
    assert(math.abs(merged - 1000L) <= 30L, s"merged estimate $merged far from 1000")

    // and tracks the sketch built over all data at once (union may promote
    // sketch representation differently, so close — not bit-identical)
    val whole = Sketches.hllSketchPerGroup(
        batch1.union(batch2).withColumn("g", lit(1)), "k", Seq("g"))
    val wholeEst = Sketches.hllMergeEstimate(whole, Nil)
      .select("distinct_est").as[Long].head()
    assert(math.abs(merged - wholeEst) <= 10L, s"union $merged vs direct $wholeEst")
  }
}
