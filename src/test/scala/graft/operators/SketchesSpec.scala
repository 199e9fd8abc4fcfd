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

  test("distinctErrorProfile reports calibrated relative error") {
    val r = Sketches.distinctErrorProfile(nums, "bucket")
      .as[(Long, Long, Double)].head()
    assert(r._1 === 100L)
    assert(r._3 < 0.1)
  }
}
