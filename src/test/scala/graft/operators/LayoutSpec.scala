package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits matches the reference Morton computation") {
    def morton(xs: Seq[Long], bits: Int): Long =
      (for (b <- 0 until bits; (x, ci) <- xs.zipWithIndex)
        yield ((x >> b) & 1L) << (b * xs.size + ci)).reduce(_ | _)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
    val out = rows.toDF("x", "y")
      .select(Layout.interleaveBits(Seq($"x", $"y"), 16).as("z"))
      .as[Long].collect().toSeq
    assert(out === rows.map { case (x, y) => morton(Seq(x, y), 16) })
    // the classic sanity points: (1,0)->1, (0,1)->2 at any width
    assert(out(1) === 1L && out(2) === 2L)
  }

  test("interleaveBits rejects widths that overflow a long") {
    intercept[IllegalArgumentException] {
      Layout.interleaveBits(Seq($"x", $"y", $"z", $"w"), 16)
    }
  }

  test("z-order layout makes per-file min/max selective on BOTH dimensions") {
    // a grid where x and y are independent: linear order is selective on x
    // only; the z-curve must tighten per-file y-spans dramatically
    val n = 64
    val grid = (0 until n * n).map(i => (i / n, i % n)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    val zPath = new java.io.File(dir, "z").getAbsolutePath
    val linPath = new java.io.File(dir, "lin").getAbsolutePath
    try {
      Layout.zOrderWrite(grid, zPath, Seq("x", "y"), partitions = 16)
      grid.repartitionByRange(16, $"x", $"y").sortWithinPartitions("x", "y")
        .write.mode("overwrite").parquet(linPath)

      def meanSpan(path: String, c: String): Double = {
        val files = spark.read.parquet(path).inputFiles
        val spans = files.map { f =>
          val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
          (r.getInt(1) - r.getInt(0)).toDouble
        }
        spans.sum / spans.length
      }
      // linear layout carves x finely (span ~3) but leaves y unselective
      // (span ~63); the z-curve instead forms balanced square tiles
      // (~16x16 for 256-row files), so BOTH dimensions become selective
      val (zX, zY) = (meanSpan(zPath, "x"), meanSpan(zPath, "y"))
      val linY = meanSpan(linPath, "y")
      assert(zY < linY / 3, s"z-order y-span $zY not well under linear $linY")
      assert(zX < linY / 3, s"z-order x-span $zX not well under linear $linY")
      assert(math.max(zX, zY) < 2 * math.min(zX, zY),
        s"z tiles unbalanced: x $zX vs y $zY")
      // round trip: no rows lost, helper column dropped
      val back = spark.read.parquet(zPath)
      assert(back.columns.toSeq.sorted === Seq("x", "y"))
      assert(back.count() === n.toLong * n)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("zValue handles nulls, constant columns and non-numeric ranges") {
    val df = Seq((Some(1.0), 5L), (None, 5L), (Some(3.0), 5L)).toDF("a", "b")
    // constant b: span collapses to rank 0 for all; null a ranks 0
    val z = df.select(Layout.zValue(df, Seq("a", "b"), bits = 8).as("z"))
      .as[Long].collect()
    assert(z.length === 3)
    assert(z.forall(_ >= 0L))
    assert(z(1) === 0L) // null a, constant b → all-zero ranks
  }

  test("zValue survives an empty input and an all-null column") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(empty.select(Layout.zValue(empty, Seq("a", "b")).as("z")).count() === 0L)
    val allNull = Seq((Option.empty[Double], 1L), (None, 2L)).toDF("a", "b")
    val z = allNull.select(Layout.zValue(allNull, Seq("a", "b"), bits = 4).as("z"))
      .as[Long].collect()
    assert(z.length === 2 && z.forall(_ >= 0L))
  }
}

class TrainingShardsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("writeTrainingShards partitions by shard with resumable id order") {
    val docs = (1L to 200L).map(i => (i, s"text body number $i", 10 + (i % 7)))
      .toDF("doc_id", "text", "n")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      val packed = graft.operators.Layout.writeTrainingShards(
        docs, "doc_id", col("n"), budget = 100L, path = dir, format = "json")
      val nShards = packed.select("shard").distinct().count()
      assert(nShards > 1, "budget must split the corpus into multiple shards")
      // hive-partitioned layout: one directory per shard
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
      assert(shardDirs.size.toLong === nShards)
      // round-trip: every doc present exactly once, shard matches packing
      val back = spark.read.json(dir).select("doc_id", "shard")
        .as[(Long, Long)].collect().toMap
      val expect = packed.select("doc_id", "shard")
        .as[(Long, Long)].collect().toMap
      assert(back === expect)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("partitioned write prunes directories at planning time on a partition filter") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hivepart").toString + "/t"
    try {
      val df = Seq(
        (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 11.0),
        (3L, "2024-01-02", 12.0), (4L, "2024-01-03", 13.0))
        .toDF("id", "day", "v")
      Layout.writePartitioned(df, dir, Seq("day"))
      // one directory per day value
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).toSet
      assert(dirs === Set("day=2024-01-01", "day=2024-01-02", "day=2024-01-03"))
      val back = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
      assert(back.select("id").as[Long].collect().toSeq === Seq(3L))
      back.collect()
      val plan = back.queryExecution.executedPlan.toString
      // the day filter is a PartitionFilter (directory skip), never a data
      // filter that would open every file
      assert(plan.contains("PartitionFilters") &&
        plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("day"), s"day filter not pushed to partition pruning:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("compactPartitions merges only over-fragmented dirs, preserves content") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    def parquetFiles(part: String): Int =
      new java.io.File(s"$dir/$part").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    try {
      // grp=0 fragmented (4 appends × repartition(3)), grp=1 one file
      val frag = (1L to 120L).map(i => (i, s"row $i")).toDF("id", "text")
        .withColumn("grp", lit(0))
      for (i <- 0 until 4)
        frag.filter(col("id") % 4 === i).repartition(3)
          .write.mode("append").partitionBy("grp").parquet(dir)
      (200L to 210L).map(i => (i, s"row $i")).toDF("id", "text")
        .withColumn("grp", lit(1)).coalesce(1)
        .write.mode("append").partitionBy("grp").parquet(dir)
      val before = spark.read.parquet(dir)
        .select("id", "text", "grp").as[(Long, String, Int)].collect().toSet
      assert(parquetFiles("grp=0") === 12)
      val oneFileBefore = new java.io.File(s"$dir/grp=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

      val report = Layout.compactPartitions(spark, dir, targetBytes = 1L << 30)
      assert(report.map(r => (r._1, r._2, r._3)) === Seq(("grp=0", 12, 1)))
      assert(parquetFiles("grp=0") === 1)
      // the already-compact dir kept its exact file — never rewritten
      assert(new java.io.File(s"$dir/grp=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
        === oneFileBefore)
      // content byte-identical after the rewrite
      val after = spark.read.parquet(dir)
        .select("id", "text", "grp").as[(Long, String, Int)].collect().toSet
      assert(after === before)
      // second pass: nothing left to compact — a no-op, not a rewrite loop
      assert(Layout.compactPartitions(spark, dir, 1L << 30).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("compactPartitions recurses to the leaves of a multi-level layout") {
    val dir = java.nio.file.Files.createTempDirectory("compact_ml").toString + "/t"
    try {
      // two-level hive layout a=·/b=· — parquet files live only at the
      // leaves, so a single-level listing would see empty dirs and
      // silently no-op (the round-10 advice finding)
      val df = (1L to 80L).map(i => (i, i % 2, i % 3, s"row $i"))
        .toDF("id", "a", "b", "text")
      for (k <- 0 until 3)
        df.filter(col("id") % 3 === k).repartition(2)
          .write.mode("append").partitionBy("a", "b").parquet(dir)
      val before = spark.read.parquet(dir)
        .select("id", "a", "b", "text").as[(Long, Long, Long, String)]
        .collect().toSet
      val report = Layout.compactPartitions(spark, dir, targetBytes = 1L << 30)
      // every leaf was fragmented (3 appends × repartition(2)); the report
      // names leaves by their FULL relative path, not the top level
      assert(report.nonEmpty)
      assert(report.forall { case (p, nIn, nOut) =>
        p.matches("a=\\d+/b=\\d+") && nIn > 1 && nOut === 1
      }, s"unexpected report: $report")
      val leaves = for (a <- 0 to 1; b <- 0 to 2) yield s"a=$a/b=$b"
      assert(report.map(_._1).toSet === leaves.toSet)
      leaves.foreach { leaf =>
        val n = new java.io.File(s"$dir/$leaf").listFiles()
          .count(f => f.isFile && f.getName.endsWith(".parquet"))
        assert(n === 1, s"$leaf holds $n files after compaction")
      }
      val after = spark.read.parquet(dir)
        .select("id", "a", "b", "text").as[(Long, Long, Long, String)]
        .collect().toSet
      assert(after === before)
      assert(Layout.compactPartitions(spark, dir, 1L << 30).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("compactPartitions drains ~100 fragmented dirs through the bounded pool") {
    val dir = java.nio.file.Files.createTempDirectory("compact_wide").toString + "/t"
    try {
      // 100 partition dirs, each fragmented by 2 appends (the split key
      // id/100 is independent of grp = id%100, so EVERY grp lands rows in
      // BOTH appends — guaranteed ≥ 2 files per dir; a split on id%2 would
      // correlate with grp parity and leave half the dirs single-append)
      val df = (0L until 400L).map(i => (i, i % 100, s"row $i"))
        .toDF("id", "grp", "text")
      for (k <- 0 until 2)
        df.filter((col("id") / 100).cast("long") % 2 === k).repartition(2)
          .write.mode("append").partitionBy("grp").parquet(dir)
      val before = spark.read.parquet(dir).count()
      val report = Layout.compactPartitions(spark, dir,
        targetBytes = 1L << 30, parallelism = 8)
      assert(report.size === 100, s"expected all 100 dirs compacted, got ${report.size}")
      assert(report.forall(_._3 === 1))
      // the pool actually engaged: per-dir rewrites overlapped, so wall
      // time is bounded by pool width, not by issuing 100 jobs serially
      assert(Layout.lastCompactPeakConcurrency >= 2,
        s"rewrites never overlapped (peak=${Layout.lastCompactPeakConcurrency})")
      assert(spark.read.parquet(dir).count() === before)
      assert(Layout.compactPartitions(spark, dir, 1L << 30).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }
}
