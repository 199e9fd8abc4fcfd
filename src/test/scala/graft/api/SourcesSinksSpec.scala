package graft.api

import graft.SparkSpec

/** Facade source/sink round-trips: every format the facade exposes
  * (parquet, CSV, JSON, ORC, delimited text) writes and reads back the
  * same rows through EngineSession/EngineDataFrame.
  */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  lazy val session = EngineSession(spark)
  private def rows = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.0))
  private def df = session.createDatasetFromSparkSQL(rows.toDF("k", "s", "v"))
  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def asSet(e: EngineDataFrame): Set[(Long, String, Double)] =
    e.df.select("k", "s", "v").as[(Long, String, Double)].collect().toSet

  test("parquet round-trip") {
    val p = tmp("pq")
    df.writeParquet(p)
    assert(asSet(session.readParquet(p)) === rows.toSet)
  }

  test("orc round-trip") {
    val p = tmp("orc")
    df.writeOrc(p)
    assert(asSet(session.readOrc(p)) === rows.toSet)
  }

  test("csv round-trip with header + schema inference") {
    val p = tmp("csv")
    df.writeCsv(p)
    val back = session.readCsv(p)
    assert(asSet(back) === rows.toSet)
  }

  test("json round-trip") {
    val p = tmp("json")
    df.writeJson(p)
    val back = session.readJson(p)
    assert(back.df.select("k", "s", "v").as[(Long, String, Double)].collect().toSet === rows.toSet)
  }

  test("delimited text reader parses custom separator") {
    val dir = java.nio.file.Files.createTempDirectory("delim").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.txt"),
      "1|alpha\n2|beta\n".getBytes("UTF-8"))
    val back = session.readDelimited(dir, "|")
    assert(back.count() === 2)
    assert(back.df.collect().map(_.getString(1)).toSet === Set("alpha", "beta"))
  }
}
