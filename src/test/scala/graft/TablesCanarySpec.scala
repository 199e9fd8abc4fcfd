package graft

import org.apache.spark.sql.types._

/** Testdata-drift canary: the driver regenerates /root/testdata between
  * rounds and has already changed column encodings once (events.ts went from
  * parquet TIMESTAMP(NANOS) to native timestamp[us] before round 8, silently
  * erroring 8 query gates). This spec pins the ENGINE-FACING schema of every
  * `Tables` member — post-conversion, i.e. what the queries actually see — so
  * any future drift in the generated data or the loader fails loudly here
  * rather than at the driver's correctness gate.
  *
  * The committed fixtures under fixtures/tsenc_{nanos,micros}/ hold identical
  * logical rows in both ts encodings the driver has shipped; `Tables.events`
  * must load both to the same TimestampType micros.
  */
class TablesCanarySpec extends SparkSpec {

  private lazy val t = Tables(spark, sf0001)

  private def fields(df: org.apache.spark.sql.DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType))

  test("engine-facing schemas of all tables at sf0.001") {
    assert(fields(t.region) == Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields(t.nation) == Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields(t.customer) == Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assert(fields(t.supplier) == Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields(t.part) == Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
    assert(fields(t.documents) == Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType))
    assert(fields(t.embeddings) == Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

    // Datetime columns must arrive as a Spark timestamp family (TIMESTAMP or
    // TIMESTAMP_NTZ both work downstream — queries cast/date_trunc them) and
    // never as raw longs or strings.
    def isTs(dt: DataType): Boolean = dt == TimestampType || dt == TimestampNTZType
    val orders = fields(t.orders)
    assert(orders.map(_._1) == Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(isTs(orders.toMap.apply("o_orderdate")))
    val lineitem = fields(t.lineitem)
    assert(lineitem.map(_._1) == Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    assert(isTs(lineitem.toMap.apply("l_shipdate")))
  }

  test("events loads to TimestampType micros regardless of parquet ts encoding") {
    // sf0.001 — whatever encoding the driver generated this round:
    assert(fields(t.events) == Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))

    // Both committed encodings load to the same values:
    val nanos  = Tables(spark, "fixtures/tsenc_nanos").events
    val micros = Tables(spark, "fixtures/tsenc_micros").events
    assert(nanos.schema("ts").dataType == TimestampType)
    assert(micros.schema("ts").dataType == TimestampType)
    val get = (df: org.apache.spark.sql.DataFrame) =>
      df.selectExpr("event_id", "unix_micros(ts) AS us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val (a, b) = (get(nanos), get(micros))
    assert(a == b)
    assert(a == Seq(1L -> 1700000000000000L, 2L -> 1700000123456789L,
      3L -> 1700009876543210L, 4L -> 1700001111222333L))
  }

  test("spreadScan widens a narrow scan, is the identity when wide/disabled") {
    // r18: parquet splits cannot subdivide a row group, so a single-file
    // table serializes its scan-stage map on one core; spreadScan hash-
    // repartitions ONLY when the scan carries < half the cluster width.
    val docs = t.documents
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "precondition: the sf0.001 documents scan must be narrow")
    val spread = Tables.spreadScan(docs, "doc_id")
    assert(spread.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    // values are the table's, untouched (count + id sum — order-free)
    import org.apache.spark.sql.functions._
    val (a, b) = (docs.agg(count(lit(1)), sum("doc_id")).head(),
      spread.agg(count(lit(1)), sum("doc_id")).head())
    assert(a === b)
    // already-wide input: identity (the 100 TB posture — no extra shuffle)
    val wide = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    assert(Tables.spreadScan(wide, "doc_id") eq wide)
    // conf "0" disables (the A/B probe arm)
    spark.conf.set("graft.scan.spreadWidth", "0")
    try assert(Tables.spreadScan(docs, "doc_id") eq docs)
    finally spark.conf.unset("graft.scan.spreadWidth")
  }
}
