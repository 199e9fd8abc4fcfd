package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Session façade with the capabilities of the reference's `SeccoSession`
  * (SeccoSession.scala:18-135), delegating to a [[SparkSession]].
  *
  * Extras the reference keeps in its private catalog:
  *   - a primary-key registry (catalog/interface.scala:102) consumed by the
  *     PK-FK join-reorder rule — Spark has no native PK concept, so it lives
  *     here as session-scoped metadata.
  */
final class EngineSession(val spark: SparkSession) {

  /** table name -> primary key columns (reference: CatalogTable.primaryKeys). */
  private val primaryKeys = TrieMap.empty[String, Seq[String]]

  // install the PK-FK join-reorder rule (SURVEY §7.6); idempotent on a
  // shared session. Also installable at submit time via
  // spark.sql.extensions=graft.plans.GraftExtensions.
  if (!spark.experimental.extraOptimizations.contains(graft.plans.PkFkJoinReorder)) {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.PkFkJoinReorder
  }

  /** SQL entry point (SeccoSession.scala:89-91) — full Spark SQL, a strict
    * superset of the reference's hand-rolled grammar (SURVEY §2.7).
    */
  def sql(text: String): EngineDataFrame = EngineDataFrame(spark.sql(text), this)

  /** Temp-view lookup (SeccoSession.scala:78-85). */
  def table(name: String): EngineDataFrame = EngineDataFrame(spark.table(name), this)

  /** Leaf construction from local rows (SeccoSession.scala:27-45). */
  def createDatasetFromSeq(rows: Seq[Row], schema: StructType): EngineDataFrame =
    EngineDataFrame(spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema), this)

  /** Leaf construction from an existing DataFrame (SeccoDataFrame.scala:421-454). */
  def createDatasetFromSparkSQL(df: DataFrame): EngineDataFrame = EngineDataFrame(df, this)

  /** Leaf construction from an RDD (SeccoSession.createDatasetFromRDD,
    * SeccoSession.scala:46-59).
    */
  def createDatasetFromRDD(rdd: org.apache.spark.rdd.RDD[Row], schema: StructType): EngineDataFrame =
    EngineDataFrame(spark.createDataFrame(rdd, schema), this)

  /* == file sources/sinks — the reference has none (SURVEY §2.5: collect-only
   * output, programmatic ingestion + a text DataLoader); Spark natively
   * provides them, surfaced here for facade completeness. == */

  def readParquet(path: String): EngineDataFrame = EngineDataFrame(spark.read.parquet(path), this)
  def readCsv(path: String, header: Boolean = true, inferSchema: Boolean = true): EngineDataFrame =
    EngineDataFrame(spark.read.option("header", header).option("inferSchema", inferSchema).csv(path), this)
  def readJson(path: String): EngineDataFrame = EngineDataFrame(spark.read.json(path), this)
  /** text-file loader with a delimiter — the reference's util DataLoader capability. */
  def readDelimited(path: String, delimiter: String): EngineDataFrame =
    EngineDataFrame(spark.read.option("header", "false").option("delimiter", delimiter).csv(path), this)

  /** Empty dataset with schema (SeccoSession.scala:60-68). */
  def createEmptyDataset(schema: StructType): EngineDataFrame =
    EngineDataFrame(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema), this)

  /** Register a table's primary key for the PK-FK join optimizer. */
  def registerPrimaryKey(table: String, keys: Seq[String]): Unit = {
    primaryKeys.put(table, keys)
    graft.plans.PkFkJoinReorder.registerPrimaryKey(table, keys)
  }

  def primaryKeyOf(table: String): Option[Seq[String]] = primaryKeys.get(table)

  def dropTable(name: String): Unit = spark.catalog.dropTempView(name)

  /** Statistics collection (reference Statistics/StatsPlanVisitor role,
    * SURVEY §4.2): ANALYZE feeds Catalyst CBO; enable joinReorder to let the
    * cost-based optimizer use them alongside the PK-FK rule.
    */
  def analyzeTable(name: String, columns: Seq[String] = Nil): Unit = {
    // column-level ANALYZE only works on cached temp views (Spark restriction)
    if (spark.catalog.tableExists(name) && !spark.catalog.isCached(name)) {
      try spark.catalog.cacheTable(name) catch { case _: Exception => () }
    }
    if (columns.isEmpty) spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
    else spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** Write a bucketed+sorted table: joins/aggregations on the bucket
    * columns between co-bucketed tables need NO shuffle — the pre-partitioned
    * layout Spark's `EnsureRequirements` recognizes. The 100 TB technique for
    * repeatedly-joined fact tables (bucket both sides on the join key with
    * the same bucket count).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit = {
    // a previous JVM may have left the managed location on disk without a
    // catalog entry; overwrite mode then fails with LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def enableCbo(): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }
}

object EngineSession {
  /** Local default mirroring SeccoSession.newDefaultSession. Shuffle
    * partitions sized to cores (not 200) and AQE on — at cluster scale these
    * come from spark-submit conf instead.
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): EngineSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new EngineSession(spark)
  }

  def apply(spark: SparkSession): EngineSession = new EngineSession(spark)
}
