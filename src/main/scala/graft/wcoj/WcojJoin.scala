package graft.wcoj

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed worst-case-optimal multiway join (SURVEY §7.5 step (b)): the
  * reference's PullPairExchange + LeapFrogJoin path re-expressed as a
  * single-attribute Shares partitioning over Spark.
  *
  * Partitioning scheme ("Shares-lite"): hash-partition every relation that
  * contains the FIRST attribute of the global order on that attribute;
  * broadcast the relations that don't. Each partition then runs the full
  * LeapFrog enumeration locally — correct because every output binding fixes
  * a value of the first attribute and therefore lands in exactly one
  * partition, while broadcast relations are visible everywhere.
  *
  * Scale envelope: the broadcast side must fit in executor memory (true for
  * pattern queries where every relation is a projection of the same edge
  * table and the edge table fits; the reference's full HyperCube/Shares
  * shuffle with per-attribute share vectors is the generalization — future
  * work, tracked in README). Skew on the first attribute behaves like any
  * hash-partitioned hot key; pick the highest-cardinality attribute first.
  *
  * v1 restriction: join attributes must be LongType (graph ids).
  */
object WcojJoin {

  /** Natural-join `relations` (DataFrame + its attribute names, which must
    * be Long columns) worst-case-optimally, emitting one row per binding of
    * `attrOrder`.
    */
  def leapfrog(spark: SparkSession, relations: Seq[(DataFrame, Seq[String])],
      attrOrder: Seq[String], numPartitions: Int = 0): DataFrame = {
    require(relations.nonEmpty)
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism

    val order = attrOrder.toArray
    val first = order.head

    // project each relation to its attrs REORDERED to follow the global
    // attribute order, as Array[Long] rows
    def prepared(df: DataFrame, attrs: Seq[String]): (Array[String], org.apache.spark.rdd.RDD[Array[Long]]) = {
      val sortedAttrs = attrs.sortBy(order.indexOf(_)).toArray
      val rdd = df.select(sortedAttrs.map(c => col(c).cast(LongType)): _*)
        .rdd.map(r => Array.tabulate(sortedAttrs.length)(i => r.getLong(i)))
      (sortedAttrs, rdd)
    }

    val prep = relations.map { case (df, attrs) => prepared(df, attrs) }
    val (withFirst, without) = prep.partition(_._1.contains(first))
    require(withFirst.nonEmpty, s"no relation contains leading attribute $first")

    // broadcast the relations lacking the partitioning attribute
    val bc = spark.sparkContext.broadcast(
      without.map { case (attrs, rdd) =>
        LeapFrog.Relation(attrs, LeapFrog.sortRows(rdd.collect()))
      })

    // tag rows with their relation index, then ONE shuffle on hash(first)
    val partitioner = new HashPartitioner(parts)
    val tagged = withFirst.zipWithIndex.map { case ((attrs, rdd), idx) =>
      val firstPos = attrs.indexOf(first)
      rdd.map(row => (row(firstPos), (idx, row)))
    }.reduce(_ union _)
    val routed = tagged.partitionBy(partitioner)

    val attrsByIdx = withFirst.map(_._1).toArray
    val resultRdd = routed.mapPartitions { it =>
      val buckets = Array.fill(attrsByIdx.length)(new scala.collection.mutable.ArrayBuffer[Array[Long]]())
      it.foreach { case (_, (idx, row)) => buckets(idx) += row }
      val local = attrsByIdx.indices.map { i =>
        LeapFrog.Relation(attrsByIdx(i), LeapFrog.sortRows(buckets(i).toArray))
      }
      val all = local ++ bc.value
      if (local.exists(_.rows.isEmpty)) Iterator.empty
      // lazy enumeration, O(depths) state; clone per row because external
      // Row consumers may retain references
      else LeapFrog.joinIterator(all, order).map(b => Row.fromSeq(b.clone().toIndexedSeq))
    }

    val schema = StructType(order.map(a => StructField(a, LongType, nullable = false)))
    spark.createDataFrame(resultRdd, schema)
  }

  /** The Catalyst-native WCOJ path: builds a [[LeapFrogJoinPlan]] logical
    * node (planned by [[WcojStrategy]] into [[LeapFrogJoinExec]]) so the
    * operator appears in `.explain()` and composes with downstream Catalyst
    * optimization like any built-in. Registers the strategy on the session
    * on first use (also installable via GraftExtensions).
    */
  def leapfrogCatalyst(spark: SparkSession, relations: Seq[(DataFrame, Seq[String])],
      attrOrder: Seq[String]): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(WcojStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ WcojStrategy
    }
    val order = attrOrder.toArray
    val children = relations.map { case (df, attrs) =>
      val sortedAttrs = attrs.sortBy(order.indexOf(_))
      val projected = df.select(sortedAttrs.map(c => col(c).cast(LongType)): _*)
      (org.apache.spark.sql.GraftSqlBridge.logicalPlan(projected), sortedAttrs)
    }
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      LeapFrogJoinPlan.create(children.map(_._1), children.map(_._2), attrOrder))
  }

  /** Full HyperCube/Shares leapfrog: ONE communication round for the whole
    * n-way join with NO broadcast requirement — each relation's tuples are
    * replicated only across the grid dimensions of attributes it lacks,
    * with shares chosen by [[HyperCube.optimalShares]] to minimize that
    * replication. This is the reference's PullPairExchange capability; use
    * it when no single attribute covers enough relations for [[leapfrog]]'s
    * broadcast complement to fit in memory.
    */
  def leapfrogHyperCube(spark: SparkSession, relations: Seq[(DataFrame, Seq[String])],
      attrOrder: Seq[String], maxCells: Int = 0): DataFrame = {
    require(relations.nonEmpty)
    val cells = if (maxCells > 0) maxCells else spark.sparkContext.defaultParallelism
    val order = attrOrder.toArray

    def prep(df: DataFrame, attrs: Seq[String]): (Array[String], org.apache.spark.rdd.RDD[Array[Long]]) = {
      val sortedAttrs = attrs.sortBy(order.indexOf(_)).toArray
      val rdd = df.select(sortedAttrs.map(c => col(c).cast(LongType)): _*)
        .rdd.map(r => Array.tabulate(sortedAttrs.length)(i => r.getLong(i)))
      (sortedAttrs, rdd)
    }
    // persisted: the share optimizer's count AND the routing pass both
    // consume these — without the persist every input computes twice.
    val prepped = relations.map { case (df, attrs) =>
      val (sortedAttrs, rdd) = prep(df, attrs)
      (sortedAttrs, rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

    // one stats pass (count + heavy-hitter sketches; also warms the cache),
    // then memory-budgeted skew-aware share choice — see LeapFrogJoinExec.
    val skewAware = spark.conf.get("graft.wcoj.skewAware", "true").toBoolean
    val budget = spark.conf.get("graft.wcoj.cellBudgetBytes", (64L << 20).toString).toLong
    val capConf = spark.conf.get("graft.wcoj.maxCellsCap", "4096").toInt
    val stats = prepped.map { case (attrs, rdd) => SkewStats.relStat(attrs, rdd, skewAware) }
    val cap = if (maxCells > 0) cells else math.max(cells, capConf)
    val shares = HyperCube.budgetedShares(order.toSeq, stats, cells, budget, cap).shares
    val bcShares = spark.sparkContext.broadcast(shares)
    val nCells = shares.numCells

    // route every tuple to all consistent cells
    val tagged = prepped.zipWithIndex.map { case ((attrs, rdd), idx) =>
      val attrIdx = attrs.map(a => order.indexOf(a))
      rdd.flatMap { row =>
        val sh = bcShares.value
        // fixed buckets for owned attributes, free dimensions enumerate
        val bucket = new Array[Int](order.length)
        val free = scala.collection.mutable.ArrayBuffer.empty[Int]
        var j = 0
        while (j < order.length) { bucket(j) = -1; j += 1 }
        attrs.indices.foreach { k =>
          bucket(attrIdx(k)) = sh.bucketOf(attrs(k), row(k))
        }
        (0 until order.length).foreach(j => if (bucket(j) < 0) free += j)
        def cellsFor(fi: Int, acc: Array[Int]): Iterator[Int] =
          if (fi == free.length) Iterator.single(sh.cellId(acc))
          else (0 until sh.p(free(fi))).iterator.flatMap { b =>
            val a2 = acc.clone(); a2(free(fi)) = b; cellsFor(fi + 1, a2)
          }
        cellsFor(0, bucket).map(c => (c, (idx, row)))
      }
    }.reduce(_ union _)

    val routed = tagged.partitionBy(new HashPartitioner(nCells) {
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    })
    // materialize the shuffle while inputs are cached, then free the cache;
    // the consumer job reuses the shuffle files (skipped stage)
    spark.sparkContext.runJob(routed, (_: Iterator[(Int, (Int, Array[Long]))]) => ())
    prepped.foreach(_._2.unpersist(blocking = false))

    val attrsByIdx = prepped.map(_._1).toArray
    val resultRdd = routed.mapPartitions { it =>
      val buckets = Array.fill(attrsByIdx.length)(new scala.collection.mutable.ArrayBuffer[Array[Long]]())
      it.foreach { case (_, (idx, row)) => buckets(idx) += row }
      val local = attrsByIdx.indices.map { i =>
        LeapFrog.Relation(attrsByIdx(i), LeapFrog.sortRows(buckets(i).toArray))
      }
      if (local.exists(_.rows.isEmpty)) Iterator.empty
      // lazy enumeration, O(depths) state; clone per row for Row consumers
      else LeapFrog.joinIterator(local, order).map(b => Row.fromSeq(b.clone().toIndexedSeq))
    }
    val schema = StructType(order.map(a => StructField(a, LongType, nullable = false)))
    spark.createDataFrame(resultRdd, schema)
  }
}
