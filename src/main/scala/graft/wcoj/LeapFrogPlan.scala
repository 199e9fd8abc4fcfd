package graft.wcoj

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan}
import org.apache.spark.sql.types.LongType

/** The worst-case-optimal join as a first-class Catalyst operator
  * (SURVEY §7.2: "custom SparkStrategy + physical op") — the (c) route of
  * the custom-operator preference order, replacing the mapPartitions
  * wrapper with a plan node Catalyst sees, optimizes around, and shows in
  * `.explain()`.
  *
  * Children must each emit exactly their attribute list (Long columns,
  * ordered consistently with `attrOrder`); output is one row per binding of
  * `attrOrder`.
  */
final case class LeapFrogJoinPlan(
    children: Seq[LogicalPlan],
    childAttrs: Seq[Seq[String]],
    attrOrder: Seq[String],
    override val output: Seq[Attribute]) extends LogicalPlan {

  // output attributes are constructor state, NOT recomputed per instance:
  // tree transforms copy() the node, and fresh exprIds would orphan every
  // downstream reference (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).

  // the bindings are NEW attributes, not pass-throughs of child columns —
  // declare them produced or the analyzer reports MISSING_ATTRIBUTES.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet

  // EVERY child column is consumed (each is a trie level), but the node
  // carries no Catalyst expressions, so the derived `references` would be
  // EMPTY — and ColumnPruning's generic case prunes any child column not in
  // `child.references ++ parent.references`. With a Project/Aggregate
  // directly above (e.g. `node.groupBy("a").count()` — no Filter in
  // between), that pruned the join inputs to a column subset and the
  // enumeration silently matched nothing. Declaring the true references
  // makes pruning keep all join columns.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(children.flatMap(_.output))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan = copy(children = newChildren)
}

object LeapFrogJoinPlan {
  def create(children: Seq[LogicalPlan], childAttrs: Seq[Seq[String]],
      attrOrder: Seq[String]): LeapFrogJoinPlan =
    LeapFrogJoinPlan(children, childAttrs, attrOrder,
      attrOrder.map(a => AttributeReference(a, LongType, nullable = false)()))
}

/** Physical operator: HyperCube/Shares routing + per-cell leapfrog.
  * Distribution is performed internally (flatMap-replicate + partitionBy),
  * like CartesianProductExec handles its own cross-distribution, so no
  * requiredChildDistribution contract is imposed on the children.
  */
final case class LeapFrogJoinExec(
    children: Seq[SparkPlan],
    childAttrs: Seq[Seq[String]],
    attrOrder: Seq[String],
    maxCells: Int,
    override val output: Seq[Attribute]) extends SparkPlan with CodegenSupport {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = copy(children = newChildren)

  @transient private lazy val order: Array[String] = attrOrder.toArray

  @transient private lazy val attrsByIdx: Array[Array[String]] =
    childAttrs.map(_.sortBy(order.indexOf(_)).toArray).toArray

  /** The share vector the optimizer actually chose (observability + specs);
    * populated when the routing pipeline first materializes.
    */
  @transient @volatile var chosen: Option[HyperCube.SizedShares] = None

  /** HyperCube routing pipeline: children → global-order long arrays →
    * share-optimized cell replication → one partition per cell. Shared by
    * the interpreted and whole-stage-codegen paths.
    */
  @transient private lazy val routed: RDD[(Int, (Int, Array[Long]))] = {
    val sc = sparkContext
    val cells = if (maxCells > 0) maxCells else sc.defaultParallelism
    val ord = order

    // children -> RDD[Array[Long]] in global-order column layout; persisted
    // because both the share optimizer's count and the routing pass below
    // consume them — without the persist every child plan executes twice.
    val prepped = children.zip(childAttrs).map { case (child, attrs) =>
      val sortedAttrs = attrs.sortBy(ord.indexOf(_)).toArray
      val perm = sortedAttrs.map(attrs.indexOf(_))
      val n = attrs.length
      (sortedAttrs, child.execute().map { row =>
        Array.tabulate(n)(i => row.getLong(perm(i)))
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

    // one stats pass over the cached inputs (count + per-attribute heavy-
    // hitter sketches), then memory-budgeted skew-aware share choice: the
    // grid grows past the parallelism floor whenever the estimated max cell
    // payload would outgrow the per-task byte budget. An explicit maxCells
    // stays a hard user cap (fixed-grid behavior, as before).
    val skewAware = session.conf.get("graft.wcoj.skewAware", "true").toBoolean
    val budget = session.conf.get("graft.wcoj.cellBudgetBytes", (64L << 20).toString).toLong
    val capConf = session.conf.get("graft.wcoj.maxCellsCap", "4096").toInt
    val stats = SkewStats.relStats(prepped, skewAware)
    val cap = if (maxCells > 0) cells else math.max(cells, capConf)
    // measured-small single-cell route: when every relation together fits
    // comfortably in one task (default 4 MB of routed payload), a
    // parallelism-floor grid only buys scheduler overhead — free-attribute
    // replication fans tiny rows into ~32 near-empty cells and the trie
    // work fragments into sub-millisecond tasks (the S7 capped-graph gate's
    // fixed ~0.8 s apparatus). One cell = one co-located enumeration, same
    // machinery. An explicit maxCells (a user's fixed grid) wins as before.
    //
    // BUT input bytes alone are blind to output cardinality: a cyclic join
    // with tiny inputs can have AGM-large output (the 4-cycle on the
    // sf0.1 medium graph routes ~4 MB yet enumerates 27.8M bindings —
    // serialized into one task that collapse cost ×6.5). So the collapse
    // additionally requires a small ESTIMATED OUTPUT, bounded two ways and
    // taking the tighter: (1) the AGM bound Π nᵢ^xᵢ at the optimal
    // fractional edge cover over the in-hand RelStat counts — free, but
    // blind to degree caps (capped-graph S6: AGM 5.9e7 vs 1.6e5 actual);
    // (2) when AGM alone says "too big", one EXACT degree-sequence bound
    // job over the still-cached inputs — milliseconds by construction,
    // since this regime already measured ≤ singleCellBytes of payload.
    // Budget default 16M bindings: one doubling above the largest measured
    // single-cell WINNER (dense triangle, bound 9.2M / actual 8.3M, beats
    // the grid 1.27 vs 1.40 s), and 20× under the smallest measured LOSER
    // (the 4-cycle, bound 3.9e8 — grid 2.3 s vs serial 8.5+ s). At the
    // budget a worst-case serial tail is ~2.5 s (codegen'd count
    // enumeration measures ~6M bindings/s/task) — the same order as the
    // grid's fixed apparatus, so the threshold sits at the break-even.
    val singleCellBytes =
      session.conf.get("graft.wcoj.singleCellBytes", (4L << 20).toString).toLong
    val bindingBudget = session.conf.get(
      "graft.wcoj.singleCellMaxBindings", (16L << 20).toString).toLong
    // stale-proof the observability conf (ADVICE r15): the bound is only
    // COMPUTED inside the byte-gated branch below, so a query that skips
    // that branch (big inputs, or an explicit grid) must not leave an
    // earlier query's bound behind for ScaleCheck to misattribute
    if (session.conf.getOption("graft.wcoj.lastOutputBound").isDefined)
      session.conf.unset("graft.wcoj.lastOutputBound")
    val smallOutput = maxCells <= 0 &&
      stats.map(_.bytes).sum <= singleCellBytes && {
        val agm = graft.plans.FractionalEdgeCover.agmBound(
          ord.toSet, stats.map(s => (s.attrs, s.rows)))
        val bound =
          if (agm <= bindingBudget.toDouble) agm
          else math.min(agm, SkewStats.degreeBound(prepped, ord.toSeq))
        session.conf.set("graft.wcoj.lastOutputBound",
          math.min(bound, Long.MaxValue.toDouble).toLong.toString)
        bound <= bindingBudget.toDouble
      }
    val sized =
      if (smallOutput) HyperCube.optimalSharesStat(ord.toSeq, stats, 1)
      else HyperCube.budgetedShares(ord.toSeq, stats, cells, budget, cap)
    session.conf.set("graft.wcoj.lastCells", sized.shares.numCells.toString)
    chosen = Some(sized)
    val shares = sized.shares
    val bcShares = sc.broadcast(shares)
    val nCells = shares.numCells

    val tagged = prepped.zipWithIndex.map { case ((attrs, rdd), idx) =>
      val attrIdx = attrs.map(a => ord.indexOf(a))
      rdd.flatMap { row =>
        val sh = bcShares.value
        val bucket = Array.fill(ord.length)(-1)
        attrs.indices.foreach(k => bucket(attrIdx(k)) = sh.bucketOf(attrs(k), row(k)))
        val free = (0 until ord.length).filter(bucket(_) < 0)
        def cellsFor(fi: Int, acc: Array[Int]): Iterator[Int] =
          if (fi == free.length) Iterator.single(sh.cellId(acc))
          else (0 until sh.p(free(fi))).iterator.flatMap { b =>
            val a2 = acc.clone(); a2(free(fi)) = b; cellsFor(fi + 1, a2)
          }
        cellsFor(0, bucket).map(c => (c, (idx, row)))
      }
    }.reduce(_ union _)

    val byCell = tagged.partitionBy(new HashPartitioner(nCells) {
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    })
    // Materialize the shuffle map stage now, while the children are cached,
    // then release the cache: the no-op result stage fetches nothing, and
    // the real job below reuses the shuffle files (skipped stage) instead of
    // recomputing child plans.
    sc.runJob(byCell, (_: Iterator[(Int, (Int, Array[Long]))]) => ())
    prepped.foreach(_._2.unpersist(blocking = false))
    byCell
  }

  /** Per-partition prologue + lazy leapfrog enumeration, called from BOTH
    * paths (generated code invokes it through a plan reference). Bindings
    * come out as raw long[] in attr order — the codegen consumer reads the
    * columns straight from the array, no row materialization at all.
    */
  def buildBindingIterator(raw: Iterator[InternalRow]): Iterator[Array[Long]] = {
    val it = raw.asInstanceOf[Iterator[(Int, (Int, Array[Long]))]]
    val buckets = Array.fill(attrsByIdx.length)(new scala.collection.mutable.ArrayBuffer[Array[Long]]())
    it.foreach { case (_, (idx, row)) => buckets(idx) += row }
    val local = attrsByIdx.indices.map { i =>
      LeapFrog.Relation(attrsByIdx(i), LeapFrog.sortRows(buckets(i).toArray))
    }
    if (local.exists(_.rows.isEmpty)) Iterator.empty
    else LeapFrog.joinIterator(local, order)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = output
    val n = order.length
    routed.mapPartitions { it =>
      // fully lazy enumeration with direct Unsafe projection: O(depths)
      // state, zero per-binding allocation. The emitted UnsafeRow buffer
      // is REUSED across bindings — the standard SparkPlan.execute()
      // contract (buffering consumers copy for themselves, as
      // HashAggregate/Sort/shuffle-write/collect all do).
      val proj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val values = new Array[Any](n)
      val reusable = new GenericInternalRow(values)
      buildBindingIterator(it.asInstanceOf[Iterator[InternalRow]]).map { b =>
        var i = 0
        while (i < b.length) { values(i) = b(i); i += 1 }
        proj(reusable)
      }
    }
  }

  /* == whole-stage codegen: this node is a produce root. The enumeration
   * stays in the allocation-free scala iterator; the generated loop reads
   * each binding's columns as primitive longs and feeds the downstream
   * consume chain (filter, partial aggregate, projection) INLINE — no
   * UnsafeProjection per binding, no InputAdapter row hand-off. == */

  // bindings surface as fresh primitive locals each iteration (never a
  // reused row buffer), so downstream buffering needs no defensive copy.
  // Must be overridden: the trait default throws for > 1 child.
  override def needCopyResult: Boolean = false

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    Seq(routed.asInstanceOf[RDD[InternalRow]])

  override protected def doProduce(ctx: CodegenContext): String = {
    val thisPlan = ctx.addReferenceObj("leapfrog", this, classOf[LeapFrogJoinExec].getName)
    val input = ctx.addMutableState("scala.collection.Iterator", "lfInput",
      v => s"$v = inputs[0];", forceInline = true)
    val iterTerm = ctx.addMutableState("scala.collection.Iterator", "lfBindings",
      forceInline = true)
    val binding = ctx.freshName("binding")
    val colVars = output.indices.map { i =>
      val name = ctx.freshName(s"lfCol$i")
      ExprCode.forNonNullValue(JavaCode.variable(name, LongType))
    }
    val colDecls = output.indices.map { i =>
      s"long ${colVars(i).value} = $binding[$i];"
    }.mkString("\n")
    s"""
       |if ($iterTerm == null) {
       |  $iterTerm = $thisPlan.buildBindingIterator($input);
       |}
       |while ($iterTerm.hasNext()) {
       |  long[] $binding = (long[]) $iterTerm.next();
       |  $colDecls
       |  ${consume(ctx, colVars).trim}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

/** Planner strategy turning the logical node into the exec (SURVEY §7.5(b)). */
object WcojStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ LeapFrogJoinPlan(children, childAttrs, attrOrder, _) =>
      LeapFrogJoinExec(children.map(planLater), childAttrs, attrOrder,
        maxCells = 0, p.output) :: Nil
    case _ => Nil
  }
}
