package graft.wcoj

import org.apache.spark.rdd.RDD

/** One-pass per-relation statistics for the share optimizer: row count plus a
  * per-column Misra-Gries heavy-hitter sketch (the per-attribute frequency
  * input the reference's EnumShareComputer draws from its Statistics layer,
  * optimization/statsEstimation/Statistics.scala:27-70 — here collected on
  * the fly from the already-persisted prepared inputs, so it replaces rather
  * than adds to the counting pass).
  *
  * Misra-Gries guarantees `estimate(x) ≥ freq(x) − n/k`, so the reported max
  * frequency is a LOWER bound — errors push the optimizer toward the classic
  * uniform model, never toward phantom skew.
  */
object SkewStats {

  /** Mergeable Misra-Gries summary over Long keys, capacity k counters. */
  final class MisraGries(val k: Int) extends Serializable {
    private val counts = new scala.collection.mutable.LongMap[Long]()

    def add(x: Long): Unit = {
      val c = counts.getOrElse(x, 0L)
      if (c > 0L) counts(x) = c + 1L
      else if (counts.size < k) counts(x) = 1L
      else decrementAll(1L)
    }

    // classic step: an absent key with full counters decrements everyone
    // (snapshot first — no structural mutation mid-iteration)
    private def decrementAll(by: Long): Unit = {
      val n = counts.size
      val keys = new Array[Long](n)
      val vals = new Array[Long](n)
      var i = 0
      counts.foreach { case (key, c) => keys(i) = key; vals(i) = c; i += 1 }
      var j = 0
      while (j < n) {
        if (vals(j) <= by) counts.remove(keys(j)) else counts(keys(j)) = vals(j) - by
        j += 1
      }
    }

    /** Merge: sum counters, then shrink back to k by subtracting the
      * (k+1)-largest count from all (the standard mergeable-MG reduction —
      * preserves the n/k error bound).
      */
    def merge(o: MisraGries): MisraGries = {
      o.counts.foreach { case (key, c) =>
        counts(key) = counts.getOrElse(key, 0L) + c
      }
      if (counts.size > k) {
        val sorted = counts.values.toArray
        java.util.Arrays.sort(sorted)
        val cut = sorted(sorted.length - k - 1)
        decrementAll(cut)
      }
      this
    }

    /** Lower bound on the heaviest value's count (0 when empty). */
    def maxCount: Long = if (counts.isEmpty) 0L else counts.values.max

    /** The heaviest value's IDENTITY with its count lower bound — so a
      * consumer summing hot masses across relations can group by the value
      * (different heavy values hash to different tasks; only same-value
      * masses co-locate). Deterministic tie-break by smallest key.
      */
    def maxEntry: Option[(Long, Long)] =
      if (counts.isEmpty) None
      else Some(counts.toSeq.minBy { case (k, c) => (-c, k) })
  }

  /** AccumulatorV2 over one [[MisraGries]] — lets the leading-attribute
    * skew guard piggyback sketch collection on the routing shuffle's MAP
    * side: clean inputs pay no extra pass at all (a dedicated stats job
    * measured as a +20% tax on the whole join), and the value is read
    * after the shuffle materializes. A retried map task can only
    * OVERcount, which errs toward the perf-only hypercube reroute, never
    * toward missing real skew.
    */
  final class MgAccumulator(k: Int = 32)
      extends org.apache.spark.util.AccumulatorV2[Long, MisraGries] {
    private var sk = new MisraGries(k)
    override def isZero: Boolean = sk.maxCount == 0L
    override def copy(): MgAccumulator = {
      val c = new MgAccumulator(k)
      c.sk = new MisraGries(k).merge(sk)
      c
    }
    override def reset(): Unit = sk = new MisraGries(k)
    override def add(v: Long): Unit = sk.add(v)
    override def merge(
        o: org.apache.spark.util.AccumulatorV2[Long, MisraGries]): Unit =
      sk.merge(o.value): Unit
    override def value: MisraGries = sk
  }

  /** One aggregate pass over prepared rows: (rowCount, per-column sketches). */
  def collect(rdd: RDD[Array[Long]], width: Int, k: Int = 32): (Long, Array[MisraGries]) =
    rdd.treeAggregate((0L, Array.fill(width)(new MisraGries(k))))(
      seqOp = { case ((n, sk), row) =>
        var i = 0
        while (i < width) { sk(i).add(row(i)); i += 1 }
        (n + 1, sk)
      },
      combOp = { case ((n1, a), (n2, b)) =>
        var i = 0
        while (i < width) { a(i).merge(b(i)); i += 1 }
        (n1 + n2, a)
      })

  /** Build the optimizer's [[HyperCube.RelStat]] from a prepared relation.
    * `skewAware=false` skips the sketches (plain count, uniform model).
    * Bytes are the routed-payload estimate: an Array[Long] row costs
    * 8·width data + ~24 object/header overhead.
    */
  def relStat(attrs: Array[String], rdd: RDD[Array[Long]],
      skewAware: Boolean): HyperCube.RelStat = {
    val width = attrs.length
    if (!skewAware) {
      val n = rdd.count()
      HyperCube.RelStat(attrs.toSet, n, n * (8L * width + 24))
    } else {
      val (n, sketches) = collect(rdd, width)
      val heavy =
        if (n == 0) Map.empty[String, Double]
        else attrs.indices.map(i => attrs(i) -> sketches(i).maxCount.toDouble / n).toMap
      HyperCube.RelStat(attrs.toSet, n, n * (8L * width + 24), heavy)
    }
  }
}
