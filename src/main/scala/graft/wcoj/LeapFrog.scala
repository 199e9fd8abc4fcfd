package graft.wcoj

import scala.collection.mutable.ArrayBuffer

/** Generic worst-case-optimal leapfrog multiway join over sorted in-memory
  * relations of Long attributes — the algorithmic core of the reference's
  * LeapFrogJoinExec/TrieInternalBlock path (execution/plan/computation/
  * localExec/LeapFrogJoinExec.scala:35-110, storage/block/TrieInternalBlock
  * .scala; algorithm re-implemented from the published LeapFrog TrieJoin
  * description, no code ported).
  *
  * Representation: instead of a materialized trie, each relation is an
  * Array[Array[Long]] sorted lexicographically; trie levels are (lo, hi) row
  * ranges refined per bound attribute, with galloping binary search for the
  * leapfrog seek. Same asymptotics (log-factor), far simpler, and
  * cache-friendlier than pointer tries.
  *
  * Allocation discipline (hot path at millions of bindings): participants
  * and their column indices are precomputed per depth (they are static —
  * they depend on the attribute order, not on bindings), range save/restore
  * uses preallocated per-depth stacks, and [[joinForeach]] exposes the
  * mutable binding to a consumer without cloning (copy if retained).
  *
  * Requirements: each relation's attribute list must be ordered consistently
  * with the global attribute order (reorder columns when preparing input).
  */
object LeapFrog {

  final case class Relation(attrs: Array[String], rows: Array[Array[Long]])

  /** Sort rows lexicographically — call once when preparing a relation. */
  def sortRows(rows: Array[Array[Long]]): Array[Array[Long]] = {
    val ord = new Ordering[Array[Long]] {
      override def compare(x: Array[Long], y: Array[Long]): Int = {
        var i = 0
        while (i < x.length) {
          val c = java.lang.Long.compare(x(i), y(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
    rows.sorted(ord)
  }

  /** Enumerate all bindings of `attrOrder`; `consume` receives the SHARED
    * mutable binding array — copy it if you keep it.
    */
  def joinForeach(relations: Seq[Relation], attrOrder: Array[String])(
      consume: Array[Long] => Unit): Unit = {
    relations.foreach { r =>
      val positions = r.attrs.map(attrOrder.indexOf(_))
      require(positions.forall(_ >= 0), s"relation attr not in order: ${r.attrs.mkString(",")}")
      require(positions.sameElements(positions.sorted),
        s"relation attrs must follow global order: ${r.attrs.mkString(",")}")
    }

    val n = relations.size
    val rels = relations.toArray
    val depths = attrOrder.length

    // static per-depth structure: which relations participate at depth d and
    // which of their columns the attribute maps to
    val partByDepth = Array.ofDim[Array[Int]](depths)
    val colByDepth = Array.ofDim[Array[Int]](depths)
    for (d <- 0 until depths) {
      val attr = attrOrder(d)
      val ids = (0 until n).filter(i => rels(i).attrs.contains(attr))
      require(ids.nonEmpty, s"attribute $attr not covered by any relation")
      partByDepth(d) = ids.toArray
      colByDepth(d) = ids.map(i => rels(i).attrs.indexOf(attr)).toArray
    }

    val lo = Array.fill(n)(0)
    val hi = rels.map(_.rows.length)
    val binding = new Array[Long](depths)
    // preallocated save stacks: one slot per (depth, participant)
    val savedLo = Array.ofDim[Array[Int]](depths)
    val savedHi = Array.ofDim[Array[Int]](depths)
    val curLoAll = Array.ofDim[Array[Int]](depths)
    for (d <- 0 until depths) {
      savedLo(d) = new Array[Int](partByDepth(d).length)
      savedHi(d) = new Array[Int](partByDepth(d).length)
      curLoAll(d) = new Array[Int](partByDepth(d).length)
    }

    def lowerBound(rows: Array[Array[Long]], col: Int, from: Int, to: Int, x: Long): Int = {
      var a = from; var b = to
      while (a < b) {
        val m = (a + b) >>> 1
        if (rows(m)(col) < x) a = m + 1 else b = m
      }
      a
    }
    def upperBound(rows: Array[Array[Long]], col: Int, from: Int, to: Int, x: Long): Int =
      lowerBound(rows, col, from, to, x + 1)

    def recurse(depth: Int): Unit = {
      if (depth == depths) { consume(binding); return }
      val part = partByDepth(depth)
      val cols = colByDepth(depth)
      val p = part.length
      val curLo = curLoAll(depth)

      var exhausted = false
      var maxVal = Long.MinValue
      var k = 0
      while (k < p) {
        val i = part(k)
        curLo(k) = lo(i)
        if (curLo(k) >= hi(i)) exhausted = true
        else {
          val v = rels(i).rows(curLo(k))(cols(k))
          if (v > maxVal) maxVal = v
        }
        k += 1
      }
      while (!exhausted) {
        var aligned = 0
        k = 0
        while (aligned < p && !exhausted) {
          val i = part(k)
          val pos = lowerBound(rels(i).rows, cols(k), curLo(k), hi(i), maxVal)
          if (pos >= hi(i)) exhausted = true
          else {
            curLo(k) = pos
            val v = rels(i).rows(pos)(cols(k))
            if (v == maxVal) aligned += 1
            else { maxVal = v; aligned = 1 }
          }
          k = (k + 1) % p
        }
        if (!exhausted) {
          binding(depth) = maxVal
          val sLo = savedLo(depth)
          val sHi = savedHi(depth)
          var j = 0
          while (j < p) {
            val i = part(j)
            sLo(j) = lo(i); sHi(j) = hi(i)
            val s = curLo(j)
            lo(i) = s
            hi(i) = upperBound(rels(i).rows, cols(j), s, hi(i), maxVal)
            j += 1
          }
          recurse(depth + 1)
          j = 0
          while (j < p) {
            val i = part(j)
            lo(i) = sLo(j); hi(i) = sHi(j)
            j += 1
          }
          if (maxVal == Long.MaxValue) exhausted = true else maxVal += 1
        }
      }
    }

    recurse(0)
  }

  /** Materializing wrapper over [[joinForeach]] (clones each binding). */
  def join(relations: Seq[Relation], attrOrder: Array[String]): Iterator[Array[Long]] = {
    val out = new ArrayBuffer[Array[Long]]()
    joinForeach(relations, attrOrder)(b => out += b.clone())
    out.iterator
  }
}
