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

  /** Enumerate all bindings of `attrOrder` joining every relation.
    * Emits one Array[Long] per result (binding in attr order).
    */
  def join(relations: Seq[Relation], attrOrder: Array[String]): Iterator[Array[Long]] = {
    relations.foreach { r =>
      val positions = r.attrs.map(attrOrder.indexOf(_))
      require(positions.forall(_ >= 0), s"relation attr not in order: ${r.attrs.mkString(",")}")
      require(positions.sameElements(positions.sorted),
        s"relation attrs must follow global order: ${r.attrs.mkString(",")}")
    }

    val n = relations.size
    val rels = relations.toArray
    // per relation: how many of its attrs are bound so far, and (lo, hi) range
    val depthOf = Array.fill(n)(0)
    val lo = Array.fill(n)(0)
    val hi = rels.map(_.rows.length)
    val binding = new Array[Long](attrOrder.length)
    val out = new ArrayBuffer[Array[Long]]()

    /** first row index in [from, to) with row(col) >= x (rows sorted on col
      * within the range because all earlier cols are fixed).
      */
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
      if (depth == attrOrder.length) { out += binding.clone(); return }
      val attr = attrOrder(depth)
      val part = (0 until n).filter(i => depthOf(i) < rels(i).attrs.length &&
        rels(i).attrs(depthOf(i)) == attr).toArray
      if (part.isEmpty) {
        // attribute constrained by no remaining relation: would be a cross
        // product over an unbounded domain — caller error for our use cases
        throw new IllegalArgumentException(s"attribute $attr not covered at depth $depth")
      }

      // leapfrog intersection over the participating relations' current
      // ranges: align all on a common value, bind+recurse, advance past it.
      val curLo = part.map(i => lo(i))
      var exhausted = false
      var maxVal = Long.MinValue
      for (k <- part.indices) {
        val i = part(k)
        if (curLo(k) >= hi(i)) exhausted = true
        else {
          val v = rels(i).rows(curLo(k))(depthOf(i))
          if (v > maxVal) maxVal = v
        }
      }
      while (!exhausted) {
        // align every participating relation to >= maxVal; p consecutive
        // equalities after the last bump means all sit on maxVal
        var aligned = 0
        var k = 0
        while (aligned < part.length && !exhausted) {
          val i = part(k)
          val col = depthOf(i)
          val pos = lowerBound(rels(i).rows, col, curLo(k), hi(i), maxVal)
          if (pos >= hi(i)) exhausted = true
          else {
            curLo(k) = pos
            val v = rels(i).rows(pos)(col)
            if (v == maxVal) aligned += 1
            else { maxVal = v; aligned = 1 }
          }
          k = (k + 1) % part.length
        }
        if (!exhausted) {
          binding(depth) = maxVal
          val savedLo = part.map(i => lo(i))
          val savedHi = part.map(i => hi(i))
          for (j <- part.indices) {
            val i = part(j)
            val col = depthOf(i)
            val s = curLo(j)
            val e = upperBound(rels(i).rows, col, s, hi(i), maxVal)
            lo(i) = s; hi(i) = e; depthOf(i) += 1
          }
          recurse(depth + 1)
          for (j <- part.indices) {
            val i = part(j)
            lo(i) = savedLo(j); hi(i) = savedHi(j); depthOf(i) -= 1
          }
          if (maxVal == Long.MaxValue) exhausted = true else maxVal += 1
        }
      }
    }

    recurse(0)
    out.iterator
  }
}
