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
  * ranges refined per bound attribute, with binary-search seeks. Same
  * asymptotics (log-factor), far simpler, and cache-friendlier than pointer
  * tries.
  *
  * Allocation discipline (hot path at millions of bindings): participants
  * and their column indices are precomputed per depth (static given the
  * attribute order), range save/restore uses preallocated per-depth stacks,
  * and consumers see the shared mutable binding (copy if retained).
  *
  * Memory discipline: [[joinIterator]] is fully lazy — O(depths) state, one
  * binding per next(), no buffering at all (a 4-cycle query emitting tens
  * of millions of bindings per cell OOMs any materialize-everything
  * formulation, and even per-chunk buffering costs one allocation per
  * binding).
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

  /** Shared enumeration state + core loops. */
  private final class Session(relations: Seq[Relation], attrOrder: Array[String]) {
    relations.foreach { r =>
      val positions = r.attrs.map(attrOrder.indexOf(_))
      require(positions.forall(_ >= 0), s"relation attr not in order: ${r.attrs.mkString(",")}")
      require(positions.sameElements(positions.sorted),
        s"relation attrs must follow global order: ${r.attrs.mkString(",")}")
    }

    val n: Int = relations.size
    val rels: Array[Relation] = relations.toArray
    val depths: Int = attrOrder.length

    /** columnar copy of each relation: colData(rel)(col)(row). The seek
      * loops are binary searches over single columns — a flat long[] per
      * column turns every probe into one bounds-checked array read instead
      * of a row-object dereference plus an inner-array read (row-major
      * Array[Array[Long]] costs a dependent load per probe and scatters the
      * rows across the heap).
      */
    val colData: Array[Array[Array[Long]]] = rels.map { r =>
      val width = r.attrs.length
      val m = r.rows.length
      val cols = Array.ofDim[Long](width, m)
      var row = 0
      while (row < m) {
        val src = r.rows(row)
        var c = 0
        while (c < width) { cols(c)(row) = src(c); c += 1 }
        row += 1
      }
      cols
    }

    val partByDepth: Array[Array[Int]] = Array.ofDim(depths)
    val colByDepth: Array[Array[Int]] = Array.ofDim(depths)
    /** colByDepth resolved to the flat column array — the hot loops index
      * this directly. */
    val colArrByDepth: Array[Array[Array[Long]]] = Array.ofDim(depths)
    for (d <- 0 until depths) {
      val attr = attrOrder(d)
      val ids = (0 until n).filter(i => rels(i).attrs.contains(attr))
      require(ids.nonEmpty, s"attribute $attr not covered by any relation")
      partByDepth(d) = ids.toArray
      colByDepth(d) = ids.map(i => rels(i).attrs.indexOf(attr)).toArray
      colArrByDepth(d) = partByDepth(d).zip(colByDepth(d)).map { case (i, c) => colData(i)(c) }
    }

    val lo: Array[Int] = Array.fill(n)(0)
    val hi: Array[Int] = rels.map(_.rows.length)
    val binding: Array[Long] = new Array[Long](depths)
    val savedLo: Array[Array[Int]] = Array.tabulate(depths)(d => new Array[Int](partByDepth(d).length))
    val savedHi: Array[Array[Int]] = Array.tabulate(depths)(d => new Array[Int](partByDepth(d).length))
    val curLoAll: Array[Array[Int]] = Array.tabulate(depths)(d => new Array[Int](partByDepth(d).length))

    def lowerBound(col: Array[Long], from: Int, to: Int, x: Long): Int = {
      var a = from; var b = to
      while (a < b) {
        val m = (a + b) >>> 1
        if (col(m) < x) a = m + 1 else b = m
      }
      a
    }
    def upperBound(col: Array[Long], from: Int, to: Int, x: Long): Int =
      lowerBound(col, from, to, x + 1)

    /** Intersect participating relations at `depth`; invoke `onValue` for
      * each aligned value with ranges positioned (curLo at the value).
      */
    def intersect(depth: Int)(onValue: Long => Unit): Unit = {
      val part = partByDepth(depth)
      val cols = colArrByDepth(depth)
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
          val v = cols(k)(curLo(k))
          if (v > maxVal) maxVal = v
        }
        k += 1
      }
      while (!exhausted) {
        var aligned = 0
        k = 0
        while (aligned < p && !exhausted) {
          val i = part(k)
          val pos = lowerBound(cols(k), curLo(k), hi(i), maxVal)
          if (pos >= hi(i)) exhausted = true
          else {
            curLo(k) = pos
            val v = cols(k)(pos)
            if (v == maxVal) aligned += 1
            else { maxVal = v; aligned = 1 }
          }
          k += 1; if (k == p) k = 0
        }
        if (!exhausted) {
          onValue(maxVal)
          if (maxVal == Long.MaxValue) exhausted = true else maxVal += 1
        }
      }
    }

    /** Narrow participant ranges to the current aligned value; returns after
      * saving previous ranges into the depth's stacks.
      */
    def narrow(depth: Int, value: Long): Unit = {
      val part = partByDepth(depth)
      val cols = colArrByDepth(depth)
      val curLo = curLoAll(depth)
      val sLo = savedLo(depth)
      val sHi = savedHi(depth)
      var j = 0
      while (j < part.length) {
        val i = part(j)
        sLo(j) = lo(i); sHi(j) = hi(i)
        val s = curLo(j)
        lo(i) = s
        hi(i) = upperBound(cols(j), s, hi(i), value)
        j += 1
      }
    }

    def restore(depth: Int): Unit = {
      val part = partByDepth(depth)
      val sLo = savedLo(depth)
      val sHi = savedHi(depth)
      var j = 0
      while (j < part.length) {
        val i = part(j)
        lo(i) = sLo(j); hi(i) = sHi(j)
        j += 1
      }
    }

    def recurse(depth: Int, consume: Array[Long] => Unit): Unit = {
      if (depth == depths) { consume(binding); return }
      if (depth == depths - 1) {
        // deepest attribute: nothing below reads the narrowed ranges, so the
        // per-binding narrow (2 binary searches per participant) + restore
        // are pure waste — emit straight from the intersection.
        intersect(depth) { v =>
          binding(depth) = v
          consume(binding)
        }
      } else {
        intersect(depth) { v =>
          binding(depth) = v
          narrow(depth, v)
          recurse(depth + 1, consume)
          restore(depth)
        }
      }
    }
  }

  /** Enumerate all bindings of `attrOrder`; `consume` receives the SHARED
    * mutable binding array — copy it if you keep it.
    */
  def joinForeach(relations: Seq[Relation], attrOrder: Array[String])(
      consume: Array[Long] => Unit): Unit =
    new Session(relations, attrOrder).recurse(0, consume)

  /** Fully lazy enumeration — the paper's native iterator form: an explicit
    * depth state machine that yields one binding per `next()` with O(depths)
    * state, no per-chunk buffering and no per-binding allocation. The
    * returned Iterator yields the SHARED mutable binding array — callers
    * project/copy before retaining (exactly the UnsafeRow-reuse contract of
    * SparkPlan.execute()).
    */
  def joinIterator(relations: Seq[Relation], attrOrder: Array[String]): Iterator[Array[Long]] = {
    if (attrOrder.isEmpty) return Iterator.empty
    val s = new Session(relations, attrOrder)
    if (s.rels.exists(_.rows.isEmpty)) return Iterator.empty

    new Iterator[Array[Long]] {
      private val D = s.depths
      private val posVal = new Array[Long](D)
      private var started = false
      private var pending = false
      private var exhausted = false

      /** Leapfrog alignment at depth dd from the current cursors, seeking
        * values >= target; positions all participants on the first common
        * value, records it, and returns true — false when the intersection
        * at this depth is exhausted.
        */
      private def align(dd: Int, target0: Long): Boolean = {
        val part = s.partByDepth(dd); val cols = s.colArrByDepth(dd); val curLo = s.curLoAll(dd)
        val p = part.length
        var target = target0
        var aligned = 0
        var k = 0
        while (aligned < p) {
          val i = part(k)
          val from = if (curLo(k) > s.lo(i)) curLo(k) else s.lo(i)
          val pos = s.lowerBound(cols(k), from, s.hi(i), target)
          if (pos >= s.hi(i)) return false
          curLo(k) = pos
          val v = cols(k)(pos)
          if (v == target) aligned += 1
          else { target = v; aligned = 1 }
          k += 1; if (k == p) k = 0
        }
        posVal(dd) = target
        s.binding(dd) = target
        true
      }

      /** First positioning at depth dd: cursors reset to the depth's open
        * ranges, then aligned on the smallest common value.
        */
      private def initDepth(dd: Int): Boolean = {
        val part = s.partByDepth(dd); val curLo = s.curLoAll(dd)
        var k = 0
        while (k < part.length) {
          val i = part(k)
          curLo(k) = s.lo(i)
          if (curLo(k) >= s.hi(i)) return false
          k += 1
        }
        align(dd, Long.MinValue)
      }

      /** Next aligned value after the current one at depth dd (ranges must
        * be in their un-narrowed state for this depth).
        */
      private def advanceDepth(dd: Int): Boolean =
        posVal(dd) != Long.MaxValue && align(dd, posVal(dd) + 1)

      /** Backtrack from depth `from` (narrowed depths only, i.e. ≤ D-2):
        * undo narrows upward until some depth advances; re-narrow there.
        * Returns the depth to descend from (advanced depth + 1), or -1 when
        * the whole enumeration is done.
        */
      private def backtrack(from: Int): Int = {
        var cur = from
        while (cur >= 0) {
          s.restore(cur)
          if (advanceDepth(cur)) {
            s.narrow(cur, posVal(cur))
            return cur + 1
          }
          cur -= 1
        }
        -1
      }

      private def computeNext(): Boolean = {
        // The deepest depth is never narrowed: nothing below reads the
        // narrowed ranges, so the per-binding narrow (2 binary searches per
        // participant) + restore would be pure waste. Advancing it is just
        // the next alignment; only depths ≤ D-2 take part in backtracking.
        var cur =
          if (!started) { started = true; 0 }
          else if (advanceDepth(D - 1)) return true
          else backtrack(D - 2)
        if (cur < 0) return false
        while (cur < D) {
          if (initDepth(cur)) {
            if (cur == D - 1) return true
            s.narrow(cur, posVal(cur))
            cur += 1
          } else {
            cur = backtrack(cur - 1)
            if (cur < 0) return false
          }
        }
        true
      }

      override def hasNext: Boolean = {
        if (pending) true
        else if (exhausted) false
        else {
          pending = computeNext()
          if (!pending) exhausted = true
          pending
        }
      }

      override def next(): Array[Long] = {
        if (!hasNext) throw new NoSuchElementException("leapfrog exhausted")
        pending = false
        s.binding
      }
    }
  }

  /** Materializing wrapper over [[joinForeach]] (clones each binding). */
  def join(relations: Seq[Relation], attrOrder: Array[String]): Iterator[Array[Long]] = {
    val out = new ArrayBuffer[Array[Long]]()
    joinForeach(relations, attrOrder)(b => out += b.clone())
    out.iterator
  }
}
