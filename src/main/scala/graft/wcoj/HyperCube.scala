package graft.wcoj

/** HyperCube (Shares) partitioning math — the reference's
  * HyperCubePartitioner + EnumShareComputer capability
  * (execution/plan/communication/HyperCubePartitioner.scala:23-167,
  * ShareComputer.scala:30-216; re-derived from the published Shares/HyperCube
  * algorithm, no code ported).
  *
  * Each join attribute a gets a share p_a; the task grid is the cartesian
  * product of attribute buckets (Π p_a cells). A tuple of relation R is sent
  * to every cell that agrees with hash(value)%p_a on R's attributes —
  * replication factor Π_{a∉R} p_a. Every potential output binding maps to
  * exactly one cell, so a single round of communication suffices for any
  * n-way join (the property binary join chains lack).
  */
object HyperCube {

  final case class Shares(attrs: Array[String], p: Array[Int]) {
    val numCells: Int = p.product
    /** mixed-radix cell id from per-attribute bucket indices. */
    def cellId(bucket: Array[Int]): Int = {
      var id = 0
      var i = 0
      while (i < p.length) { id = id * p(i) + bucket(i); i += 1 }
      id
    }
    def bucketOf(attr: String, value: Long): Int = {
      val i = attrs.indexOf(attr)
      (((value.hashCode.toLong % p(i)) + p(i)) % p(i)).toInt
    }
  }

  /** Enumerate share vectors with Π p_a ≤ maxCells and pick the one
    * minimizing the expected PER-CELL input load
    *   (Σ_R |R| · Π_{a ∉ attrs(R)} p_a) / Π p_a
    * (the EnumShareComputer objective: communication subject to spreading
    * work across the budgeted grid — raw total communication alone is
    * trivially minimized by a single cell). Ties: lower total communication,
    * then larger grid.
    */
  def optimalShares(attrs: Seq[String], relations: Seq[(Set[String], Long)],
      maxCells: Int): Shares = {
    val as = attrs.toArray
    var best: Option[(Shares, Double, Double)] = None

    def rec(i: Int, acc: List[Int], cells: Int): Unit = {
      if (i == as.length) {
        val shares = Shares(as, acc.reverse.toArray)
        val comm = relations.map { case (rAttrs, size) =>
          val repl = as.indices.filter(j => !rAttrs.contains(as(j))).map(shares.p(_)).product
          size.toDouble * repl
        }.sum
        val load = comm / shares.numCells
        val better = best match {
          case None => true
          case Some((b, bl, bc)) =>
            load < bl - 1e-9 ||
              (math.abs(load - bl) <= 1e-9 && (comm < bc - 1e-9 ||
                (math.abs(comm - bc) <= 1e-9 && shares.numCells > b.numCells)))
        }
        if (better) best = Some((shares, load, comm))
      } else {
        var pi = 1
        while (cells * pi <= maxCells) {
          rec(i + 1, pi :: acc, cells * pi)
          pi += 1
        }
      }
    }
    rec(0, Nil, 1)
    best.get._1
  }
}
