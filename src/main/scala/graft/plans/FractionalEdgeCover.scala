package graft.plans

/** Minimum fractional edge cover via a small dense-simplex LP solver.
  *
  * For a hypergraph bag with vertex set V and edges E ⊆ P(V), solve
  *   minimize   Σ_e x_e
  *   subject to Σ_{e ∋ v} x_e ≥ 1  for every v ∈ V,  x ≥ 0.
  *
  * The optimum ρ* is the AGM exponent of the bag: |output| ≤ Π |R_e|^{x_e},
  * the quantity GHD ranking minimizes (fhtw). Standard two-phase simplex on
  * the dual (a packing LP, which is already in canonical ≤ form) keeps the
  * implementation tiny: by LP duality, min fractional edge cover = max
  * fractional vertex packing  (maximize Σ_v y_v s.t. Σ_{v ∈ e} y_v ≤ 1 ∀e).
  *
  * Problem sizes here are query-shaped (≤ ~12 edges/vertices), so a dense
  * array simplex with Bland's rule is plenty.
  */
object FractionalEdgeCover {

  /** @param vertices bag vertex ids 0..n-1
    * @param edges    each edge = set of vertex ids it covers (restricted to the bag)
    * @return (ρ*, x) — the cover number and per-edge weights
    */
  def solve(nVertices: Int, edges: Seq[Set[Int]]): (Double, Array[Double]) = {
    require(nVertices > 0 && edges.nonEmpty, "empty bag")
    require((0 until nVertices).forall(v => edges.exists(_.contains(v))),
      "uncoverable vertex: no edge contains it")

    // Solve the PRIMAL directly in standard form with artificial-free
    // big-M-free two phase: rewrite cover constraints Σ x_e ≥ 1 as
    // -Σ x_e ≤ -1 is not canonical; instead solve the DUAL packing LP
    // (≤ constraints, 0 rhs-positive) whose optimum equals ρ* by strong
    // duality, and read the primal solution off the final tableau's
    // reduced costs of the slack columns.
    val m = edges.size        // dual constraints (one per edge)
    val n = nVertices         // dual variables y_v ≥ 0

    // tableau: rows = m constraints + objective row; cols = n vars + m slacks + rhs
    val cols = n + m + 1
    val T = Array.ofDim[Double](m + 1, cols)
    for ((e, i) <- edges.zipWithIndex) {
      e.foreach(v => T(i)(v) = 1.0)
      T(i)(n + i) = 1.0
      T(i)(cols - 1) = 1.0
    }
    // objective: maximize Σ y_v  → row holds -c for max
    (0 until n).foreach(v => T(m)(v) = -1.0)

    val basis = Array.tabulate(m)(i => n + i)
    var iter = 0
    while (iter < 10000) {
      // entering: first column with negative objective coefficient (Bland)
      val enter = (0 until n + m).find(j => T(m)(j) < -1e-9)
      enter match {
        case None => iter = 10000 // optimal
        case Some(j) =>
          // leaving: min ratio rule, Bland tie-break on basis index
          var leave = -1
          var best = Double.PositiveInfinity
          for (i <- 0 until m if T(i)(j) > 1e-9) {
            val ratio = T(i)(cols - 1) / T(i)(j)
            if (ratio < best - 1e-12 || (math.abs(ratio - best) <= 1e-12 && (leave == -1 || basis(i) < basis(leave)))) {
              best = ratio; leave = i
            }
          }
          require(leave >= 0, "unbounded packing LP (cannot happen: y ≤ 1 per singleton edge)")
          // pivot
          val p = T(leave)(j)
          for (c <- 0 until cols) T(leave)(c) /= p
          for (r <- 0 to m if r != leave) {
            val f = T(r)(j)
            if (math.abs(f) > 1e-12) for (c <- 0 until cols) T(r)(c) -= f * T(leave)(c)
          }
          basis(leave) = j
          iter += 1
      }
    }

    val rho = T(m)(cols - 1)
    // primal x_e = reduced cost of the e-th slack column in the final tableau
    val x = Array.tabulate(m)(i => T(m)(n + i))
    (rho, x)
  }

  /** ρ* of a bag given edges as attribute sets (convenience). */
  def coverNumber(bagAttrs: Set[String], edgeAttrs: Seq[Set[String]]): Double = {
    val verts = bagAttrs.toSeq.sorted.zipWithIndex.toMap
    val restricted = edgeAttrs.map(_.intersect(bagAttrs).map(verts)).filter(_.nonEmpty)
    if (bagAttrs.isEmpty) 0.0 else solve(verts.size, restricted)._1
  }

  /** The AGM output bound itself: Π |R_e|^{x_e} at the optimal fractional
    * edge cover — a true worst-case cap on the join's binding count from row
    * counts alone. Edges that don't touch the bag contribute nothing; empty
    * relations are floored at 1 row (their exponent is then moot — callers
    * short-circuit empty inputs before asking for a bound).
    *
    * The LP minimizes Σ x_e (the cover number), not Σ x_e·log|R_e| — on
    * asymmetric relation sizes the returned bound can therefore be looser
    * than the tightest AGM bound. ANY fractional cover yields a valid upper
    * bound, and looseness errs toward keeping the parallel grid — the safe
    * direction for the single-cell router this feeds.
    */
  def agmBound(bagAttrs: Set[String], edges: Seq[(Set[String], Long)]): Double = {
    if (bagAttrs.isEmpty) return 1.0
    val verts = bagAttrs.toSeq.sorted.zipWithIndex.toMap
    val kept = edges.zipWithIndex
      .map { case ((as, n), i) => (as.intersect(bagAttrs).map(verts), n, i) }
      .filter(_._1.nonEmpty)
    val (_, x) = solve(verts.size, kept.map(_._1))
    // sum in log space: exponents up to the edge count keep the product far
    // from Double overflow for any realistic count, but log is cheap and safe
    math.exp(kept.zip(x).map { case ((_, n, _), xe) =>
      xe * math.log(math.max(n, 1L).toDouble)
    }.sum)
  }
}
