package graft.plans

import scala.collection.mutable

/** Join hypergraph + GHD machinery — the engine-independent math behind the
  * reference's FK-FK join optimization (OptimizeMultiwayJoin,
  * optimization/rules/join.scala:233-270; GHDDecomposer.scala;
  * JoinHyperGraph.scala — semantics re-derived from the standard definitions,
  * no code ported).
  *
  * A relation is a hyperedge over its join attributes. Capabilities:
  *   - GYO ear-reduction acyclicity test
  *   - generalized hypertree decomposition (GHD) enumeration for small
  *     queries, ranked by fractional hypertree width (AGM exponent per bag)
  *   - a join order derived from the best GHD: each bag joined internally,
  *     bags joined along the tree — cyclic cores stay inside a bag where a
  *     worst-case-optimal strategy (or plain hash joins) can handle them.
  */
object JoinHyperGraph {

  /** One relation: an id and the attribute names it joins on. */
  final case class Edge(id: Int, attrs: Set[String])

  final case class Bag(attrs: Set[String], edgeIds: Seq[Int], width: Double)

  /** A GHD: bags + tree edges (parent/child pairs by bag index). */
  final case class Decomposition(bags: Seq[Bag], treeEdges: Seq[(Int, Int)]) {
    def fhtw: Double = bags.map(_.width).max
  }

  /** GYO reduction: repeatedly remove ears (isolated vertices and edges
    * contained in another edge). Empty result ⇔ α-acyclic query.
    */
  def isAcyclic(edges: Seq[Set[String]]): Boolean = {
    var es = edges.filter(_.nonEmpty).map(identity)
    var changed = true
    while (changed && es.nonEmpty) {
      changed = false
      // vertices appearing in exactly one edge are removable
      val counts = mutable.Map.empty[String, Int].withDefaultValue(0)
      es.foreach(_.foreach(a => counts(a) += 1))
      val reduced = es.map(_.filter(a => counts(a) > 1))
      if (reduced != es) { es = reduced; changed = true }
      // edges contained in another edge are removable
      val pruned = es.zipWithIndex.filterNot { case (e, i) =>
        e.isEmpty || es.zipWithIndex.exists { case (f, j) => j != i && e.subsetOf(f) && (f != e || j < i) }
      }.map(_._1)
      if (pruned.size != es.size) { es = pruned; changed = true }
    }
    es.isEmpty
  }

  /** Indices of the edges surviving GYO ear reduction — the maximal cyclic
    * core(s) of the hypergraph. Empty ⇔ α-acyclic. An edge that reduces away
    * (attributes pruned to nothing, or subsumed by a peer) is acyclic
    * periphery: contracting each surviving connected component to a single
    * hyperedge leaves an α-acyclic hypergraph, so a planner can run each
    * core as ONE worst-case-optimal bag and join the periphery around it
    * with a linear (Yannakakis / binary-join) strategy — the reference
    * builds per-bag join trees for exactly this split
    * (optimization/rules/join.scala:233-270).
    */
  def cyclicCoreIds(edges: Seq[Set[String]]): Set[Int] = {
    var es: Seq[(Int, Set[String])] =
      edges.zipWithIndex.collect { case (e, i) if e.nonEmpty => (i, e) }
    var changed = true
    while (changed && es.nonEmpty) {
      changed = false
      val counts = mutable.Map.empty[String, Int].withDefaultValue(0)
      es.foreach(_._2.foreach(a => counts(a) += 1))
      val reduced = es.map { case (i, e) => (i, e.filter(a => counts(a) > 1)) }
      if (reduced.map(_._2) != es.map(_._2)) { es = reduced; changed = true }
      val pruned = es.zipWithIndex.filterNot { case ((_, e), i) =>
        e.isEmpty || es.zipWithIndex.exists { case ((_, f), j) =>
          j != i && e.subsetOf(f) && (f != e || j < i)
        }
      }.map(_._1)
      if (pruned.size != es.size) { es = pruned; changed = true }
    }
    es.map(_._1).toSet
  }

  /** Group the given edge indices into connected components by shared
    * attributes (two core cycles linked only through periphery are separate
    * WCOJ bags). Components come out with ascending-min-index order and
    * sorted members, so plans are deterministic.
    */
  def connectedComponents(ids: Seq[Int], attrs: Int => Set[String]): Seq[Seq[Int]] = {
    val remaining = mutable.SortedSet(ids: _*)
    val comps = mutable.ArrayBuffer.empty[Seq[Int]]
    while (remaining.nonEmpty) {
      val seedId = remaining.head
      val comp = mutable.SortedSet(seedId)
      remaining -= seedId
      var grew = true
      while (grew) {
        grew = false
        val compAttrs = comp.toSeq.flatMap(attrs).toSet
        val join = remaining.filter(i => attrs(i).exists(compAttrs))
        if (join.nonEmpty) { comp ++= join; remaining --= join; grew = true }
      }
      comps += comp.toSeq
    }
    comps.toSeq
  }

  /** Enumerate connected GHDs for ≤ `maxEdges` relations and return the one
    * with minimum fhtw (ties: fewer bags, then smaller total bag size).
    *
    * Enumeration strategy: bags are generated from connected subsets of
    * edges (each bag covers the union of its edges' attributes); a
    * decomposition is a partition of edges into bags arranged in a tree that
    * satisfies the connectedness (running-intersection) property. For the
    * query sizes a planner sees (≤ 8 relations) exhaustive partition search
    * is fine; beyond that we fall back to one-bag-per-edge GYO tree.
    */
  def decompose(edges: Seq[Edge], maxEdges: Int = 8): Decomposition = {
    require(edges.nonEmpty)
    if (edges.size > maxEdges) return fallback(edges)

    val allAttrs = edges.flatMap(_.attrs).toSet
    val edgeAttrSets = edges.map(_.attrs)

    def bagWidth(edgeIds: Seq[Int]): Double = {
      val attrs = edgeIds.flatMap(i => edges(i).attrs).toSet
      FractionalEdgeCover.coverNumber(attrs, edgeAttrSets)
    }

    // all set partitions of edge indices (Bell number; fine for n ≤ 8)
    def partitions(xs: List[Int]): Iterator[List[List[Int]]] = xs match {
      case Nil => Iterator(Nil)
      case h :: t =>
        partitions(t).flatMap { p =>
          Iterator(List(h) :: p) ++ p.indices.iterator.map(i => p.updated(i, h :: p(i)))
        }
    }

    var best: Option[Decomposition] = None
    for (part <- partitions(edges.indices.toList)) {
      val bags = part.map { ids =>
        Bag(ids.flatMap(i => edges(i).attrs).toSet, ids.sorted, bagWidth(ids))
      }
      buildTree(bags).foreach { tree =>
        val cand = Decomposition(bags, tree)
        val better = best match {
          case None => true
          case Some(b) =>
            val (f1, f2) = (cand.fhtw, b.fhtw)
            f1 < f2 - 1e-9 ||
              (math.abs(f1 - f2) <= 1e-9 && (cand.bags.size < b.bags.size ||
                (cand.bags.size == b.bags.size &&
                  cand.bags.map(_.attrs.size).sum < b.bags.map(_.attrs.size).sum)))
        }
        if (better) best = Some(cand)
      }
    }
    best.getOrElse(fallback(edges))
  }

  /** Try to arrange bags in a tree satisfying the running-intersection
    * property: for every attribute, the bags containing it form a connected
    * subtree. Greedy Prim-style construction + verification.
    */
  private def buildTree(bags: Seq[Bag]): Option[Seq[(Int, Int)]] = {
    if (bags.size == 1) return Some(Nil)
    val n = bags.size
    val inTree = mutable.Set(0)
    val treeEdges = mutable.ArrayBuffer.empty[(Int, Int)]
    while (inTree.size < n) {
      // attach the bag with the largest attribute overlap to any tree bag
      val cand = (0 until n).filterNot(inTree)
        .flatMap(b => inTree.map(t => (t, b, bags(t).attrs.intersect(bags(b).attrs).size)))
        .sortBy { case (t, b, ov) => (-ov, b, t) }
      cand.headOption match {
        case Some((t, b, _)) => inTree += b; treeEdges += ((t, b))
        case None => return None
      }
    }
    // verify running intersection: each attribute's bags form a subtree
    val adj = treeEdges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val attrs = bags.flatMap(_.attrs).toSet
    val ok = attrs.forall { a =>
      val members = (0 until n).filter(bags(_).attrs.contains(a)).toSet
      if (members.size <= 1) true
      else {
        val seen = mutable.Set(members.head)
        val stack = mutable.Stack(members.head)
        while (stack.nonEmpty) {
          val x = stack.pop()
          adj.getOrElse(x, Set.empty).foreach { y =>
            if (members.contains(y) && !seen.contains(y)) { seen += y; stack.push(y) }
          }
        }
        seen == members
      }
    }
    if (ok) Some(treeEdges.toSeq) else None
  }

  /** One bag per edge, chained greedily by attribute overlap — the safe
    * default beyond enumeration size (equivalent to a connectivity-aware
    * left-deep join order).
    */
  private def fallback(edges: Seq[Edge]): Decomposition = {
    val edgeAttrSets = edges.map(_.attrs)
    val bags = edges.zipWithIndex.map { case (e, i) =>
      Bag(e.attrs, Seq(i), FractionalEdgeCover.coverNumber(e.attrs, edgeAttrSets))
    }
    buildTree(bags) match {
      case Some(t) => Decomposition(bags, t)
      case None => Decomposition(bags, (1 until bags.size).map(i => (i - 1, i)))
    }
  }
}
