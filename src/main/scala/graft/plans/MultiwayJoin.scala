package graft.plans

import org.apache.spark.sql.DataFrame

/** GHD-guided n-ary natural join planner — the Spark-first rendition of the
  * reference's MultiwayJoin operator (multiwayOperators.scala:57-154) +
  * OptimizeMultiwayJoin rule: instead of a private hypercube/WCOJ runtime,
  * the decomposition shapes a DataFrame join tree that Catalyst then
  * executes (broadcast/shuffle/codegen as usual).
  *
  * Effect on plans: an acyclic query degenerates to the usual join chain;
  * a cyclic query (triangle, 4-cycle, cliques) gets its cyclic core grouped
  * inside one bag — joined there with plain hash joins — and bags are joined
  * along the GHD tree on their shared attributes, which bounds intermediate
  * blow-up by the bag structure rather than the raw join order.
  */
object MultiwayJoin {

  /** Natural-join the relations (join attributes = same-named columns),
    * ordering the joins by the minimum-fhtw GHD of the join hypergraph.
    */
  def join(relations: Seq[(DataFrame, Seq[String])]): DataFrame = {
    require(relations.nonEmpty, "no relations to join")
    if (relations.size == 1) return relations.head._1

    val edges = relations.zipWithIndex.map { case ((_, attrs), i) =>
      JoinHyperGraph.Edge(i, attrs.toSet)
    }
    val ghd = JoinHyperGraph.decompose(edges)

    def naturalJoin(l: DataFrame, r: DataFrame): DataFrame = {
      val common = l.columns.intersect(r.columns).toIndexedSeq
      if (common.isEmpty) l.crossJoin(r) else l.join(r, common, "inner")
    }

    // join inside each bag (relation order within a bag: as given)
    val bagDfs = ghd.bags.map(b => b.edgeIds.map(relations(_)._1).reduce(naturalJoin))

    // join bags along the GHD tree edges, parent-first; tree edges were
    // produced in attachment order so each (t, b) has t already joined.
    if (bagDfs.size == 1) bagDfs.head
    else {
      val joined = Array.fill[Option[DataFrame]](bagDfs.size)(None)
      joined(ghd.treeEdges.headOption.map(_._1).getOrElse(0)) = Some(bagDfs(ghd.treeEdges.headOption.map(_._1).getOrElse(0)))
      var acc = joined.flatten.head
      ghd.treeEdges.foreach { case (_, child) => acc = naturalJoin(acc, bagDfs(child)) }
      acc
    }
  }

  /** Expose the chosen decomposition (for tests / explain tooling). */
  def plan(relations: Seq[Seq[String]]): JoinHyperGraph.Decomposition =
    JoinHyperGraph.decompose(relations.zipWithIndex.map { case (attrs, i) =>
      JoinHyperGraph.Edge(i, attrs.toSet)
    })
}
