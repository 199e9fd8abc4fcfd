object GhdProbe {
  def main(args: Array[String]): Unit = {
    import graft.plans.JoinHyperGraph
    val s7 = Seq(Set("a","b"), Set("b","c"), Set("c","d"), Set("d","e"),
      Set("a","e"), Set("a","c"), Set("b","d"), Set("c","e"))
    val s6 = Seq(Set("a","b"), Set("b","c"), Set("c","d"), Set("d","e"),
      Set("a","e"), Set("b","e"), Set("c","e"))
    for ((name, es) <- Seq("S7" -> s7, "S6" -> s6, "S8" -> Seq(
        Set("a","b"), Set("b","c"), Set("c","d"), Set("d","e"),
        Set("a","e"), Set("b","d"), Set("b","e"), Set("c","e")))) {
      val edges = es.zipWithIndex.map { case (s, i) => JoinHyperGraph.Edge(i, s) }
      val ghd = JoinHyperGraph.decompose(edges)
      println(s"[ghd] $name bags=" + ghd.bags.map(b =>
        b.attrs.toSeq.sorted.mkString("") + ":" + b.edgeIds.mkString("+")).mkString(" | "))
    }
  }
}
