package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import PatternParser._

class PatternParserSpec extends AnyFunSuite {

  test("simple directed path") {
    val p = PatternParser.parse("(a)-[e]->(b)")
    assert(p.edges === Seq(PatternEdge(
      NodePat("a", Nil, Map.empty), EdgePat("e", Nil, Map.empty),
      NodePat("b", Nil, Map.empty), Left2Right)))
    assert(p.nodeVariables === Seq("a", "b"))
  }

  test("reverse and undirected edges") {
    val p = PatternParser.parse("(a)<-[e]-(b)-[f]-(c)")
    assert(p.edges.map(_.direction) === Seq(Right2Left, BiDirection))
  }

  test("labels and properties") {
    val p = PatternParser.parse("(a:Person:Admin{age:42})-[e:KNOWS{since:'2020'}]->(b)")
    val pe = p.edges.head
    assert(pe.src.labels === Seq("Person", "Admin"))
    assert(pe.src.props === Map("age" -> "42"))
    assert(pe.edge.labels === Seq("KNOWS"))
    assert(pe.edge.props === Map("since" -> "'2020'"))
  }

  test("multiple paths via semicolon share variables") {
    val p = PatternParser.parse("(a)-[]->(b)-[]->(c); (c)-[]->(a)")
    assert(p.edges.size === 3)
    assert(p.nodeVariables === Seq("a", "b", "c"))
  }

  test("anonymous nodes get fresh names and are excluded from variables") {
    val p = PatternParser.parse("(a)-[]->()-[]->(c)")
    assert(p.edges.size === 2)
    assert(p.nodeVariables === Seq("a", "c"))
    assert(p.edges(0).dst.name === p.edges(1).src.name) // chained anon node is shared
  }

  test("trailing semicolon tolerated") {
    assert(PatternParser.parse("(a)-[]->(b);").edges.size === 1)
  }

  test("malformed patterns raise with position") {
    val ex = intercept[IllegalArgumentException](PatternParser.parse("(a)-[->(b)"))
    assert(ex.getMessage.contains("bad pattern"))
    intercept[IllegalArgumentException](PatternParser.parse("(a)<-[e]->(b)"))
    intercept[IllegalArgumentException](PatternParser.parse(""))
  }
}
