package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import PatternParser._

/** Property-based round-trip fuzzing of the Cypher-ish pattern parser:
  * random pattern ASTs are rendered to text, parsed back, and must match —
  * the TestQueryGenerator idea from the reference test suite applied to the
  * one hand-rolled parser in this codebase. Raw ScalaCheck (no scalatest
  * bridge in the offline cache); asserts inside the property surface as
  * failures with the shrunk counterexample.
  */
class PatternParserPropSpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(3, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  private val labelsGen: Gen[Seq[String]] = Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, identGen))

  private val propValGen: Gen[String] = Gen.oneOf(
    Gen.choose(0, 999).map(_.toString),
    Gen.choose(0.0, 99.0).map(v => f"$v%.2f"),
    identGen.map(s => s"'$s'"))

  private val propsGen: Gen[Map[String, String]] = Gen.choose(0, 2).flatMap(n =>
    Gen.mapOfN(n, Gen.zip(identGen, propValGen)))

  private val nodeGen: Gen[NodePat] = for {
    name <- identGen
    ls <- labelsGen
    ps <- propsGen
  } yield NodePat(name, ls, ps)

  private val edgeGen: Gen[EdgePat] = for {
    name <- identGen
    ls <- labelsGen
    ps <- propsGen
  } yield EdgePat(name, ls, ps)

  private val dirGen: Gen[Direction] = Gen.oneOf(Left2Right, Right2Left, BiDirection)

  private def renderBody(name: String, labels: Seq[String], props: Map[String, String]): String = {
    val l = labels.map(":" + _).mkString
    val p = if (props.isEmpty) "" else props.map { case (k, v) => s"$k:$v" }.mkString("{", ",", "}")
    s"$name$l$p"
  }

  private def renderNode(n: NodePat): String = s"(${renderBody(n.name, n.labels, n.props)})"

  private def renderEdge(e: EdgePat, d: Direction): String = {
    val body = s"[${renderBody(e.name, e.labels, e.props)}]"
    d match {
      case Left2Right  => s"-$body->"
      case Right2Left  => s"<-$body-"
      case BiDirection => s"-$body-"
    }
  }

  private val pathGen: Gen[List[(NodePat, EdgePat, Direction)]] = for {
    n <- Gen.choose(1, 4)
    segs <- Gen.listOfN(n, Gen.zip(nodeGen, edgeGen, dirGen))
  } yield segs

  test("random pattern paths round-trip through render + parse") {
    check(minSuccessful = 200, prop = Prop.forAll(pathGen, nodeGen) { (segs, last) =>
      val text = segs.map { case (n, e, d) => renderNode(n) + renderEdge(e, d) }
        .mkString("") + renderNode(last)
      val parsed = PatternParser.parse(text)
      assert(parsed.edges.size === segs.size)
      parsed.edges.zip(segs).zipWithIndex.foreach { case ((got, (n, e, d)), i) =>
        // the parser always stores src = textual left node, dst = textual
        // right node; direction is carried separately and interpreted at
        // plan-generation time
        val leftNode = if (i == 0) n else segs(i)._1
        val rightNode = if (i + 1 < segs.size) segs(i + 1)._1 else last
        assert(got.src.name === leftNode.name && got.dst.name === rightNode.name)
        assert(got.direction === d)
        assert(got.edge.name === e.name)
        assert(got.edge.labels === e.labels)
        assert(got.edge.props === e.props)
        assert(got.src.labels === leftNode.labels && got.src.props === leftNode.props)
        assert(got.dst.labels === rightNode.labels && got.dst.props === rightNode.props)
      }
      true
    })
  }

  test("multi-path patterns concatenate edges across semicolons") {
    check(minSuccessful = 50, prop = Prop.forAll(Gen.listOfN(3, pathGen), nodeGen) { (paths, last) =>
      val texts = paths.map(segs =>
        segs.map { case (n, e, d) => renderNode(n) + renderEdge(e, d) }.mkString("") + renderNode(last))
      val parsed = PatternParser.parse(texts.mkString("; "))
      parsed.edges.size == paths.map(_.size).sum
    })
  }
}
