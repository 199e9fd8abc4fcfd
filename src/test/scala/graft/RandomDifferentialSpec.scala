package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.MultiwayJoin
import graft.wcoj.WcojJoin

/** Randomized differential testing in the spirit of the reference's
  * TestQueryGenerator (src/test/scala/util/TestQueryGenerator.scala): random
  * join hypergraphs evaluated four ways — naive left-to-right natural join,
  * GHD-planned MultiwayJoin, Yannakakis-reduced MultiwayJoin, and the
  * HyperCube worst-case-optimal path — must all agree.
  */
class RandomDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val attrPool = Vector("a", "b", "c", "d", "e")

  private def naive(rels: Seq[(DataFrame, Seq[String])]): DataFrame =
    rels.map(_._1).reduce { (l, r) =>
      val common = l.columns.intersect(r.columns).toIndexedSeq
      if (common.isEmpty) l.crossJoin(r) else l.join(r, common, "inner")
    }

  private def canon(df: DataFrame, cols: Seq[String]): Set[Seq[Long]] =
    df.select(cols.map(col): _*).collect().map(r => cols.indices.map(r.getLong)).toSet

  test("4-cycle: naive == bushy GHD == Yannakakis == wcoj-routed == hypercube") {
    // targets the greedy-bushy bag join and the wcoj routing on the exact
    // shape they were built for
    val rnd = new scala.util.Random(404)
    for (trial <- 1 to 3) {
      val e = Seq.fill(120)(Seq(rnd.nextInt(9).toLong, rnd.nextInt(9).toLong)).distinct
      def rel(a: String, b: String) = {
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(e.map(org.apache.spark.sql.Row.fromSeq(_))),
          org.apache.spark.sql.types.StructType(Seq(a, b).map(x =>
            org.apache.spark.sql.types.StructField(x, org.apache.spark.sql.types.LongType, nullable = false))))
        (df, Seq(a, b))
      }
      val rels = Seq(rel("a", "b"), rel("b", "c"), rel("c", "d"), rel("d", "a"))
      // cycle closure needs (d,a) column ORDER consistent: build via select
      val fixed = rels.map { case (df, attrs) => (df.select(attrs.map(col): _*), attrs) }
      val outCols = Seq("a", "b", "c", "d")
      withClue(s"4-cycle trial $trial: ") {
        val base = canon(naive(fixed), outCols)
        assert(canon(MultiwayJoin.join(fixed), outCols) === base, "bushy GHD")
        assert(canon(MultiwayJoin.join(fixed, reduce = true), outCols) === base, "Yannakakis")
        assert(canon(MultiwayJoin.join(fixed, wcoj = true), outCols) === base, "wcoj-routed")
        assert(canon(WcojJoin.leapfrogHyperCube(spark, fixed, outCols, maxCells = 4), outCols) === base,
          "hypercube")
      }
    }
  }

  test("random string-keyed triangles: dictionary-encoded leapfrogAny == naive") {
    // the leapfrogAny dictionary path (encode -> WCOJ on codes -> decode)
    // must agree with binary natural joins on arbitrary string domains,
    // including values that collide after naive numeric coercions
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 4) {
      val domain = (0 until 12).map(i => s"v${i}_${rnd.alphanumeric.take(3).mkString}") ++
        Seq("0", "00", "1e3", "+1", " 1") // numeric-coercion traps
      val e = Seq.fill(140)((domain(rnd.nextInt(domain.size)), domain(rnd.nextInt(domain.size))))
        .distinct.filter(p => p._1 != p._2)
      val edges = e.toDF("src", "dst")
      val rels = Seq(
        (edges.select($"src".as("a"), $"dst".as("b")), Seq("a", "b")),
        (edges.select($"src".as("b"), $"dst".as("c")), Seq("b", "c")),
        (edges.select($"dst".as("a"), $"src".as("c")), Seq("a", "c")))
      def canonS(df: DataFrame): Set[(String, String, String)] =
        df.select("a", "b", "c").as[(String, String, String)].collect().toSet
      withClue(s"string triangle trial $trial: ") {
        val base = canonS(naive(rels))
        assert(canonS(WcojJoin.leapfrogAny(spark, rels, Seq("a", "b", "c"))) === base)
        assert(canonS(MultiwayJoin.join(rels, wcoj = true)) === base, "wcoj-routed")
      }
    }
  }

  test("random hypergraphs: naive == GHD == Yannakakis == hypercube") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 8) {
      val nRels = 2 + rnd.nextInt(3)
      // connected hypergraph: each relation shares >=1 attr with the previous
      var used = Vector(attrPool(rnd.nextInt(2)))
      val rels = (0 until nRels).map { _ =>
        val shared = used(rnd.nextInt(used.size))
        val fresh = attrPool(rnd.nextInt(attrPool.size))
        val attrs = Seq(shared, fresh).distinct
        used = (used ++ attrs).distinct
        val arity = attrs.size
        val rows = Seq.fill(30 + rnd.nextInt(40))(
          Seq.fill(arity)(rnd.nextInt(6).toLong)).distinct
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row.fromSeq(_))),
          org.apache.spark.sql.types.StructType(attrs.map(a =>
            org.apache.spark.sql.types.StructField(a, org.apache.spark.sql.types.LongType, nullable = false))))
        (df, attrs)
      }
      val outCols = rels.flatMap(_._2).distinct.sorted
      withClue(s"trial $trial over ${rels.map(_._2.mkString("")).mkString(",")}: ") {
        val base = canon(naive(rels), outCols)
        assert(canon(MultiwayJoin.join(rels), outCols) === base, "GHD")
        assert(canon(MultiwayJoin.join(rels, reduce = true), outCols) === base, "Yannakakis")
        // inputs are distinct rows (set semantics), so the wcoj-routed
        // variant must also agree — cyclic bags go through LeapFrog
        assert(canon(MultiwayJoin.join(rels, wcoj = true), outCols) === base, "wcoj-routed")
        // hypercube needs SET-semantics inputs (they are: .distinct rows) and
        // an attr order; output arity == all attrs
        val cube = WcojJoin.leapfrogHyperCube(spark, rels, outCols, maxCells = 4)
        assert(canon(cube, outCols) === base, "hypercube")
      }
    }
  }
}
