package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined aggregates — the reference's UDAF surface
  * (expression/aggregate/UDAF.scala:248-513, which clones Spark's deprecated
  * UserDefinedAggregateFunction) re-expressed on the modern typed
  * `Aggregator[IN, BUF, OUT]` + `functions.udaf`, which Catalyst plans with
  * partial + final aggregation like any builtin.
  */
object Udafs {

  /** Geometric mean over positive doubles: exp(avg(ln(x))), null-skipping. */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Sum of squared deviations accumulated Welford-style (numerically stable
    * population variance).
    */
  object VariancePop extends Aggregator[Double, (Long, Double, Double), Double] {
    override def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
    override def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) = {
      val (n, mean, m2) = b
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      (n1, mean1, m2 + d * (x - mean1))
    }
    override def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) = {
      val (na, ma, m2a) = a; val (nb, mb, m2b) = b
      if (na == 0) b else if (nb == 0) a
      else {
        val n = na + nb
        val d = mb - ma
        (n, ma + d * nb / n, m2a + m2b + d * d * na * nb / n)
      }
    }
    override def finish(b: (Long, Double, Double)): Double =
      if (b._1 == 0) Double.NaN else b._3 / b._1
    override def bufferEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def geometricMean(c: Column): Column = udaf(GeometricMean).apply(c)
  def variancePop(c: Column): Column = udaf(VariancePop).apply(c)

  /** SQL registration (FunctionRegistry surface, catalog/FunctionRegistry.scala:16). */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("geometric_mean", udaf(GeometricMean))
    spark.udf.register("variance_pop_w", udaf(VariancePop))
  }

  /* == untyped UDAF surface (migration parity) ==
   *
   * The reference's UDAF API is the inputSchema/bufferSchema/initialize/
   * update/merge/evaluate shape (expression/aggregate/UDAF.scala:248-345) —
   * Spark's legacy `UserDefinedAggregateFunction`, which Spark still ships
   * (deprecated in favor of `Aggregator`). A user porting reference UDAFs
   * can bring them over verbatim: extend
   * `org.apache.spark.sql.expressions.UserDefinedAggregateFunction` and
   * register below. New code should prefer the typed Aggregator above.
   */

  /** Example untyped UDAF in the reference's API shape: geometric mean with
    * an explicit (sum_ln, n) buffer — the migration template.
    */
  @annotation.nowarn("cat=deprecation")
  class UntypedGeometricMean extends org.apache.spark.sql.expressions.UserDefinedAggregateFunction {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.MutableAggregationBuffer
    import org.apache.spark.sql.types._
    override def inputSchema: StructType = StructType(Seq(StructField("x", DoubleType)))
    override def bufferSchema: StructType =
      StructType(Seq(StructField("sum_ln", DoubleType), StructField("n", LongType)))
    override def dataType: DataType = DoubleType
    override def deterministic: Boolean = true
    override def initialize(buffer: MutableAggregationBuffer): Unit = {
      buffer(0) = 0.0; buffer(1) = 0L
    }
    override def update(buffer: MutableAggregationBuffer, input: Row): Unit =
      if (!input.isNullAt(0) && input.getDouble(0) > 0) {
        buffer(0) = buffer.getDouble(0) + math.log(input.getDouble(0))
        buffer(1) = buffer.getLong(1) + 1
      }
    override def merge(b1: MutableAggregationBuffer, b2: Row): Unit = {
      b1(0) = b1.getDouble(0) + b2.getDouble(0)
      b1(1) = b1.getLong(1) + b2.getLong(1)
    }
    override def evaluate(buffer: Row): Any =
      if (buffer.getLong(1) == 0) Double.NaN
      else math.exp(buffer.getDouble(0) / buffer.getLong(1))
  }

  /** Register an untyped (legacy-API) UDAF for SQL + Column use. */
  @annotation.nowarn("cat=deprecation")
  def registerUntyped(spark: SparkSession, name: String,
      f: org.apache.spark.sql.expressions.UserDefinedAggregateFunction): Unit = {
    spark.udf.register(name, f): Unit
  }
}
