package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** The m-register HLL fold as ONE typed aggregate: state = an m-slot int
  * array, reduce = slot max, merge = element-wise max (which IS the HLL
  * sketch union, so map-side partial aggregation unions sketches exactly
  * like the column-per-register encoding does) — but the plan carries one
  * array aggregate instead of 2^p generated max columns, so the register
  * count no longer stresses codegen and p can grow past
  * [[graft.streaming.EventStreams.windowedDistinctHll]]'s column-encoding
  * ceiling (p ≤ 8) to the state-size bound instead.
  *
  * Deterministic and order-free (max is commutative/associative, the
  * array is fixed-order), so the estimates built on it replay exactly in
  * any engine — the same portability contract as the column path.
  *
  * Input (reg, rank); out-of-range regs are a require (the caller derives
  * reg = hash mod m, so a violation is a wiring bug, not data).
  */
final class HllRegisters(m: Int) extends Aggregator[(Int, Int), Array[Int], Array[Int]] {
  require(m >= 2, s"register count must be >= 2, got $m")

  override def zero: Array[Int] = new Array[Int](m)

  override def reduce(b: Array[Int], a: (Int, Int)): Array[Int] = {
    val (reg, rnk) = a
    require(reg >= 0 && reg < m, s"register $reg out of [0, $m)")
    if (rnk > b(reg)) b(reg) = rnk
    b
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Int]): Array[Int] = b

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
}
