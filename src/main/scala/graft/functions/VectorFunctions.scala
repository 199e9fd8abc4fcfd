package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, built on
  * Spark's higher-order functions (`zip_with`/`aggregate`) so they stay in
  * codegen — no UDF boxing on the 100 TB path.
  *
  * All arithmetic is widened to double with a left-to-right fold, matching
  * the DuckDB oracle's `list_sum(list_transform(...))` evaluation.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity in double precision — delegates to the fused
    * single-pass codegen Expression ([[NativeExpressions.cosineNative]]):
    * identical accumulation order (so bit-identical doubles) to the HOF
    * composition below, but one array walk instead of four and no
    * intermediate zip_with array allocation per row.
    */
  def cosine(a: Column, b: Column): Column = NativeExpressions.cosineNative(a, b)

  /** cosine via higher-order functions only — the reference formulation the
    * native expression is differentially tested against.
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** symmetric int8 quantization scale: 127 / max |vᵢ| (per vector). */
  def int8Scale(v: Column): Column =
    lit(127.0) / array_max(transform(v, x => abs(x))).cast("double")

  /** quantize to int8 with half-up rounding (floor(x·scale + 0.5) — the
    * formulation both Spark and DuckDB evaluate identically; `round()`
    * half-even/half-away conventions differ between engines). Pass the
    * precomputed [[int8Scale]] as a projected column so the per-element
    * lambda stays a bound-reference multiply.
    */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => floor(x.cast("double") * scale + lit(0.5)).cast("int"))

  /** Sign-LSH bucket id from the first `bits` dimensions:
    * Σ 2ʲ·[vⱼ > 0]. A deterministic, data-independent coarse quantizer —
    * the bucket join prunes the candidate set from O(N) to O(N/2^bits)
    * per query at scale. Swap for learned hyperplanes offline.
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(v, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
