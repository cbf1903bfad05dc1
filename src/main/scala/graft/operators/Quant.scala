package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Midpoint-safe fixed-point quantization for cross-engine-exact sums.
  *
  * `CAST(x AS DECIMAL(18,9))` is NOT portable at exact midpoints: Spark
  * rounds half away from zero while DuckDB rounds half to even, so a
  * float32 input like 0.1494140625 — an exact dyadic whose value × 1e9
  * is ...062.5 — quantizes differently, and a single such element shifts
  * a k-means centroid component by one decimal ulp (observed at sf0.1:
  * one element flipped 257 downstream dist2 values).
  *
  * `floor(x * 1e9 + 0.5)` is pure IEEE-754 double arithmetic that both
  * engines evaluate bit-identically, so ties break identically (toward
  * +inf). The integer units are summed as DECIMAL(38,0): exact and
  * order-independent like any decimal sum, and — unlike fractional-scale
  * decimals — a scale-0 decimal converts to double with a SINGLE
  * rounding in both engines (no 10^-scale division after the int128
  * conversion, the q48_corr_stats double-rounding hazard).
  *
  * Callers pair these with the `dQ9` SQL snippet in PipelineQueries so
  * the oracle mirrors the arithmetic operation for operation. Domain:
  * |x| must stay well under 2^53/1e9 ≈ 9e6 so the scaled double is
  * exact-integer-adjacent; every current input (unit-norm embedding
  * components, squared distances, c·ln(c) terms) is O(1e5) or smaller.
  */
object Quant {

  private val Scale = 1e9

  /** `x` quantized to integer 1e-9 units, half-up toward +inf, widened
    * to DECIMAL(38,0) so downstream sums are exact at any row count. */
  def quant9(x: Column): Column =
    floor(x * lit(Scale) + lit(0.5)).cast("decimal(38,0)")

  /** A DECIMAL(38,0) sum of [[quant9]] units back to its double value:
    * one conversion rounding, then one fixed IEEE division. */
  def q9ToDouble(s: Column): Column = s.cast("double") / lit(Scale)
}
