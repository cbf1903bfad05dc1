package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns.
  *
  * All arithmetic is done in double after an exact float→double cast, with
  * strictly left-to-right folds (`aggregate` over the array in index order),
  * so any engine that evaluates the same fold — the DuckDB oracle does —
  * produces bit-identical IEEE doubles. No UDFs: `zip_with`/`aggregate` are
  * codegen'd higher-order functions, and the plan stays columnar.
  */
object VectorFunctions {

  private def asD(a: Column): Column = a.cast("array<double>")

  /** Left-fold sum of an array<double>. */
  def fsum(a: Column): Column = aggregate(a, lit(0.0), (acc, v) => acc + v)

  /** Native codegen'd dot product (graft.expressions.DotDouble): identical
    * left-to-right fold as aggregate(zip_with(a,b,*),0.0,+), without per-
    * element interpreter dispatch — this runs per PAIR in O(n²) dedup. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.ArrayExprs.dot_double(asD(a), asD(b))

  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity; NULL when either vector has zero norm — cosine is
    * undefined there, Spark's ANSI mode would otherwise throw
    * DIVIDE_BY_ZERO, and DuckDB's x/0.0 is already NULL, so NULL is the
    * one value both engines agree on without any oracle-side change. */
  def cosine(a: Column, b: Column): Column =
    cosineRatio(dot(a, b), sqrt(norm2(a)) * sqrt(norm2(b)))

  /** `a / b` with NULL on a zero denominator — DuckDB's x/0.0 value
    * under Spark's ANSI mode. THE single home of the cross-engine
    * zero-division contract (q48's statistics and every cosine below
    * share it). */
  def safeDiv(a: Column, b: Column): Column =
    when(b === 0.0, lit(null).cast("double")).otherwise(a / b)

  /** [[safeDiv]] for call sites that precompute/reuse norms (the
    * broadcast-query kNN shape). Same zero-norm contract as [[cosine]]. */
  def cosineRatio(d: Column, den: Column): Column = safeDiv(d, den)

  /** Multi-band random-hyperplane LSH buckets: array of nBands bucket ids,
    * band b's bit j set iff dot(v, w_{b·nPlanes+j}) > 0, plane components
    * w_g[i] = ((g·len + i)·1103515245 + 12345) mod 2039 − 1019 (integer
    * LCG — deterministic, mirrored by the oracle SQL, and every (band,
    * plane) index is a genuinely distinct hyperplane). Native codegen'd
    * expression: bucketing runs once per row over nBands·nPlanes·dims
    * multiplies, which an interpreted HOF pays per-element dispatch for. */
  def lshBands(v: Column, nPlanes: Int, nBands: Int): Column =
    graft.expressions.ArrayExprs.lsh_bands(asD(v), nPlanes, nBands)

  /** Single-band LSH bucket (band 0 of lshBands). Vectors in the same
    * bucket are ANN candidates; at scale the bucket id is the
    * shuffle/cluster key. */
  def lshBucket(v: Column, nPlanes: Int = 8): Column =
    element_at(lshBands(v, nPlanes, 1), 1)

  /** Symmetric int8 scalar quantization: scale = max|v| / 127, codes =
    * floor(v/scale + 0.5) ∈ [−127, 127] — 4× smaller than float32 at rest,
    * the first-order storage win for a 100 TB embedding corpus (PQ/OPQ
    * refine the same idea). floor(x + 0.5) instead of round() because the
    * two engines' round() disagree on ties; the floor form is bit-portable.
    * Zero vectors quantize to all-zero codes with scale 0. The max|v| scan
    * is the native MaxAbsDouble kernel (identical to the left fold — max
    * is order-free from 0.0 — without the HOF's per-element dispatch). */
  def quantizeScale(v: Column): Column =
    graft.expressions.ArrayExprs.max_abs_double(asD(v)) / 127.0

  def quantize8(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(asD(v), _ => lit(0L)))
      .otherwise(transform(asD(v), x => floor(x / scale + 0.5).cast("long")))

  /** Dequantized vector (codes × scale) — the lossy reconstruction ANN
    * scans at scale; cosine against it is within ~1/255 of the exact
    * value (spec-pinned). */
  def dequantize8(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Exact integer dot of two code arrays (native, codegen'd) — the
    * stage-1 kernel of quantized retrieval. */
  def dotCodes(a: Column, b: Column): Column =
    graft.expressions.ArrayExprs.dot_long(a, b)

  /** Quantization staging shared by emb_quantize and quantizedKnn: `emb`
    * (exact double cast), `scale`, `codes` — each materialized in its OWN
    * select step because Catalyst does not CSE lambda subexpressions, and
    * parity-critical enough that it must exist exactly once. */
  def withQuantized(df: org.apache.spark.sql.DataFrame,
      embCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val others = df.columns.filterNot(_ == embCol).map(col).toSeq
    df.select(others :+ col(embCol).cast("array<double>").as("emb"): _*)
      .select(others :+ col("emb") :+ quantizeScale(col("emb")).as("scale"): _*)
      .select(others :+ col("emb") :+ col("scale") :+
        quantize8(col("emb"), col("scale")).as("codes"): _*)
  }
}
