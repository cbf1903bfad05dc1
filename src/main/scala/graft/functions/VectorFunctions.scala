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

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Random-hyperplane LSH bucket (j = 0 until nPlanes): bit j set iff
    * dot(v, w_j) > 0, with deterministic integer plane components
    * w_j[i] = ((31·i + 73·j) mod 13) − 6. Vectors in the same bucket are
    * ANN candidates; at scale the bucket id is the shuffle/cluster key. */
  def lshBucket(v: Column, nPlanes: Int = 8): Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), j =>
        when(planeDot(v, j) > 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** dot(v, plane_j) where plane components are derived arithmetically
    * from (i, j) — no materialized plane matrix, same formula in the
    * oracle SQL. */
  private def planeDot(v: Column, j: Column): Column =
    aggregate(
      transform(sequence(lit(0), size(v) - 1), i =>
        element_at(asD(v), i + 1) * (pmod(lit(31L) * i + lit(73L) * j, lit(13L)) - lit(6L)).cast("double")),
      lit(0.0), (acc, x) => acc + x)
}
