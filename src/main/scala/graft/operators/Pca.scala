package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Top principal direction of the embedding corpus by deterministic
  * power iteration — the spectral primitive behind embedding whitening /
  * anisotropy removal ("all-but-the-top" post-processing) and a third
  * instance of the engine's training-as-dataflow discipline (KMeans,
  * Classifier): per iteration ONE corpus scan computes every projection
  * x·v (broadcast v, codegen'd fold), and the matrix-vector product
  * Σᵢ xᵢ (xᵢ·v) reduces per component as an exact BIGINT sum of
  * floor(x_ij · dᵢ · 1e9) nano-units — order-independent, so the result
  * is partitioning-invariant (a raw double sum would depend on task
  * scheduling). The normalization ||u|| is a left-to-right fold over the
  * k·1 result — bounded, deterministic.
  *
  * NOTE uncentered: this is the top singular direction of the raw data
  * matrix (what embedding-anisotropy correction wants — the dominant
  * common component), not of the covariance; centering is one subtracted
  * broadcast mean away and deliberately left out so the oracle stays a
  * pure replay. Init is the vec_id=0 embedding normalized — deterministic
  * by construction.
  */
object Pca {

  /** One matrix-vector step: v ↦ (Σᵢ xᵢ (xᵢ·v)) as (dim, u) rows. */
  private def matVec(embs: DataFrame, v: DataFrame): DataFrame =
    embs.crossJoin(broadcast(v.groupBy().agg(
        sort_array(collect_list(struct(col("dim"), col("v")))).as("vs"))
      .select(transform(col("vs"), x => x.getField("v")).as("vv"))))
      .select(posexplode(col("embedding")).as(Seq("dim", "x")),
        V.dot(col("embedding"), col("vv")).as("d"))
      .groupBy(col("dim"))
      .agg(sum(floor(col("x").cast("double") * col("d") * lit(1e9)).cast("long")).as("s"))
      .select(col("dim"), (col("s").cast("double") / lit(1e9)).as("u"))

  /** Normalize (dim, u) rows to unit length → (dim, v). */
  private def normalized(u: DataFrame): DataFrame = {
    val n = u.groupBy().agg(
        sort_array(collect_list(struct(col("dim"), col("u")))).as("us"))
      .select(sqrt(V.fsum(transform(col("us"), x =>
        x.getField("u") * x.getField("u")))).as("nrm"))
    u.crossJoin(broadcast(n)).select(col("dim"), (col("u") / col("nrm")).as("v"))
  }

  /** `iters` power-iteration steps from the normalized vec_id=0 row;
    * returns (dim, v) — the unit top-direction estimate, 1 row per
    * dimension, ordered. */
  def topDirection(embs: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    var v = normalized(
      e.filter(col("vec_id") === 0L)
        .select(posexplode(col("embedding")).as(Seq("dim", "u"))))
    for (_ <- 1 to iters) v = normalized(matVec(e, v))
    v.select(col("dim").cast("long").as("dim"), col("v")).orderBy(col("dim"))
  }
}
