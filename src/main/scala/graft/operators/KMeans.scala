package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the training
  * step behind IVF partitioning (EmbeddingStore's cells, PQ codebooks)
  * and the classic corpus-clustering primitive (topic balancing, dedup
  * blocking, mixture analysis).
  *
  * Every iteration is the canonical two-shuffle shape: assignment is a
  * broadcast of the k centroids against the (embarrassingly parallel)
  * vector scan with a single min-struct aggregation, and the update is
  * one partial-aggregatable groupBy over (cluster, dim) component rows.
  * Nothing about a vector's cluster ever sits on the driver; centroids
  * (k·d doubles) ride the broadcast, which is exactly how k-means state
  * should flow at 100 TB.
  *
  * DETERMINISM (the hash-gate contract, and worth having at scale too):
  *  - distances are left-to-right folds over the dims, identical on both
  *    engines — bit-exact doubles;
  *  - argmin ties break lexicographically on (dist², cluster id) via a
  *    struct min — no arbitrary "first seen" winner;
  *  - centroid means sum per-component [[Quant.quant9]] fixed-point
  *    units (floor(v·1e9 + 0.5), midpoint-safe across engines — a raw
  *    decimal CAST rounds midpoints half-up in Spark but half-even in
  *    DuckDB), so the sum is independent of row order across partitions
  *    (a raw double sum would make the result depend on task
  *    scheduling), then divide as doubles in a fixed tree. The 1e-9
  *    component quantization is far below float32 input noise;
  *  - init is the k vectors with the smallest ids — deterministic by
  *    construction (swap in k-means|| for quality at scale; the iteration
  *    machinery is what this operator pins down).
  * An emptied cluster simply stops existing (no respawn heuristic), on
  * both engines identically.
  */
object KMeans {

  /** Squared L2 distance as a left-to-right fold over the dims; `e` may be
    * float (cast to double array first — a native Cast, not a lambda), `c`
    * must be double. Native L2Dist2Double kernel: assignment evaluates
    * this n·k times per Lloyd pass, where the aggregate(zip_with(...))
    * twin pays per-element interpreter dispatch and de-codegens the
    * broadcast-join stage (bit-identical fold either way). */
  private[operators] def dist2(e: Column, c: Column): Column =
    graft.expressions.ArrayExprs.l2_dist2(e.cast("array<double>"), c)

  /** Centroids → (cid, cent) with double components. The global window
    * runs over the k rows the .limit cut (k centroids, never the corpus)
    * — its `WindowExec: No Partition Defined` warning is expected and
    * bounded, not a scale hazard. */
  private def initCentroids(embs: DataFrame, k: Int): DataFrame =
    embs.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("cent"))
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))).cast("long") - 1)
      .select(col("cid"), col("cent"))

  /** One assignment pass: (vec_id, embedding, cid, d2) under `centroids`.
    * The embedding rides inside the min-struct (ordering is decided by the
    * distinct (d2, cid) prefix) so the shuffle key stays the 8-byte id. */
  private def assign(embs: DataFrame, centroids: DataFrame): DataFrame =
    embs.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct(dist2(col("embedding"), col("cent")).as("d2"), col("cid"),
          col("embedding")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.embedding").as("embedding"),
        col("m.cid").as("cid"), col("m.d2").as("d2"))

  /** Centroid update: order-independent DECIMAL component sums → double
    * means, reassembled into dim-ordered arrays. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(sum(Quant.quant9(col("v"))).as("s"), count(lit(1)).as("n"))
      .select(col("cid"), col("dim"),
        (Quant.q9ToDouble(col("s")) / col("n").cast("double")).as("mv"))
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(struct(col("dim"), col("mv")))).as("dm"))
      .select(col("cid"), transform(col("dm"), x => x.getField("mv")).as("cent"))

  /** The centroid table the `iters`-th assignment pass runs against:
    * the smallest-id init refined by `iters − 1` Lloyd updates. Exposed
    * so downstream index builds (IVF cells, PQ codebooks) can train and
    * then route with the same centroids. */
  def centroidsAfter(embs: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val e = embs.select(col("vec_id"), col("embedding"))
    var centroids = initCentroids(e, k)
    var i = 0
    while (i < iters - 1) {
      centroids = update(assign(e, centroids))
      i += 1
    }
    centroids
  }

  /** Cell assignment of every vector under `centroids`:
    * (vec_id, cid, d2). */
  def assignCells(embs: DataFrame, centroids: DataFrame): DataFrame =
    assign(embs.select(col("vec_id"), col("embedding")), centroids)
      .select(col("vec_id"), col("cid"), col("d2"))

  /** Run `iters` Lloyd iterations from the smallest-id init; returns the
    * final assignment (vec_id, cluster, dist2), one row per vector. */
  def lloyd(embs: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"))
    assign(e, centroidsAfter(embs, k, iters))
      .select(col("vec_id"), col("cid").as("cluster"), col("d2").as("dist2"))
      .orderBy(col("vec_id"))
  }

  /** Embedding-space outlier flagging — the distance-to-centroid prune
    * (mislabeled/garbage/off-distribution points sit far from every
    * cluster): each vector flagged iff its squared distance to its
    * assigned centroid exceeds `factor` × the cluster's mean squared
    * distance. The cluster structure is [[lloyd]]'s deterministic
    * assignment; the mean rides the same fixed-point-sum trick as the
    * centroid update so it is partitioning-invariant, and the threshold
    * compare is a single IEEE multiply both engines evaluate
    * identically. One extra bounded aggregate (k rows) + one broadcast
    * join over the assignment. */
  def outliers(embs: DataFrame, k: Int = 8, iters: Int = 2,
      factor: Double = 2.0): DataFrame = {
    require(factor > 0.0, "outlier factor must be positive")
    val assigned = lloyd(embs, k, iters)
    val stats = assigned.groupBy(col("cluster"))
      .agg((Quant.q9ToDouble(sum(Quant.quant9(col("dist2")))) /
        count(lit(1)).cast("double")).as("mean_d2"))
    assigned.join(broadcast(stats), Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("dist2"), col("mean_d2"),
        (col("dist2") > col("mean_d2") * lit(factor)).as("is_outlier"))
      .orderBy(col("vec_id"))
  }
}
