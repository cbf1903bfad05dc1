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
    val s = embs.sparkSession
    val e = embs.select(col("vec_id"), col("embedding"))
    var centroids = initCentroids(e, k)
    var i = 0
    while (i < iters - 1) {
      // materialize each round's k-row centroid table to a LOCAL
      // literal: bounded by construction (k rows of k·d doubles), and
      // it re-roots the logical plan so per-round analysis/codegen cost
      // stays O(1). The previous lazy unroll nested `iters` full
      // assign+update blocks into one plan — measured 25 s of
      // scale-INDEPENDENT driver-side planning at iters=20 (identical
      // at ×1 and ×10 data), the same plan-growth class the
      // components/BPE loops needed checkpoints for (round-12 verdict
      // ask; the values are unchanged — collect moves the same floats).
      // Downstream also wins: the next round's broadcast side is a
      // LocalRelation whose size Spark knows exactly.
      val next = update(assign(e, centroids))
      val rows = next.collect()
      centroids = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), next.schema)
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

  /** Previous hierarchical-assignment centroid cache — one slot, the
    * newest call unpersists the prior frame (same discipline as the
    * guarded-shingle cache in Dedup): bounded at k·d doubles. */
  private val lastHierCents =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Two-level cell assignment — an IVF built over the centroid table
    * itself. Flat [[assignCells]] evaluates n·k distances; under the
    * SemDeDup sizing rule k ∝ n (mean cell size held ~10³-10⁴) that is
    * O(n²) compute — ScaleProbe measured the semantic-dedup entry at 18×
    * across its last ×10 decade for exactly this reason. The fix is the
    * same residency trick the ANN operators already use, applied to
    * assignment: cluster the k centroids into `kSuper` ≈ √k super-cells
    * (training cost k·kSuper — trivial), then each vector (1) ranks the
    * kSuper super-centroids and keeps its `nProbe` nearest, and (2)
    * searches only the centroids routed to those super-cells. Compute
    * per vector ≈ kSuper + nProbe·k/kSuper ≈ 2√k at nProbe=1 — O(n·√k)
    * overall instead of O(n·k).
    *
    * Plan shape at 100 TB: step (1) is PURE MAP-SIDE — the (non-empty)
    * super-centroids are collected into a plan literal (bounded: kSuper
    * ≈ √k rows, the same bounded-frame contract as the IVF probe frames
    * in Similarity), so the top-nProbe pick is array expression work
    * with no shuffle and no groupBy; step (2) is a broadcast hash join
    * against the k-row routing table followed by the usual struct-min
    * aggregate, whose partial (map-side) combine means the one shuffle
    * carries n narrow (vec_id, cid, d2) rows — identical shuffle volume
    * to flat assignment, ~√k-fold less compute.
    *
    * APPROXIMATE for nProbe < kSuper: the true nearest centroid may be
    * routed to an unprobed super-cell — the standard IVF residency
    * approximation, which SemDeDup-style blocking accepts by design. At
    * nProbe ≥ (non-empty) kSuper every centroid is searched and the
    * output is bit-identical to [[assignCells]] (spec-pinned).
    * Empty super-cells (Lloyd may empty one) are excluded from the probe
    * literal, so no vector can burn a probe — or lose its row at the
    * inner routing join — on a cell with no members.
    *
    * Determinism: the probe ranking sorts (d2, scid) structs and both
    * assignment levels use the (d2, cid) struct-min — no arbitrary
    * winners anywhere, partitioning-invariant like the flat pass. */
  def assignCellsHier(embs: DataFrame, centroids: DataFrame, kSuper: Int,
      nProbe: Int = 1): DataFrame = {
    require(kSuper > 0 && nProbe > 0, "kSuper and nProbe must be positive")
    // the centroid frame feeds super-training, routing and the final
    // search — persist so the (often corpus-sized) plan behind it runs
    // once; k·d doubles, the same bound that makes centroids
    // broadcastable in the first place
    val cents = centroids
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // `ne` guard: persist() returns the same Dataset reference, so a
    // repeat call with the same centroid frame would otherwise evict the
    // cache it just (re-)registered
    Option(lastHierCents.getAndSet(cents))
      .foreach(old => if (old ne cents) old.unpersist(false))
    val centsAsEmb =
      cents.select(col("cid").as("vec_id"), col("cent").as("embedding"))
    val superCents = centroidsAfter(centsAsEmb, kSuper, iters = 2)
    // route every centroid to its single nearest super-cell; the k-row
    // (scid, cid, cent) table is the broadcast side of step (2)
    val members = assignCells(centsAsEmb, superCents)
      .select(col("cid").as("scid"), col("vec_id").as("cid"))
      .join(cents, Seq("cid"))
    // non-empty super-cells as a plan literal (bounded collect: ≤ kSuper
    // rows), sorted by scid so the literal itself is deterministic
    val live = superCents
      .join(members.select(col("scid").as("cid")).distinct(), Seq("cid"), "left_semi")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray.toSeq))
      .toSeq.sortBy(_._1)
    val scArr = typedLit(live)
    val e = embs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val ranked = transform(scArr, s => struct(
      graft.expressions.ArrayExprs.l2_dist2(col("emb"), s.getField("_2")).as("d2"),
      s.getField("_1").as("scid")))
    e.select(col("vec_id"), col("emb"),
        explode(slice(sort_array(ranked), 1, nProbe)).as("probe"))
      .select(col("vec_id"), col("emb"), col("probe.scid").as("scid"))
      .join(broadcast(members), Seq("scid"))
      .select(col("vec_id"),
        struct(dist2(col("emb"), col("cent")).as("d2"), col("cid")).as("dc"))
      .groupBy(col("vec_id")).agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
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
