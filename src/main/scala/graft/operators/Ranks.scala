package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking / ntile — the scale-safe replacement for a
  * single-partition `Window.orderBy(...)` rank: Spark executes an
  * unpartitioned window by moving EVERY row through one task (it even
  * warns `WindowExec: No Partition Defined`), which is fine over a
  * bounded frame (q60's 25 nation rows) and a wall at user grain
  * (hundreds of millions of rows at 100 TB).
  *
  * Shape: the same distributed prefix sum as [[Packing.packOffsets]] /
  * [[Packing.shuffledOrder]] — deterministic range split on the sort
  * key, local row_number per range (keyed window — parallel), per-range
  * offsets from a bounded (≤ numRanges-row) driver aggregate. The cut
  * points come from Greenwald-Khanna `approxQuantile` (a deterministic
  * summary, no RNG) and are baked into the plan as literals;
  * `repartitionByRange` is deliberately NOT used — RangePartitioner's
  * reservoir sample is seeded with the RDD id, so the totals pass and
  * the output pass could pick different bounds and silently corrupt the
  * offsets (the [[Packing]] determinism rule). Quantile precision
  * affects range BALANCE only, never the result: a row's rank is the
  * count of rows ordering before it under (key desc, id asc), identical
  * under any consistent range assignment — which is why a plain
  * single-window SQL oracle reproduces it exactly.
  */
object Ranks {

  /** `df` + a 1-based `"rank"` column under (`keyCol` DESC, `idCol` ASC
    * — the tiebreak makes the rank total), plus the row count n (free:
    * the sum of the per-range totals the offsets already need).
    * `keyCol` must be numeric (cast to double only for the cut points;
    * the ORDERING uses the original column, so decimal exactness is
    * preserved). NULL keys rank LAST — both Spark's `desc` default
    * (desc_nulls_last) and DuckDB's default null order agree, so the
    * single-window SQL oracle is still reproduced exactly. Cost: three
    * passes over `df` (cut points, range totals, output) — cache
    * upstream first if it is more than a scan/aggregate, per the
    * [[Packing.packOffsets]] note. */
  def globalRankDesc(df: DataFrame, keyCol: String, idCol: String,
      numRanges: Int = 32): (DataFrame, Long) = {
    require(numRanges > 0, "numRanges must be positive")
    val withKd = df.withColumn("__kd", col(keyCol).cast("double"))
    val probs = (1 until numRanges).map(_.toDouble / numRanges).toArray
    val bounds =
      if (numRanges == 1) Array.empty[Double]
      else withKd.stat.approxQuantile("__kd", probs, 0.001)
    // range id = #{cut points strictly above this key}: ascending pid ⇔
    // descending key, equal keys always share a pid — a pure function of
    // the key value, identical in the totals pass and the output pass.
    // NULL keys (which approxQuantile ignores and a `< bound` probe
    // would otherwise leave in pid 0, the TOP range) are routed to the
    // LAST range, where the within-range desc sort's nulls-last default
    // places them at the global tail — exactly the single-window order.
    val cuts = bounds.distinct
    val nonNullPid = cuts.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__kd") < lit(b), 1).otherwise(0)
    }
    val pid = when(col("__kd").isNull, lit(cuts.length)).otherwise(nonNullPid)
    val withPid = withKd.withColumn("__pid", pid)
    val (offsets, n) = Packing.rangeOffsets(withPid, "__pid", lit(1L))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col(keyCol).desc, col(idCol).asc)
    val ranked = withPid.withColumn("__rn", row_number().over(w))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("rank", (col("__off") + col("__rn")).cast("long"))
      .drop("__kd", "__pid", "__rn", "__off")
    (ranked, n)
  }

  /** `df` + a bucket column `outCol` with EXACT SQL `ntile(tiles)`
    * semantics under (`keyCol` DESC, `idCol` ASC), computed
    * arithmetically from the distributed global rank — the first
    * n mod tiles buckets take ⌈n/tiles⌉ rows, the rest ⌊n/tiles⌋ — so
    * the output is hash-identical to a single-partition ntile window
    * without ever forming one. Integer `div` keeps the bucket math exact
    * past 2^53 rows (the [[Packing]] long-domain rule). */
  def ntileByKeyDesc(df: DataFrame, keyCol: String, idCol: String,
      tiles: Int, outCol: String = "tile", numRanges: Int = 32): DataFrame = {
    require(tiles > 0, "tiles must be positive")
    val (ranked, n) = globalRankDesc(df, keyCol, idCol, numRanges)
    val q = n / tiles
    val rem = n % tiles
    val tile =
      if (q == 0L) col("rank") // fewer rows than tiles: row r → bucket r
      else expr(s"if(rank <= ${rem * (q + 1)}, " +
        s"(rank - 1) div ${q + 1}, " +
        s"$rem + (rank - 1 - ${rem * (q + 1)}) div $q) + 1")
    ranked.withColumn(outCol, tile.cast("long")).drop("rank")
  }
}
