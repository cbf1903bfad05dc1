package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * WHY at 100 TB: Parquet scans prune on per-file / per-row-group
  * min-max statistics. A table sorted on one column prunes only that
  * column's predicates; a table sorted by the INTERLEAVED bits of two
  * (or more) columns keeps both columns' value ranges locally narrow in
  * every file, so a 2-D box predicate (user ∈ [a,b] AND time ∈ [c,d])
  * skips most files on either dimension — the standard lakehouse
  * OPTIMIZE ZORDER BY economics, built here from a plain codegen'd
  * expression + repartitionByRange write, no engine extension needed.
  *
  * The z-value is a static expression tree (bits is a plan-time
  * constant): per bit i, ((a >> i) & 1) << 2i  |  ((b >> i) & 1) <<
  * (2i+1), summed — exact integer arithmetic, bit-portable, mirrored
  * literally by the oracle SQL. Inputs must be non-negative and fit in
  * `bits` bits (truncation above that loses locality, not correctness —
  * the z-value stays deterministic either way). */
object Layout {

  /** Morton interleave of two non-negative integer columns over `bits`
    * low bits each: result occupies 2·bits bits, a in even positions,
    * b in odd. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduceLeft(_ + _)
  }

  /** Write `df` z-clustered on (`colA`, `colB`): each dimension is first
    * min-max normalized onto [0, 2^bits) — raw interleave degenerates to
    * a single-column sort when one dimension's value range is much
    * narrower than the other's (its high bits are constant zero), which
    * is why production ZORDER implementations interleave range-normalized
    * keys, not raw values. The normalization statistics are a bounded
    * 1-row aggregate (the AQE-statistics economics this repo uses
    * elsewhere). Then range-partition by the z-value (the GLOBAL
    * clustering step — files tile the z-curve in contiguous runs; a local
    * sortWithinPartitions alone would leave every file spanning the full
    * key range) and sort within partitions for row-group locality.
    * `nFiles` sizes the output; at scale it derives from target file
    * size, not a constant. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, nFiles: Int): Unit = {
    val s = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val scale = (1L << bits).toDouble
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else floor((c.cast("long") - lit(lo)).cast("double") * lit(scale)
        / lit((hi - lo + 1).toDouble)).cast("long")
    df.withColumn("_z", zValue(
        norm(col(colA), s.getLong(0), s.getLong(1)),
        norm(col(colB), s.getLong(2), s.getLong(3)), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** The oracle-facing z-value formula as SQL text, generated from the
    * same loop as [[zValue]] (one source of truth, no drift). */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
