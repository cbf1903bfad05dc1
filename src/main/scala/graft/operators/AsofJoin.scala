package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks the latest right row with
  * right.ts ≤ left.ts within its key group (the time-series "most recent
  * state at event time" join Spark has no built-in operator for).
  *
  * Plan shape: tag and UNION the two inputs, then one window pass per key
  * ordered by (ts, side, tiebreak) carrying the last-seen right payload
  * forward (`last(_, ignoreNulls)` over unbounded-preceding) — right rows
  * sort before left rows at equal ts, so the match is inclusive, and the
  * per-key tiebreak column makes equal-ts right rows deterministic (the
  * LAST in tiebreak order wins).
  *
  * Scale: ONE shuffle on the key columns and a sort within partitions —
  * the same cost as any keyed window. The naive alternatives either
  * range-join (quadratic per key) or per-left-row correlated lookups (the
  * oracle SQL's formulation, fine for DuckDB at test scale, unrunnable on
  * 10^11 rows). Skewed keys fall under the same AQE/salting remedies as
  * any hot window key. */
object AsofJoin {

  /** `left`/`right` must both carry `keys` and `tsCol`. Right payload
    * columns are returned null when no right row precedes the left row
    * (left-outer as-of semantics). `rightTieBreak` orders equal-ts right
    * rows; the greatest wins. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPayload: Seq[String],
      rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // fail fast on name collisions that would otherwise surface as
    // duplicate output columns or ambiguous-reference analysis errors
    val clash = rightPayload.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"rightPayload columns collide with left columns: ${clash.mkString(", ")}")
    val internal = Set("_side", "_tie", "_r", "_asof")
    val reserved = (leftCols ++ right.columns).toSet.intersect(internal)
    require(reserved.isEmpty,
      s"inputs must not carry reserved internal columns: ${reserved.mkString(", ")}")
    val payloadStruct = struct(rightPayload.map(col): _*)
    val tie = rightTieBreak.map(col).getOrElse(lit(0))

    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType)))))
    val r = right
      .select((keys :+ tsCol).map(col) :+ lit(0).as("_side") :+
        tie.cast("long").as("_tie") :+ payloadStruct.as("_r"): _*)
    // align: give right rows nulls for the left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(rAligned)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))

    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("_asof").getField(c).as(c)): _*)
  }
}
