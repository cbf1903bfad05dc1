package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe aggregation shapes.
  *
  * `COUNT(DISTINCT x) GROUP BY key` is the aggregation that hurts at
  * 100 TB when `key` is low-cardinality or skewed: Spark plans it as a
  * shuffle on (key, x) followed by a shuffle on key, and every row of a
  * hot key funnels through the one reducer that owns it — partial
  * aggregation barely helps because the distinct set itself is large.
  * (The CT analog: distinct certificates per TLD — `.com` is one key
  * with a third of the corpus behind it.)
  */
object SkewAgg {

  /** Exact `GROUP BY key → count(*), count(DISTINCT x)` computed in two
    * salted stages so no single reducer ever owns a whole hot key.
    *
    * Stage 1 groups by `(key, salt)` where `salt = hash(x) mod nSalts`:
    * the hot key's rows spread over `nSalts` tasks. Because the salt is
    * derived from the DISTINCT column itself, the distinct values of `x`
    * within a key are PARTITIONED across salts (each value lands in
    * exactly one salt), so stage 2's `sum` over the per-salt distinct
    * counts is the exact global distinct count — not an approximation.
    * Row counts are additive over any partition, so `count(*)` rides
    * along for free.
    *
    * Result is bit-identical to the plain single-stage aggregation (the
    * declared query's oracle); the only difference is the shuffle key.
    * Both stages stay partial-aggregatable hash aggregates; nothing here
    * is a window or a collect.
    */
  def saltedDistinctCount(df: DataFrame, key: String, x: String,
      nSalts: Int = 16): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    df.groupBy(col(key),
        pmod(xxhash64(col(x)), lit(nSalts.toLong)).as("__salt"))
      .agg(count(lit(1)).as("__n"), count_distinct(col(x)).as("__nd"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__nd")).as("n_distinct"))
  }
}
