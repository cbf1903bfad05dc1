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
    * stages so no single reducer ever owns a whole hot key.
    *
    * Stage 1 groups by `(key, x)` directly — the finest possible salt:
    * the hot key's rows spread over EVERY reducer by hash of the
    * distinct value itself, and each distinct `x` within a key lands in
    * exactly one group, so stage 2's `count(x)` over the per-value rows
    * is the exact global distinct count (NULL `x` forms its own group,
    * which `count(x)` skips — the `count_distinct` semantic) and
    * `sum(n)` the exact row count. Stage 2's partial aggregation folds
    * each reducer's groups to one row per key map-side, so the second
    * exchange carries ~|keys|×|partitions| rows, never data volume.
    *
    * This replaces the earlier explicit-salt shape (`salt = hash(x) mod
    * nSalts`, then `count_distinct` per (key, salt)): Catalyst plans a
    * distinct aggregate as TWO exchanges (hash(key, salt, x) then
    * hash(key, salt)) plus the outer roll-up's third — grouping by the
    * value itself keeps the identical first-exchange volume minus the
    * 8-byte salt column, drops one exchange and three aggregate phases
    * outright, and skips the per-row xxhash64 salt (optimization round
    * r16; the guide's §2.4 "remove shuffles outright"). `nSalts` is
    * retained for source compatibility and ignored — the value grain is
    * strictly finer than any salt count.
    *
    * Result is bit-identical to the plain single-stage aggregation (the
    * declared query's oracle); the only difference is the shuffle key.
    * Both stages stay partial-aggregatable hash aggregates; nothing here
    * is a window or a collect.
    */
  def saltedDistinctCount(df: DataFrame, key: String, x: String,
      nSalts: Int = 16): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    df.groupBy(col(key), col(x))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), count(col(x)).as("n_distinct"))
  }
}
