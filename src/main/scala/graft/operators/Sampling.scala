package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Deterministic stratified sampling — the data-mixture control ops a
  * pretraining pipeline runs to hit a target domain/language mix
  * (up-sample low-resource strata, down-sample the web crawl).
  *
  * Neither op ever calls `sample()`: Spark's sampler draws from a
  * per-partition RNG, so membership changes with partitioning, retries,
  * and cluster size, and no external engine can reproduce it. Here
  * membership is a pure function of the row id — `hash(salt:id)` against
  * a threshold — so any engine recomputes the same sample, a re-run after
  * a lost executor keeps the same rows, and train/eval contamination
  * checks can reconstruct exactly what was trained on.
  *
  * Rates are integer basis points (of 10000), not doubles: a
  * `hash < rate * 10000` comparison computed in floating point would
  * hinge on engine-specific double→int cast rules (Spark truncates,
  * DuckDB rounds) — integer thresholds make the contract exact. */
object Sampling {

  private def sampleHash(idCol: String, salt: String): Column =
    T.bucketHash(col(idCol), salt, 10000L)

  /** Rate-based: keep each row of stratum s with probability
    * bps(s)/10000, deterministically. Unlisted strata get `defaultBps`.
    * Embarrassingly parallel — a codegen'd filter, no shuffle at all. */
  def stratifiedByRate(df: DataFrame, idCol: String, strataCol: String,
      bpsByStratum: Map[String, Int], defaultBps: Int = 0,
      salt: String = "sample"): DataFrame = {
    require((bpsByStratum.values ++ Seq(defaultBps)).forall(b => b >= 0 && b <= 10000),
      "rates are basis points in [0, 10000]")
    // sorted fold → identical when-chain (and thus identical plan) for
    // the same map regardless of Map iteration order
    val thresh = bpsByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBps).cast("long")) { case (acc, (s, bps)) =>
        when(col(strataCol) === s, lit(bps.toLong)).otherwise(acc)
      }
    df.filter(sampleHash(idCol, salt) < thresh)
  }

  /** Fixed-quota: the `quota` rows of each stratum with the smallest
    * sample hash (ties broken by id) — a reproducible random quota per
    * stratum. One keyed window (parallel across strata). A stratum far
    * larger than its quota makes that window partition the straggler; the
    * production shape at 100 TB prepends a rate prefilter
    * (`stratifiedByRate` at ~2× quota/|stratum| basis points) to bound
    * the window input, with a count check to catch prefilter shortfall —
    * composition left to the caller because it needs per-stratum counts. */
  def stratifiedQuota(df: DataFrame, idCol: String, strataCol: String,
      quota: Int, salt: String = "sample"): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleHash(idCol, salt).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota).drop("__rn")
  }
}
