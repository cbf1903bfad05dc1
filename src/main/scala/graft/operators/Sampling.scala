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
  * DuckDB rounds) — integer thresholds make the contract exact.
  *
  * Membership character: the polynomial hash walks consecutive ids
  * through consecutive buckets mod 10⁴, so the filter is SYSTEMATIC
  * sampling — every aligned 10⁴-id block realizes its rate exactly,
  * which at corpus scale (≥ 10⁴ ids per stratum) beats Bernoulli
  * variance. The flip side: a stratum spanning FEWER than ~10⁴
  * contiguous ids realizes a badly off-rate sample (one partial bucket
  * walk). Strata that small are better served by [[stratifiedQuota]];
  * for adjacency-decorrelated membership use a cryptographic id
  * (doc_shuffle's md5 treatment) as `idCol`. */
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

  /** Token-budget dataset mixing — the op that turns "train on 40 % web,
    * 30 % code, 20 % books, 10 % wiki within B tokens" into per-source
    * keep rates. For each stratum s with target weight w_s (basis points)
    * and corpus token mass tot_s, the keep rate is
    * `min(1, floor(B·w_s/10⁴) · 10⁴ / tot_s)` basis points — all integer
    * arithmetic, so any engine recomputes the identical rates, and
    * membership is then the same deterministic hash filter as
    * [[stratifiedByRate]]. A stratum with less mass than its target keeps
    * everything (rate caps at 10⁴); unlisted strata are dropped.
    *
    * The only driver-side data is the per-stratum token totals — one row
    * per source (tens, not millions) from a map-side-combinable agg.
    * Output: the kept rows with `n_tokens` and the stratum's `rate_bps`
    * attached. Expected kept token mass per stratum ≈ min(tot_s, B·w_s);
    * the realized mass is within sampling noise of it (hash membership is
    * per-document, exact-count quotas would need [[stratifiedQuota]]). */
  def mixToBudget(docs: DataFrame, idCol: String, strataCol: String,
      nTokens: Column, budgetTokens: Long, weightsBps: Map[String, Int],
      salt: String = "mix"): DataFrame = {
    require(weightsBps.values.forall(_ >= 0) && weightsBps.values.sum <= 10000,
      "weights are basis points summing to at most 10000")
    // budget*wbps and target*10000 must stay in the Long domain — past
    // this bound the rate would silently go negative and empty the
    // stratum instead of capping (9.2e14 tokens ≈ a 900-trillion-token
    // budget; split larger runs into per-epoch budgets)
    require(budgetTokens >= 0 && budgetTokens <= Long.MaxValue / 10000L,
      s"budgetTokens must be in [0, ${Long.MaxValue / 10000L}]")
    val withTok = docs.withColumn("n_tokens", nTokens.cast("long"))
    // contract checks on the driver-side totals: strata ride as strings
    // (any input type is cast, not ClassCastException'd), a null stratum
    // cannot be a weight key so it is excluded from the totals (its rows
    // are dropped by the rate filter below like any unlisted stratum),
    // and an all-null token sum (getLong would NPE) is a caller error
    // worth naming
    val totals = withTok
      .filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .collect().map { r =>
        require(!r.isNullAt(1),
          s"mixToBudget: stratum '${r.getString(0)}' has a null token sum — " +
            "nTokens must be non-null (or coalesce it) for every row")
        r.getString(0) -> r.getLong(1)
      }.toMap
    val rates = weightsBps.toSeq.sortBy(_._1).map { case (s0, wbps) =>
      val target = budgetTokens * wbps / 10000L
      val tot = totals.getOrElse(s0, 0L)
      s0 -> (if (tot == 0L) 0L else math.min(10000L, target * 10000L / tot))
    }
    val rateCol = rates.foldLeft(lit(null).cast("long")) {
      case (acc, (s0, bps)) => when(col(strataCol) === s0, lit(bps)).otherwise(acc)
    }
    withTok.withColumn("rate_bps", rateCol)
      .filter(col("rate_bps").isNotNull &&
        T.bucketHash(col(idCol), salt, 10000L) < col("rate_bps"))
  }

  /** Temperature-scaled mixture — the multilingual-pretraining sampler
    * that derives the weights instead of taking them: stratum s gets
    * weight ∝ tot_s^α for temperature exponent α ∈ (0, 1] (α = 1 is
    * proportional/no-op, α → 0 approaches uniform; α ≈ 0.7 is the
    * published low-resource-upsampling setting), then rows are kept by
    * the same integer-basis-point hash filter as [[mixToBudget]] —
    * this op just computes `weightsBps` from corpus statistics and
    * delegates, so the membership contract is one implementation.
    *
    * Determinism across engines: pow is libm (not single-rounded), so
    * each weight is quantized through float32 and floored to an
    * INTEGER before use — last-ulp divergence dies in the quantization,
    * and the integer weight sum is order-free. Everything after the
    * floor is the exact integer arithmetic of [[mixToBudget]]. Driver
    * state: one row per stratum. */
  def mixByTemperature(docs: DataFrame, idCol: String, strataCol: String,
      nTokens: Column, budgetTokens: Long, alpha: Double,
      salt: String = "mix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "temperature exponent must be in (0, 1]")
    val withTok = docs.withColumn("n_tokens", nTokens.cast("long"))
    val totals = withTok
      .filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .collect().map { r =>
        require(!r.isNullAt(1),
          s"mixByTemperature: stratum '${r.getString(0)}' has a null token sum")
        r.getString(0) -> r.getLong(1)
      }.toMap
    totals.values.foreach(t => require(t >= 0 && t <= Long.MaxValue / 10000L,
      "per-stratum token mass must fit integer basis-point arithmetic"))
    val wInt = totals.map { case (s0, tot) =>
      s0 -> math.floor(math.pow(tot.toDouble, alpha).toFloat.toDouble).toLong
    }
    val wSum = wInt.values.sum
    require(wSum > 0, "mixByTemperature needs at least one non-empty stratum")
    val weightsBps = wInt.map { case (s0, w) => s0 -> (w * 10000L / wSum).toInt }
    mixToBudget(docs, idCol, strataCol, nTokens, budgetTokens, weightsBps, salt)
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

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * doc by how target-like its hashed-bigram distribution is —
    * weight(d) = Σ_b c_d[b] · (ln p̂_target[b] − ln p̂_raw[b]) over
    * `nBuckets` hashed token-bigram features with add-1 smoothing —
    * then keep the positively-weighted (more-target-than-raw) docs, or
    * feed the weights to a resampler.
    *
    * Plan shape at 100 TB: one bigram explode, a doc-grain count and a
    * bucket-grain count (both map-side combinable), the ≤nBuckets
    * bucket model broadcast back over the doc-grain rows — the corpus
    * is read once and nothing wider than (doc, bucket) ever shuffles.
    * Determinism: bigram features are the portable shingle hashes, each
    * per-bucket log-ratio is float32-collapsed (libm), each c·llr term
    * Quant.quant9 fixed-point-quantized so the per-doc sum is order-independent
    * (the doc_entropy treatment). Docs with <2 tokens have no bigram
    * and drop out — by contract, not silently (stated here). */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val buckets = docs.select(
        col("doc_id"), isTarget.as("is_target"),
        explode(T.shingleHashes(T.tokenHashes(col("text")), 2)).as("sh"))
      .withColumn("b", pmod(col("sh"), lit(nBuckets.toLong)))
    val perDoc = buckets.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
    val model = buckets.groupBy(col("b"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"))
      .crossJoin(broadcast(
        buckets.agg(count(lit(1)).as("n_raw"),
          sum(when(col("is_target"), 1L).otherwise(0L)).as("n_t"))))
      .select(col("b"),
        (log((col("c_t") + 1).cast("double") /
            (col("n_t") + nBuckets).cast("double")).cast("float").cast("double") -
          log((col("c_raw") + 1).cast("double") /
            (col("n_raw") + nBuckets).cast("double")).cast("float").cast("double"))
          .as("llr"))
    perDoc.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(Quant.quant9(col("c").cast("double") * col("llr"))).as("wdec"))
      .select(col("doc_id"), col("n_bigrams"),
        Quant.q9ToDouble(col("wdec")).as("weight"),
        (col("wdec") > 0).as("selected"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    * keep the `n` rows with the largest key = ln(u)/w, where u ∈ (0, 1]
    * is a salted hash of the row id and w > 0 its weight — each row's
    * inclusion probability is proportional to its weight, jointly
    * without replacement, and the whole draw is a PURE FUNCTION of
    * (salt, id, weight): reproducible on any engine, any partitioning,
    * any retry. The token-mass form ("sample documents proportional to
    * length") is the curation counterpart of uniform quota sampling.
    *
    * Determinism across engines: u = (polyHash+1)/(M+1) is exact integer
    * arithmetic + one IEEE division; ln is float32-collapsed (the libm
    * last-ulp treatment every transcendental in this engine gets); the
    * /w division is one more IEEE op — so the DuckDB oracle reproduces
    * every key bit-for-bit. One scan + TakeOrdered; no shuffle beyond
    * the top-n. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      n: Int, salt: String = "wsample"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val m = T.HashMod
    val h = T.polyHash(concat(lit(salt + ":"), col(idCol).cast("string")))
    val u = (h.cast("double") + lit(1.0)) / lit((m + 1).toDouble)
    val key = log(u).cast("float").cast("double") / weight.cast("double")
    df.withColumn("w_key", key)
      .orderBy(col("w_key").desc, col(idCol))
      .limit(n)
  }

  /** Cluster-balanced subsampling — the topic/diversity balancing step of
    * an embedding-aware curation pipeline (cap each embedding-space
    * cluster at `quota` survivors so a few dominant modes cannot crowd
    * out the distribution's tail; cf. cluster-based rebalancing in
    * SemDeDup-style pipelines). Clusters are [[KMeans.lloyd]]'s
    * deterministic assignment; within a cluster the survivors are the
    * `quota` rows with the smallest salted multiplicative hash of vec_id
    * (ties by vec_id) — uniform within the cluster, reproducible on any
    * engine, independent of row order and partitioning.
    *
    * Plan shape at 100 TB: the k-means broadcast-assign route plus ONE
    * row_number window keyed by cluster — the same bounded shape as
    * [[stratifiedQuota]], with the same straggler note when one cluster
    * dwarfs its quota (prepend a rate prefilter to bound the window
    * input). Output keeps every vector with its cluster and `kept` flag
    * so the drop report is the same frame as the sample. */
  def clusterBalancedSample(embs: DataFrame, k: Int = 8, iters: Int = 2,
      quota: Int = 32): DataFrame = {
    require(quota > 0, "quota must be positive")
    val assigned = KMeans.lloyd(embs, k, iters)
      .select(col("vec_id"), col("cluster"))
    val h = pmod(col("vec_id") * lit(2654435761L), lit(1000000007L))
    val w = Window.partitionBy(col("cluster")).orderBy(h.asc, col("vec_id").asc)
    assigned
      .withColumn("__rn", row_number().over(w))
      .select(col("vec_id"), col("cluster"),
        (col("__rn") <= quota).as("kept"))
      .orderBy(col("vec_id"))
  }
}
