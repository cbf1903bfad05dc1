package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Train/test contamination detection: which held-out documents share
  * verbatim k-gram content with the training split — the decontamination
  * pass every benchmark-respecting pretraining pipeline runs (the
  * standard recipe is 13-gram collision; k is a parameter and the
  * testdata documents are short, so the declared query uses the corpus
  * shingle size).
  *
  * Shape: the splits come from the same deterministic doc_id hash as
  * doc_split (no data movement to decide membership), shingles are the
  * 60-bit packed ids (8-byte join keys), the train side is reduced to
  * DISTINCT shingles (the contamination index — at 100 TB this is the
  * thing you precompute and keep), and the collision check is one hash
  * equi-join test-shingles ⋈ train-index. No cross join, no per-pair
  * scoring; cost tracks |test shingles| + |train index|. */
object Contamination {

  /** (doc_id, n_shared) for every test-split document sharing at least
    * one k-shingle with any train-split document; n_shared counts its
    * distinct contaminated shingles. */
  def testSetOverlap(docs: DataFrame, k: Int = 3): DataFrame = {
    // T.splitHash is the ONE definition of split membership (doc_split
    // uses the same helper): train < 90, test >= 95. Shingle staging is
    // Dedup.shingleRows — the same (doc_id, 60-bit sh) grain the whole
    // dedup family joins on, not a local re-implementation.
    val withSplit = docs.select(col("doc_id"), col("text"),
      T.splitHash(col("doc_id")).as("__h"))
    val trainIndex = Dedup.shingleRows(withSplit.filter(col("__h") < 90), k)
      .select(col("sh")).distinct()
    val testSh = Dedup.shingleRows(withSplit.filter(col("__h") >= 95), k)
    testSh.join(trainIndex, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // testSh is distinct per doc
      .orderBy(col("doc_id"))
  }

  /** Containment-scored decontamination: [[testSetOverlap]] with the
    * asymmetric score that actually drives removal decisions —
    * containment = |test ∩ train shingles| / |test shingles|. A short
    * benchmark item quoted inside a long training document has tiny
    * SYMMETRIC Jaccard (the long doc's shingle mass swamps the union)
    * but containment ≈ 1; thresholding jaccard misses exactly the
    * leakage that matters most. Same plan shape as the exact pass (one
    * equi-join against the distinct-shingle train index + one bounded
    * per-doc size aggregate); the division is exact-bigint → double.
    * Returns every flagged test doc with (n_shared, n_test_shingles,
    * containment), ordered. */
  def testSetOverlapScored(docs: DataFrame, k: Int = 3): DataFrame = {
    val withSplit = docs.select(col("doc_id"), col("text"),
      T.splitHash(col("doc_id")).as("__h"))
    val trainIndex = Dedup.shingleRows(withSplit.filter(col("__h") < 90), k)
      .select(col("sh")).distinct()
    val testSh = Dedup.shingleRows(withSplit.filter(col("__h") >= 95), k)
    val testSizes = testSh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_test_shingles"))
    testSh.join(trainIndex, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(testSizes, Seq("doc_id"))
      .withColumn("containment", col("n_shared") / col("n_test_shingles"))
      .orderBy(col("doc_id"))
  }

  /** FUZZY decontamination — the near-duplicate counterpart of
    * [[testSetOverlap]]: test-split documents whose k-gram Jaccard with
    * some TRAIN document clears `threshold`, found the same way the
    * dedup family finds near-dups (MinHash band candidates, then exact
    * verification), not by verbatim collision. This is the pass that
    * catches lightly-paraphrased or partially-quoted benchmark leakage
    * an exact k-gram index misses (the exact pass is a special case:
    * a shared shingle IS a band-free candidate at jaccard > 0).
    *
    * Scale shape: candidates come from one hash equi-join of the test
    * split's band rows against the TRAIN band index ([[Dedup.bandIndex]]
    * — at 100 TB the persisted artifact, same one the incremental dedup
    * path joins against; decontamination rides the index the pipeline
    * already maintains, never corpus × test). Verification touches only
    * candidate docs' shingles ([[Dedup.verifyJaccard]] semi-join), so
    * cost tracks band collisions, not |train| · |test|.
    *
    * Returns (test_id, train_id, inter, jaccard) per contaminated pair,
    * jaccard ≥ threshold, ordered. */
  def testSetOverlapFuzzy(docs: DataFrame, k: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val withSplit = docs.select(col("doc_id"), col("text"),
      T.splitHash(col("doc_id")).as("__h"))
    val train = withSplit.filter(col("__h") < 90).select(col("doc_id"), col("text"))
    val test = withSplit.filter(col("__h") >= 95).select(col("doc_id"), col("text"))
    val cand = Dedup.bandIndex(test, k).as("a")
      .join(Dedup.bandIndex(train, k).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    // split membership is disjoint by construction (splitHash < 90 vs
    // >= 95), so a union'd shingle frame cannot merge two texts under
    // one id; verifyJaccard semi-joins it down to candidate docs only
    val sh = Dedup.shingleRows(train.union(test), k)
    Dedup.verifyJaccard(cand, sh, threshold)
      .select(col("i").as("test_id"), col("j").as("train_id"),
        col("inter"), col("jaccard"))
      .orderBy(col("test_id"), col("train_id"))
  }

  /** [[testSetOverlapFuzzy]] against the PERSISTED train band index —
    * the production decontamination shape at 100 TB: the train corpus
    * is banded ONCE into [[Dedup.writeBandIndex]]'s at-rest store (the
    * same artifact the incremental dedup path maintains), and every
    * benchmark/test split is then checked as a small increment — bucket-
    * pruned candidate reads, exact-jaccard verification touching only
    * candidate docs' text, per-check cost tracking the SPLIT, never
    * |train| · |test| or a per-check re-band of the train corpus. The
    * hot-band guard composes for free: boilerplate-heavy train corpora
    * (license headers, templated pages) are exactly where unguarded
    * decontamination explodes, and an index built with `hotBandCutoff`
    * drops those bands from candidate generation here too.
    *
    * `test` and `train` doc_ids must be disjoint (the split contract
    * the inline twin gets by construction); `k` rides the index's own
    * meta. Output is identical to the inline twin on the same split
    * (spec-pinned): (test_id, train_id, inter, jaccard ≥ threshold). */
  def testSetOverlapIndexed(test: DataFrame, trainIndexDir: String,
      train: DataFrame, threshold: Double = 0.5): DataFrame =
    Dedup.incrementalNearDupsIndexed(test, trainIndexDir, train, threshold)
      .select(col("i").as("test_id"), col("j").as("train_id"),
        col("inter"), col("jaccard"))
      .orderBy(col("test_id"), col("train_id"))

  /** [[testSetOverlapIndexed]] with the train corpus at rest too: the
    * verify fetch reads candidate train text from the
    * [[CorpusStore]] at `trainCorpusDir` via pruned point reads
    * instead of semi-joining a caller-held train frame — full
    * decontamination serving with NO train-corpus-sized input at all
    * (both stores receipt-locked; see the dedup overload). */
  def testSetOverlapIndexed(test: DataFrame, trainIndexDir: String,
      trainCorpusDir: String, threshold: Double): DataFrame =
    Dedup.incrementalNearDupsIndexed(test, trainIndexDir, trainCorpusDir,
      threshold)
      .select(col("i").as("test_id"), col("j").as("train_id"),
        col("inter"), col("jaccard"))
      .orderBy(col("test_id"), col("train_id"))
}
