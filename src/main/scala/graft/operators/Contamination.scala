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
    val withSplit = docs.select(col("doc_id"), col("text"),
      pmod(T.polyHash(concat(lit("split:"), col("doc_id"))), lit(100L)).as("__h"))
    def shingleRows(df: DataFrame): DataFrame =
      df.select(col("doc_id"), T.tokenHashes(col("text")).as("__ths"))
        .select(col("doc_id"),
          explode(array_distinct(T.shingleIds(col("__ths"), k))).as("sh"))
    // same 90/5/5 hash split as doc_split: train < 90, test >= 95
    val trainIndex = shingleRows(withSplit.filter(col("__h") < 90))
      .select(col("sh")).distinct()
    val testSh = shingleRows(withSplit.filter(col("__h") >= 95))
    testSh.join(trainIndex, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // testSh is distinct per doc
      .orderBy(col("doc_id"))
  }
}
