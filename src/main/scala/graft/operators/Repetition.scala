package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Repetition-based quality filters — the Gopher-style "repetitious
  * document" signals a pretraining pipeline uses to drop boilerplate,
  * keyword-stuffed, and degenerate-generation text (reference surface:
  * the dedup/quality family; these are the within-document counterparts
  * of the cross-document dedup ops).
  *
  * Per document:
  *   - `top_token_frac`: occurrences of the single most frequent token /
  *     total tokens — a high value means one word dominates;
  *   - `dup_gram_frac`: fraction of k-gram occurrences that are repeats
  *     of a k-gram already seen in the same document;
  *   - `top_gram_frac`: occurrences of the most frequent k-gram / total
  *     k-grams.
  *
  * Scale shape: tokens and k-grams are counted at their portable-hash id
  * (8-byte keys — the same ids the dedup family joins on), via
  * explode → two-level aggregate. Both aggregates are map-side
  * combinable (partial counts per (doc, id) collapse before the
  * shuffle), the join back together is on doc_id, and nothing is ever
  * collected — per-doc mode via HOFs would be O(len²) per row and
  * codegen-hostile, while this is two standard partial-agg shuffles.
  * Documents with fewer than k tokens have no k-grams: their gram
  * metrics are 0.0 by definition (left join + coalesce). Empty text
  * does NOT vanish — split("", " ") yields [""] in Spark and DuckDB
  * alike, so an empty document appears as one empty token (n_tokens=1,
  * top_token_frac=1.0); only NULL text drops out (null token hashes
  * explode to no rows on both engines). */
object Repetition {

  /** (doc_id, n_tokens, top_token_frac, dup_gram_frac, top_gram_frac)
    * per document with at least one token. */
  def repetitionStats(docs: DataFrame, k: Int = 2): DataFrame = {
    require(k >= 1, "k-gram size must be >= 1")
    val base = docs.select(col("doc_id"), T.tokenHashes(col("text")).as("ths"))
    val tok = base.select(col("doc_id"), explode(col("ths")).as("th"))
      .groupBy(col("doc_id"), col("th")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("max_tok"))
    val gram = base
      .select(col("doc_id"), explode(T.shingleIds(col("ths"), k)).as("sh"))
      .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"), max(col("c")).as("max_gram"),
        count(lit(1)).as("n_distinct"))
    // exact bigint counts → one IEEE double division per metric: the
    // same operation in any engine, so the values are bit-reproducible
    tok.join(gram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("max_tok").cast("double") / col("n_tokens")).as("top_token_frac"),
        coalesce((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"),
          lit(0.0)).as("dup_gram_frac"),
        coalesce(col("max_gram").cast("double") / col("n_grams"),
          lit(0.0)).as("top_gram_frac"))
      .orderBy(col("doc_id"))
  }
}
