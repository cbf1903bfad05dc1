package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained character-bigram language model and the per-document
  * cross-entropy score — the CCNet-style "LM quality" signal (CCNet,
  * Wenzek et al. 2020, filters by LM perplexity; a char-bigram model is
  * the deterministic, dependency-free stand-in for the 5-gram KenLM — the
  * pipeline shape is identical and that is what this operator pins down).
  *
  * Shapes, all scale-safe:
  *  - TRAIN is one corpus scan: bigram explode → hash aggregate. The model
  *    is at most |alphabet|² rows (≤ a few thousand) — it rides a
  *    broadcast, never a shuffle. In production the model trains on a
  *    corpus snapshot/sample once and is reused across scoring runs; here
  *    it trains on the input corpus itself so the gate is self-contained.
  *  - SCORE is one scan: the native BigramCounts kernel emits (doc, bg, n)
  *    already aggregated to the (doc_id, bigram) grain — ≤ |alphabet|² rows
  *    per doc, no per-doc shuffle — → broadcast join to the model → one
  *    hash aggregate back to doc grain.
  *
  * DETERMINISM (hash-gate contract): the only transcendental, ln(p), is
  * quantized through float32 (the BM25 idf trick — last-ulp libm
  * divergence dies at float32 precision), then integerized as
  * floor(lp · 1e9) nano-nats — double multiply and floor are IEEE-exact
  * on any engine, unlike a double→DECIMAL cast whose rounding rule is
  * engine-private — so the per-doc occurrence-weighted sum is an exact
  * BIGINT sum, order-independent by construction. Probabilities are
  * add-one smoothed: P(c2|c1) = (cnt+1)/(ctx+V), V = distinct second
  * characters in the corpus — every operand an exact integer, so the
  * double division is bit-identical on any IEEE engine.
  */
object LangModel {

  /** (doc_id, bg, n) — one row per DISTINCT character-bigram of the
    * lowercased text with its in-document occurrence count, from the
    * native BigramCounts kernel (one tight loop per doc emitting
    * ≤ |alphabet|² pre-aggregated rows, vs. the HOF form's one string
    * allocation per corpus CHARACTER — round 4's slowest declared query).
    * Docs shorter than 2 chars have no bigrams and drop out. */
  private def docBigramCounts(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 2)
      .select(col("doc_id"),
        explode(graft.expressions.ArrayExprs.bigram_counts(lower(col("text")))).as("bgn"))
      .select(col("doc_id"), col("bgn.bg").as("bg"), col("bgn.n").as("n"))

  /** The trained model: (bg, lp) where lp is the log-probability
    * ln((cnt+1)/(ctx+V)) quantized through float32 and integerized to
    * floor(lp · 1e9) nano-nats (BIGINT). Bounded output (≤ |alphabet|²
    * rows). */
  def charBigramModel(docs: DataFrame): DataFrame = {
    val counts = docBigramCounts(docs).groupBy(col("bg")).agg(sum(col("n")).as("cnt"))
    val ctx = counts.groupBy(substring(col("bg"), 1, 1).as("c1"))
      .agg(sum(col("cnt")).as("ctx"))
    val vocab = counts.select(countDistinct(substring(col("bg"), 2, 1)).as("v"))
    counts
      .join(broadcast(ctx), substring(col("bg"), 1, 1) === col("c1"))
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        floor(log((col("cnt") + lit(1)).cast("double") / (col("ctx") + col("v")).cast("double"))
          .cast("float").cast("double") * lit(1e9)).cast("long").as("lp"))
  }

  /** Per-document cross-entropy under the corpus bigram model:
    * (doc_id, n_bigrams, cross_entropy) — cross_entropy in nats, lower is
    * more "natural" under the corpus distribution (the CCNet keep signal).
    * Every in-corpus bigram has a model row by construction, so the join
    * is lossless on the training corpus; scoring NEW text against a
    * frozen model would left-join with an unseen-bigram floor instead. */
  def crossEntropy(docs: DataFrame): DataFrame = {
    // the kernel pre-aggregates to (doc, bg) grain map-side, so the per-doc
    // count needs no shuffle at all — straight to the broadcast model join
    val perDoc = docBigramCounts(docs)
    perDoc.join(broadcast(charBigramModel(docs)), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("n") * col("lp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        (-(col("slp").cast("double") / lit(1e9)) / col("n_bigrams").cast("double"))
          .as("cross_entropy"))
      .orderBy(col("doc_id"))
  }
}
