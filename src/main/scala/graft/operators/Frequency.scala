package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Token-frequency operators: exact vocabulary top-k and sketch-based
  * heavy hitters — the vocabulary-building / frequency-analysis stages a
  * tokenizer-training pipeline runs over the corpus first.
  *
  * The heavy-hitter path is the canonical two-pass sketch-then-verify
  * shape for 100 TB:
  *  1. per-partition Misra-Gries summaries (bounded memory: ≤ k−1
  *     counters each, one sequential pass, no shuffle) produce a
  *     CANDIDATE token set. Pigeonhole guarantees the union of
  *     per-partition candidates contains every token with global count
  *     > n/k: if c(t) > n/k = Σnₚ/k, then c_p(t) > nₚ/k in at least one
  *     partition p, and partition-local MG(k) keeps every such token.
  *  2. an exact recount over the candidates only (broadcast semi-join →
  *     hash aggregate) discharges the sketch's nondeterminism: the
  *     DECLARED output is exactly {token : count(token)·k > n}, a
  *     deterministic set with exact counts, regardless of how partition
  *     summaries merged. The sketch only bounds how much work pass 2
  *     does — candidates ≤ (k−1)·#partitions, not the vocabulary.
  * The frequency test is the exact integer comparison cnt·k > n — no
  * division, no float, bit-portable by construction.
  */
object Frequency {

  /** Exact token vocabulary, top `k` by (count desc, token asc) — the
    * explode → partial-aggregated count → TakeOrdered shape; ties broken
    * lexicographically so the cut is deterministic. */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(T.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Misra-Gries summary of one iterator, capacity `k` (≤ k−1 counters).
    * Returns surviving candidate tokens (counts are sketch-internal —
    * they under-count and depend on arrival order, so they never leave
    * this function). */
  private[operators] def mgCandidates(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      if (counters.contains(t)) counters(t) += 1L
      else if (counters.size < k - 1) counters(t) = 1L
      else {
        // decrement-all: drop zeroed counters
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val v = counters(key) - 1L
          if (v == 0L) dead += key else counters(key) = v
        }
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** TF-IDF weights against a corpus-derived vocabulary: the vocabulary
    * is [[vocabTopK]] (deterministic cut), document frequency and idf
    * come from the same corpus, and the output is the LONG grain
    * (doc_id, token, tf, w) — the sparse-matrix layout a downstream
    * trainer or indexer consumes, not a wide per-term column block.
    *
    * Scale shape: vocabulary and idf are bounded (top-V rows) and ride
    * broadcasts; the corpus-side work is one explode → (doc, token)
    * hash aggregate, partial-aggregatable map-side. idf = ln(N/df) is
    * float32-quantized (the BM25 discipline) — every other operand is an
    * exact integer, and tf·idf is one double multiply. */
  def tfIdf(docs: DataFrame, vocabSize: Int): DataFrame = {
    val vocab = vocabTopK(docs, vocabSize).select(col("token"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select(col("doc_id"), explode(T.tokens(col("text"))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left_semi")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(nDocs))
      .select(col("token"),
        log(col("n_docs").cast("double") / col("df").cast("double"))
          .cast("float").cast("double").as("idf"))
    tf.join(broadcast(idf), Seq("token"))
      .select(col("doc_id"), col("token"), col("tf"),
        (col("tf").cast("double") * col("idf")).as("w"))
      .orderBy(col("doc_id"), col("token"))
  }

  /** Heavy hitters: tokens with exact global count · k > total tokens.
    * Candidates come from per-partition MG sketches (pass 1), the
    * declared result from an exact recount of candidates only (pass 2) —
    * deterministic output, sketch-bounded cost. */
  def heavyHitters(docs: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 2, "Misra-Gries needs capacity >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens: Dataset[String] =
      docs.select(explode(T.tokens(col("text"))).as("token")).as[String]
    val candidates = tokens.mapPartitions(it => mgCandidates(it, k))
      .toDF("token").distinct()
    val total = tokens.toDF("token").agg(count(lit(1)).as("n"))
    tokens.toDF("token")
      .join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(k.toLong) > col("n"))
      .select(col("token"), col("cnt"), col("n"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Count-min sketch over token frequencies, with the estimates checked
    * against exact counts. The sketch is d hash rows × w counter slots;
    * a token's estimate is min over rows of its slot's sum — always
    * ≥ the true count (one-sided error; expected overcount ≤ N/w per
    * row).
    *
    * Expressed Spark-first: the counters are a groupBy(row, slot) SUM, so
    * partial aggregation IS sketch merging — each executor builds partial
    * counters, the reduce merges them, and because counters are sums the
    * finished sketch is independent of partition order: every estimate is
    * deterministic and cross-engine reproducible (unlike HLL/GK sketches,
    * whose internal state is merge-order-dependent). No custom aggregate
    * buffer needed — the relational formulation already has CMS's
    * distributive structure.
    *
    * Hash family: the MinHash affine family over the engine's token
    * hash, h_r(x) = ((31r+1251)·x + 17r+7397) mod P mod w.
    *
    * Output: (tok_hash, n_true, est) per distinct token — n_true rides
    * along from the same token-count frame the sketch is built from, so
    * one query both builds the sketch and audits its guarantee in a
    * SINGLE corpus pass: the slot counters are an unordered window sum
    * over (row, slot) partitions of the slotted vocab frame (identical
    * totals to a groupBy — a partition's sum is order-free), so no
    * second scan and no self-join re-executes the explode. At 100 TB
    * the audit narrows to probe tokens; the sketch itself stays the
    * bounded d·w-cell aggregate. */
  def cmsEstimates(docs: DataFrame, d: Int = 4, w: Long = 16L): DataFrame = {
    require(d >= 1 && w >= 1, "need d >= 1 hash rows and w >= 1 slots")
    val spark = docs.sparkSession
    import spark.implicits._
    val tc = docs.select(explode(T.tokenHashes(col("text"))).as("th"))
      .groupBy(col("th")).agg(count(lit(1)).as("n"))
    val slotted = tc
      .crossJoin(broadcast((0 until d).toDF("r")))
      .withColumn("slot",
        ((lit(31L) * col("r") + lit(1251L)) * col("th") + lit(17L) * col("r") + lit(7397L))
          % lit(T.HashMod) % lit(w))
    slotted
      .withColumn("c", sum(col("n"))
        .over(Window.partitionBy(col("r"), col("slot"))))
      .groupBy(col("th").as("tok_hash"), col("n").as("n_true"))
      .agg(min(col("c")).as("est"))
      .orderBy(col("tok_hash"))
  }

  /** Signed feature hashing ("hash embedding", Weinberger et al. 2009):
    * each token's portable hash is projected to bucket h mod `dims` with
    * sign ±1 from the next hash bit, and per-document bucket sums form a
    * fixed-width integer vector — the text→vector featurization that
    * needs NO vocabulary (no fit pass, no OOV, any engine reproduces it
    * from the hash definition alone). The sparse (doc, bucket) grain is
    * one map-side-combinable aggregate off the token explode; densifying
    * to `dims` integers happens at DOC grain (bounded, output shaping).
    * Emitted as a comma-joined string because exact integer components
    * hash-gate cleanly that way. */
  def hashEmbed(docs: DataFrame, dims: Int = 64): DataFrame = {
    require(dims > 0, "dims must be positive")
    val buckets = docs
      .select(col("doc_id"), explode(T.tokenHashes(col("text"))).as("h"))
      // `div` is INTEGER division (Column./ would be double division and
      // scramble the parity bit against the oracle's `//`)
      .select(col("doc_id"), (col("h") % dims).as("b"),
        when(expr(s"h div $dims") % 2 === 0, 1L).otherwise(-1L).as("s"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("s")).as("v"))
    buckets
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("v")))).as("m"))
      .select(col("doc_id"),
        concat_ws(",", transform(sequence(lit(0), lit(dims - 1)),
          i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))
            .cast("string"))).as("vec"))
      .orderBy(col("doc_id"))
  }
}
