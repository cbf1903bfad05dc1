package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: documents are laid out in doc_id
  * order into one token stream, and each document is assigned the global
  * offset where it starts plus the context-window bin containing that
  * offset (concat-and-chunk packing — documents may straddle a bin
  * boundary, exactly as a GPT-style loader packs samples; bins are
  * `capacity` tokens wide).
  *
  * Scale shape: a naive global `Window.orderBy(doc_id)` cumsum collapses
  * to ONE partition — unrunnable on 10^10 docs. This runs the classic
  * distributed prefix sum instead: split the doc_id domain into ranges,
  * local cumsum per range (keyed window — parallel), then add per-range
  * prefix offsets computed from the (numRanges-sized, driver-collected)
  * range totals — one pass over the data plus two bounded driver
  * aggregates, the same economics as collecting AQE statistics.
  *
  * Determinism: the range assignment must be a PURE FUNCTION of doc_id,
  * because the totals pass and the output pass are separate query
  * executions. `repartitionByRange` does NOT qualify — RangePartitioner's
  * reservoir sampling is seeded with the RDD id, so two executions of the
  * same plan can pick different bounds once input partitions exceed the
  * sample size, silently corrupting the prefix offsets. Instead the cut
  * points are collected once via Greenwald-Khanna `approxQuantile` (a
  * deterministic summary, no RNG) and baked into the plan as literals:
  * every execution assigns identical `__pid`s. Quantile precision only
  * affects range BALANCE, never correctness — each doc's offset is the
  * token count of all lower-doc_id docs under any consistent assignment,
  * which is why a plain window-cumsum SQL oracle reproduces it exactly. */
object Packing {

  /** Per-range prefix offsets — the bounded driver step of the
    * distributed prefix-sum idiom shared by [[packOffsets]],
    * [[shuffledOrder]] and [[Ranks]]: one ≤#ranges-row aggregate of
    * `weight` per `pidCol` (collected to the driver), prefix-summed in
    * pid order. A plain sum per range (never a cumsum max) keeps the
    * prefix arithmetic exact even if a caller-supplied weight misbehaves
    * (e.g. negative on malformed rows). Returns the broadcastable
    * (pidCol, "__off") frame plus the grand total. */
  private[operators] def rangeOffsets(df: DataFrame, pidCol: String,
      weight: Column): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df.groupBy(col(pidCol)).agg(sum(weight).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val prefix = pids.zip(
      pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    (prefix.toSeq.toDF(pidCol, "__off"), totals.values.sum)
  }

  /** (doc_id, n_tokens, tok_offset, bin) per document; `tokenCount` is the
    * per-doc token count column (computed from `text` by default).
    *
    * Cost: THREE passes over the narrow (doc_id, n_tokens) projection —
    * quantile cut points, range totals, and the output pass. Each pass
    * recomputes the upstream plan of `docs`; if that upstream is
    * expensive (a join or heavy filter rather than a bare scan), cache
    * it before calling. Deliberately not persisted here: the operator
    * would either leak the cached block past its return or unpersist a
    * frame the caller's lazy action still needs. */
  def packOffsets(docs: DataFrame, capacity: Long,
      tokenCount: Column = size(split(col("text"), " ")).cast("long"),
      numRanges: Int = 32): DataFrame = {
    require(capacity > 0, "bin capacity must be positive")
    require(numRanges > 0, "numRanges must be positive")
    val spark = docs.sparkSession
    val sized = docs.select(col("doc_id"), tokenCount.as("n_tokens"))
    // bounded driver step 1: deterministic doc_id cut points (≤ numRanges-1
    // doubles). Values beyond 2^53 lose double precision here, but the
    // comparison below is still the same function of doc_id in every pass,
    // so only balance is affected.
    val probs = (1 until numRanges).map(_.toDouble / numRanges).toArray
    val bounds =
      if (numRanges == 1) Array.empty[Double]
      else sized.stat.approxQuantile("doc_id", probs, 0.001)
    val pid = bounds.distinct.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("doc_id") > lit(b), 1).otherwise(0)
    }
    val withPid = sized.withColumn("__pid", pid)
    // bounded driver step 2 ([[rangeOffsets]]): one row per range →
    // prefix offsets. The BIN assignment below, like the oracle's `//`,
    // assumes the non-negative offsets of real token counts — negative
    // counts are out of contract for bins (`div` truncates toward zero).
    val (offsets, _) = rangeOffsets(withPid, "__pid", col("n_tokens"))
    // local cumsum within each range (keyed window — parallel); the window
    // shuffle hashes on __pid, giving the same layout repartitionByRange
    // would have, minus its nondeterminism
    val w = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "tok_offset", not "offset": OFFSET is a SQL reserved word and the
    // column name is part of the cross-engine contract. `div` keeps the
    // bin computation in the long domain — floor(x / y) on doubles breaks
    // past 2^53 total tokens, which a 10^10-doc corpus exceeds.
    withPid.withColumn("__cum", sum(col("n_tokens")).over(w))
      .join(broadcast(offsets), Seq("__pid"))
      .select(col("doc_id"), col("n_tokens"),
        (col("__off") + col("__cum") - col("n_tokens")).as("tok_offset"))
      .withColumn("bin", expr(s"tok_offset div ${capacity}"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic global training-order shuffle: every document gets a
    * stable position 0..N−1 in an order that is a pure function of
    * (salt, doc_id) — reproducible across engines, runs, retries, and
    * cluster sizes, unlike orderBy(rand()). The order key is
    * `md5(salt:doc_id)` (cryptographic mixing — the engine's polynomial
    * hash is NOT used here because consecutive ids map to consecutive
    * hash values, which would leave the corpus nearly in id order);
    * sources interleave uniformly, which is what a training loader wants
    * from a pre-shuffled corpus.
    *
    * Scale shape: positions come from the same distributed prefix sum as
    * [[packOffsets]], but with UNIFORM ranges for free — the range id is
    * the first byte of the md5 key (256 ranges, each ~N/256 docs by
    * construction), so there is no quantile pass at all: one 256-row
    * driver aggregate, one keyed window, one broadcast join. */
  def shuffledOrder(docs: DataFrame, idCol: String = "doc_id",
      salt: String = "shuf"): DataFrame = {
    val withH = docs
      .withColumn("__h", md5(concat(lit(salt + ":"), col(idCol).cast("string"))))
      .withColumn("__pid", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val (offsets, _) = rangeOffsets(withH, "__pid", lit(1L))
    // ordering by the full key within a range is consistent with the
    // global key order: the range id IS the key's leading byte
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__h").asc, col(idCol).asc)
    withH.withColumn("__rn", row_number().over(w))
      .join(broadcast(offsets), Seq("__pid"))
      .select((col("__off") + col("__rn") - 1).cast("long").as("pos") +:
        docs.columns.toIndexedSeq.map(col): _*)
  }

  /** Overlapping token-window chunking — the RAG-indexing / long-doc
    * splitting primitive: each document becomes ⌈n/stride⌉-ish chunks of
    * up to `window` tokens starting every `stride` tokens (overlap =
    * window − stride). Pure per-row explode — embarrassingly parallel,
    * no shuffle before the output sort; chunk text is re-joined from the
    * token slice so downstream embeds/indexes chunks directly.
    * Start offsets are 0-based token positions; the trailing chunk is
    * short rather than padded (both engines' slices clamp). */
  def chunkWindows(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window (stride > window would drop tokens)")
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    docs
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n") - 1, lit(stride)),
          s => array_join(slice(col("toks"), s + 1, lit(window)), " ")))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id").cast("long") * stride).as("tok_start"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_chunk_tokens"),
        col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }
}
