package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication family for the training-data pipeline, each shaped for
  * 100 TB execution:
  *
  *  - exact: hash-groupBy on a content digest — one shuffle on md5, no
  *    full-text comparison;
  *  - n-gram Jaccard: shingle-explode + equi-join on the shingle — candidate
  *    pairs come from a hash join, never an O(n²) cartesian;
  *  - MinHash-LSH: signature (map-side, no shuffle) → band explode → band
  *    join → verify. Only candidates sharing a band are verified, and the
  *    band key is the one shuffle;
  *  - SimHash: 30-bit fingerprint per doc (map-side), close pairs by
  *    Hamming distance;
  *  - embedding near-dup: exact cosine threshold (verification-grade);
  *    `Similarity.lshBucketed` provides the candidate-generation scale path.
  */
object Dedup {

  /** Exact dedup: one surviving doc_id per identical text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Distinct k-shingle ids per document, exploded to (doc_id, sh) grain.
    * `sh` is the 60-bit packed shingle id (TextFunctions.shingleIds): the
    * join/shuffle key is 8 bytes, not a string. At scale, add a frequency
    * cap on ubiquitous shingles before the join (classic skew guard) —
    * omitted here to keep results exact. */
  private def shingleRows(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), T.tokenHashes(col("text")).as("ths"))
      .select(col("doc_id"),
        explode(array_distinct(T.shingleIds(col("ths"), k))).as("sh"))

  /** Document pairs with k-shingle Jaccard ≥ threshold.
    * inter/|A∪B| computed from exact bigint counts → deterministic double. */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingleRows(docs, k)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("i") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("j") === col("sb.doc_id"))
      .withColumn("jaccard", col("inter") / (col("sa.n") + col("sb.n") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("inter"), col("jaccard"))
      .orderBy(col("i"), col("j"))
  }

  /** Per-document MinHash signature (MinhashK portable hashes). Token and
    * shingle hashes are materialized as intermediate columns so each is
    * computed exactly once per document (Catalyst does not CSE lambda
    * subexpressions across the MinhashK aggregate branches). */
  def minhashSignatures(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"), T.tokenHashes(col("text")).as("ths"))
      .select(col("doc_id"), T.shingleHashes(col("ths"), k).as("shs"))
      .select(col("doc_id"), T.minhashSigFromHashes(col("shs")).as("sig"))

  /** MinHash-LSH dedup: band-join candidates, then exact-Jaccard verify —
    * but Jaccard is computed ONLY for candidate pairs (shingle rows are
    * semi-joined down to candidate docs first), which is the entire point
    * of LSH at scale: verification cost follows the candidate count, not
    * the corpus pair count. Returns verified pairs ≥ threshold (subset of
    * ngramJaccardPairs limited to LSH candidates). */
  def minhashPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val bands = minhashSignatures(docs, k)
      .select(col("doc_id"), posexplode(T.minhashBands(col("sig"))).as(Seq("band_idx", "band_val")))
    val candidates = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    val candDocs = candidates.select(col("i").as("doc_id"))
      .union(candidates.select(col("j"))).distinct()
    val sh = shingleRows(docs, k)
      .join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sh.as("sa"), col("i") === col("sa.doc_id"))
      .join(sh.as("sb"), col("j") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("i") === col("na.doc_id"))
      .join(sizes.as("nb"), col("j") === col("nb.doc_id"))
      .withColumn("jaccard", col("inter") / (col("na.n") + col("nb.n") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("inter"), col("jaccard"))
      .orderBy(col("i"), col("j"))
  }

  /** Per-document SimHash fingerprint (token hashes materialized once). */
  def simhashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), T.tokenHashes(col("text")).as("phs"))
      .select(col("doc_id"), T.simhashFromHashes(col("phs")).as("simhash"))

  /** Pairs whose SimHash Hamming distance ≤ 1, exactly — via the pigeonhole
    * band trick: two fingerprints within distance 1 agree on their upper or
    * lower 15 bits, so two hash equi-joins (one per half) produce a
    * candidate superset with zero recall loss, and the cheap bit_count
    * filter verifies. No O(n²) nested-loop compare; the band value is the
    * shuffle key, which is how this runs on 10^10 documents.
    * (For maxDist = d generally: split into d+1 bands.) */
  def simhashPairs(docs: DataFrame, maxDist: Int = 1): DataFrame = {
    require(maxDist <= 1, "band split implemented for maxDist <= 1")
    val s = simhashes(docs)
    val half = T.SimhashBits / 2
    def bandJoin(band: Column => Column): DataFrame = {
      val withBand = s.withColumn("band", band(col("simhash")))
      withBand.as("a").join(withBand.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          col("a.simhash").as("sa"), col("b.simhash").as("sb"))
    }
    val lo = bandJoin(sh => pmod(sh, lit(1L << half)))
    val hi = bandJoin(sh => floor(sh / lit(1L << half)).cast("long"))
    lo.union(hi).distinct()
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("i"), col("j"), col("hamming"))
      .orderBy(col("i"), col("j"))
  }

  /** Embedding near-duplicates: pairs with cosine ≥ threshold, exact.
    * Norms are precomputed per row (not per pair) — bit-identical value
    * (same IEEE ops, just reused), 3× fewer array folds on the O(n²) side. */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val withNorm = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"),
      sqrt(V.norm2(col("embedding"))).as("nrm"))
    withNorm.as("a").join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
      // project to narrow rows immediately: the 2×64-double arrays must not
      // ride through millions of intermediate pair rows
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        (V.dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("i"), col("j"))
  }
}
