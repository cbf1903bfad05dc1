package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Relevance scoring over the document corpus — the retrieval half of a
  * training-data pipeline (query-focused corpus slicing, nearest-neighbor
  * text retrieval for eval decontamination, quality-weighted sampling).
  *
  * BM25 here is expressed entirely as codegen'd column arithmetic over
  * ONE corpus scan plus a single 1-row global-statistics aggregate that
  * broadcasts back — no explode, no shuffle of token rows, no UDF:
  * per-document term frequencies come from `filter()` over the token
  * array in the scan stage. At 100 TB the heavy operand (the documents
  * scan) is embarrassingly parallel and the only synchronization is the
  * 1-row stats exchange.
  *
  * Float discipline (the hash-gate contract): term scores are derived
  * from exact BIGINT counts (tf, df, dl, N, Σdl) through a FIXED
  * left-to-right operation tree, mirrored token-for-token by the oracle
  * SQL generated from the same constants — the only transcendental is
  * ln() on identical double inputs, one per term.
  */
object Ranking {

  /** BM25 scores for every document against a bag of query `terms`.
    * Output: (doc_id, dl, tf_<term>..., score), ordered by doc_id; docs
    * matching no term score exactly 0.0 (0/positive), so the output has
    * one row per document — rank downstream with an ORDER BY score or a
    * top-k. k1/b are the standard Robertson defaults. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = T.tokens(col("text"))
    val tfCols = terms.map(t =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"tf_$t"))
    val base = docs.select(
      col("doc_id") +: size(toks).cast("long").as("dl") +: tfCols: _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    val withStats = base.crossJoin(broadcast(stats))
    def d(c: String): Column = col(c).cast("double")
    // avgdl as one division, referenced (recomputed identically) per term —
    // the oracle SQL spells the same tree: (sum_dl / n_docs)
    val avgdl = d("sum_dl") / d("n_docs")
    def termScore(t: String): Column = {
      // idf is quantized through float32: ln() is the one operation whose
      // last ulp differs between libm implementations (observed JVM vs
      // DuckDB at sf0.01), and a float round-trip collapses a 1-ulp double
      // disagreement with probability 1 − 2⁻²⁹. A 7-significant-digit idf
      // is far inside any ranking application's noise floor; everything
      // else in the tree is exact-integer-derived double arithmetic.
      val idf = log(lit(1.0) + (d("n_docs") - d(s"df_$t") + lit(0.5)) / (d(s"df_$t") + lit(0.5)))
        .cast("float").cast("double")
      val num = d(s"tf_$t") * lit(k1 + 1.0)
      val den = d(s"tf_$t") + lit(k1) * (lit(1.0 - b) + lit(b) * d("dl") / avgdl)
      idf * (num / den)
    }
    val score = terms.map(termScore).reduceLeft(_ + _)
    withStats.select(
        col("doc_id") +: col("dl") +: terms.map(t => col(s"tf_$t")) :+ score.as("score"): _*)
      .orderBy(col("doc_id"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion: the lexical ranking
    * (BM25) and the dense ranking (exact cosine against a query vector)
    * fuse as Σ 1/(k + rank) — ranks are INTEGERS from total-ordered
    * windows, so the fused score is a fixed arithmetic tree over exact
    * inputs, bit-portable with no float-tolerance caveats (the reason
    * RRF is preferred here over score normalization, which would mix two
    * incomparable float scales).
    *
    * Scale shape: each side is its proven sub-plan (bm25's one-scan
    * arithmetic; the cosine scan against a broadcast query row), CUT to
    * the top `depth` by a distributed TakeOrdered BEFORE any ranking
    * window — the row_number that assigns ranks then runs over `depth`
    * bounded rows, never the corpus (retrieve-then-fuse, the standard
    * RRF depth semantics: a document outside a side's top-depth
    * contributes nothing from that side). A document absent from one
    * side contributes only the other side's term (full-outer fusion). */
  def hybridSearch(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
      queryId: Long, k: Int = 20, rrfK: Int = 60, depth: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25(docs, terms)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(depth)
      // global window over a ≤depth-row frame (the .limit above) — the
      // `WindowExec: No Partition Defined` warning it logs is expected
      // and bounded; rewriting via Ranks.globalRankDesc would trade one
      // single-task pass over ≤1000 rows for three corpus passes
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>").as("qe"))
    val dense = embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        graft.functions.VectorFunctions.cosineRatio(
          graft.functions.VectorFunctions.dot(col("embedding"), col("qe")),
          sqrt(graft.functions.VectorFunctions.norm2(col("embedding"))) *
            sqrt(graft.functions.VectorFunctions.norm2(col("qe")))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id")).limit(depth)
      // bounded global window, same note as r_lex above
      .withColumn("r_dense", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("doc_id"))).cast("long"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_dense"),
        (coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("r_lex").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("r_dense").cast("double")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** Exact phrase search over a positional inverted index — the classic
    * IR primitive (and the verbatim-quote detector a contamination
    * pipeline wants beyond bag-of-k-grams).
    *
    * Shape: the postings list is ONE posexplode scan immediately filtered
    * to the phrase's terms — at 100 TB the filter is what matters: the
    * index that reaches the shuffle is |phrase terms| postings, not the
    * corpus token stream. Each term's postings are then aligned to a
    * common candidate START position (term i at position p ⇒ start
    * p − i), and phrase occurrences are the m-way intersection of those
    * start sets — (m − 1) hash equi-joins on (doc_id, start), each
    * shuffle-partitionable; no self-cartesian, no window over the corpus.
    * A persisted (term, doc, pos)-bucketed postings table turns every
    * later phrase query into joins over pruned point reads — same layout
    * economics as EmbeddingStore.
    *
    * Output: (doc_id, n_hits, first_pos) per document containing the
    * phrase at least once, ordered by doc_id; positions are 0-based token
    * offsets. Everything is exact integer arithmetic — no float anywhere. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one term")
    val postings = docs
      .select(col("doc_id"), posexplode(T.tokens(col("text"))).as(Seq("pos", "tk")))
      .filter(col("tk").isin(phrase.distinct: _*))
    val starts = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("tk") === lit(t))
        .select(col("doc_id"), (col("pos") - lit(i)).as("start"))
    }
    val hits = starts.reduceLeft((a, b) => a.join(b, Seq("doc_id", "start")))
    hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("start")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }
}
