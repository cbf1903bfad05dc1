package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceKnn` — exact cosine top-k: one broadcast of the query
  *    vector, a codegen'd map over all vectors, a TakeOrdered top-k. The
  *    correctness baseline, and at 100 TB still the right shape for a
  *    single query (scan-bound, embarrassingly parallel, no index).
  *  - `lshKnn` — random-hyperplane LSH: vectors are bucketed by sign bits
  *    (map-side, no shuffle); a query probes only its bucket. At scale the
  *    bucket id becomes the partition key so a probe touches one partition
  *    instead of the full table (IVF-style cell routing).
  */
object Similarity {

  /** Exact top-k by cosine against the vector with id `queryId`.
    * The query's norm rides along in the broadcast row so each scan row
    * pays one dot + one own-norm fold (identical IEEE ops to the naive
    * cosine, just reused). */
  def bruteForceKnn(embeddings: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("embedding"), col("q_emb")), sqrt(V.norm2(col("embedding"))) * col("q_nrm")))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily pick k items maximizing
    * `lambda·rel(c) − (1−lambda)·max_{s∈selected} sim(c, s)` — the
    * diversity-aware selection a curation pipeline uses where plain kNN
    * returns k near-duplicates of the same neighborhood.
    *
    * Scale shape: the DISTRIBUTED work is stage 1 — the exact scan-bound
    * relevance pass (same plan as [[bruteForceKnn]]) cut to the top `m`
    * candidates. The greedy loop is inherently sequential (each pick
    * changes every remaining score), so it runs on the driver over the
    * BOUNDED m-row candidate set (`require` below) — m·k cosine
    * evaluations over vectors already in hand, microseconds. At 100 TB
    * m stays a constant (64–256) while stage 1 scales out; never run
    * the greedy step over an unbounded frame.
    *
    * Determinism: driver cosines left-fold the same IEEE op sequence as
    * the distributed `DotDouble` kernel and the oracle's `list_reduce`,
    * `0.7`/`0.3` are literal doubles on both engines (never compute
    * `1−lambda`: 1−0.7 ≠ 0.3 in binary64), and ties break on vec_id —
    * so the selection ORDER is cross-engine reproducible and the
    * declared output needs no float column beyond the already-proven
    * relevance. */
  def mmrTopK(embeddings: DataFrame, queryId: Long, k: Int = 10,
      m: Int = 32, lambda: Double = 0.7, oneMinusLambda: Double = 0.3): DataFrame = {
    require(m <= 4096, s"greedy MMR collects the candidate set: m=$m must stay bounded")
    require(k <= m, s"k=$k must be <= m=$m")
    val spark = embeddings.sparkSession
    val cands = bruteForceKnn(embeddings, queryId, m)
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("cos_sim"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getSeq[Float](3).toArray))
      .sortBy { case (id, _, rel, _) => (-rel, id) }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (selected.length < math.min(k, cands.length)) {
      var best = -1; var bestScore = Double.NegativeInfinity; var bestId = Long.MaxValue
      var c = 0
      while (c < cands.length) {
        if (!selected.contains(c)) {
          val score =
            if (selected.isEmpty) lambda * cands(c)._3
            else {
              var mx = Double.NegativeInfinity
              selected.foreach { s =>
                val sim = cos(cands(c)._4, cands(s)._4)
                if (sim > mx) mx = sim
              }
              lambda * cands(c)._3 - oneMinusLambda * mx
            }
          if (score > bestScore || (score == bestScore && cands(c)._1 < bestId)) {
            best = c; bestScore = score; bestId = cands(c)._1
          }
        }
        c += 1
      }
      selected += best
    }
    import spark.implicits._
    selected.zipWithIndex.map { case (c, i) =>
      ((i + 1).toLong, cands(c)._1, cands(c)._2, cands(c)._3)
    }.toSeq.toDF("rank", "vec_id", "label", "cos_sim")
  }

  /** Vectors annotated with their LSH bucket. */
  def withBucket(embeddings: DataFrame, nPlanes: Int = 8): DataFrame =
    embeddings.withColumn("bucket", V.lshBucket(col("embedding"), nPlanes))

  /** LSH-bucketed ANN: top-k by cosine *within the query's bucket*. */
  def lshKnn(embeddings: DataFrame, queryId: Long, k: Int = 10, nPlanes: Int = 4): DataFrame = {
    val bucketed = withBucket(embeddings, nPlanes)
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"),
        sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    bucketed.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .filter(col("bucket") === col("q_bucket"))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("embedding"), col("q_emb")), sqrt(V.norm2(col("embedding"))) * col("q_nrm")))
      .select(col("vec_id"), col("label"), col("bucket"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Two-stage quantized kNN: stage 1 scans int8 CODES — the 4×-smaller
    * at-rest form, so the scan is memory-bandwidth-cheap at 100 TB — and
    * keeps the top `rescoreDepth` candidates by approximate score
    * (integer code dot × scales: exact int64 arithmetic, identically
    * reproducible in the oracle); stage 2 rescores ONLY those candidates
    * with the exact float cosine and returns the top k. The classic
    * retrieve-then-rerank economics: full-precision vectors are touched
    * for rescoreDepth rows, not the corpus. */
  def quantizedKnn(embeddings: DataFrame, queryId: Long, k: Int = 10,
      rescoreDepth: Int = 40): DataFrame = {
    val withQ = V.withQuantized(embeddings.select(col("vec_id"), col("label"), col("embedding")))
    val q = withQ.filter(col("vec_id") === queryId)
      .select(col("codes").as("q_codes"), col("scale").as("q_scale"),
        col("emb").as("q_emb"), sqrt(V.norm2(col("emb"))).as("q_nrm"))
    val candidates = withQ.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      // integer code dot (native DotLong): exact int64, once per corpus row
      .withColumn("approx",
        V.dotCodes(col("codes"), col("q_codes")).cast("double") * col("scale") * col("q_scale"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rescoreDepth)
    candidates
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("emb"), col("q_emb")), sqrt(V.norm2(col("emb"))) * col("q_nrm")))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Product-quantized kNN (ADC retrieve → exact rerank): the next
    * at-rest compression step after int8 scalar quantization — each
    * vector becomes m sub-space codes (here 8 codes for a 64-dim vector:
    * 8 bytes/vector at rest, 32× smaller than float32), and stage-1
    * scoring reads ONLY codes + a per-query lookup table.
    *
    * Codebook: the sub-vectors of the corpus rows with vec_id < 256 — a
    * deterministic sample-initialized codebook (k-means init without
    * Lloyd rounds) chosen so an external engine can reproduce training,
    * encoding, and scoring bit-for-bit; swap in iterated k-means for
    * production recall, the plan shape does not change. Encoding is a
    * broadcast join corpus×codebook per subspace + argmin (ties → lowest
    * centroid id); scoring is the classic asymmetric-distance lookup:
    * approx_cos = Σ_s dot(q_s, cb[c_s]) / √(Σ_s ‖cb[c_s]‖²), with both
    * sums on DECIMAL so per-group aggregation order cannot perturb the
    * candidate ranking. Stage 2 rescores `rescoreDepth` candidates with
    * the exact float cosine.
    *
    * At 100 TB: the codes table is the scan (8 B/vector), the LUT is
    * m·256 doubles broadcast per query, and full-precision vectors are
    * fetched for rescoreDepth rows only. */
  def pqKnn(embeddings: DataFrame, queryId: Long, k: Int = 10,
      subspaces: Int = 8, rescoreDepth: Int = 40): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
    // one row per (vector, subspace): sub = that subspace's slice
    val m = subspaces
    val sub = base.select(col("vec_id"), col("emb"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("dsub", (size(col("emb")) / m).cast("int"))
      .withColumn("sub", slice(col("emb"), col("s") * col("dsub") + 1, col("dsub")))
      .select(col("vec_id"), col("s"), col("sub"))
    val cb = sub.filter(col("vec_id") < 256)
      .select(col("vec_id").as("c"), col("s"), col("sub").as("csub"))
    // encode: per (vector, subspace) the centroid minimizing the L2
    // distance — scored as ‖c‖² − 2·a·c (argmin-equivalent: ‖a‖² is
    // constant within the group), both terms native codegen'd dots with
    // engine-portable left folds, so the n·m·K score rows never touch an
    // interpreted lambda. Argmin as a single struct-min aggregate:
    // lexicographic (score, c) gives the lowest centroid id on ties,
    // partial aggregation combines map-side, and the score rows are
    // computed ONCE (a min-join formulation would re-execute the whole
    // encode branch: Catalyst does not CSE across DataFrame references).
    val cb2 = cb.withColumn("n2", V.dot(col("csub"), col("csub")))
    val codes = sub.join(broadcast(cb2), Seq("s"))
      .withColumn("d2", col("n2") - lit(2.0) * V.dot(col("sub"), col("csub")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("c"))).as("m"))
      .select(col("vec_id"), col("s"), col("m.c").as("c"))
    // per-query LUT: dot(q_s, centroid) per (s, c); the centroid norm is
    // the SAME n2 the encode used (one formulation, no second copy to
    // drift out of FP lockstep with the oracle)
    val qSub = sub.filter(col("vec_id") === queryId)
      .select(col("s"), col("sub").as("qsub"))
    val lut = cb2.join(broadcast(qSub), Seq("s"))
      .select(col("s"), col("c"),
        V.dot(col("csub"), col("qsub")).as("dotv"),
        col("n2").as("n2v"))
    // stage 1: ADC score from codes alone; DECIMAL sums keep the ranking
    // independent of aggregation order on both engines
    val approx = codes.filter(col("vec_id") =!= queryId)
      .join(broadcast(lut), Seq("s", "c"))
      .groupBy(col("vec_id"))
      .agg(
        sum(col("dotv").cast("decimal(38,18)")).cast("double").as("adot"),
        sum(col("n2v").cast("decimal(38,18)")).cast("double").as("an2"))
      .select(col("vec_id"),
        when(col("an2") === 0.0, lit(-1e300))
          .otherwise(col("adot") / sqrt(col("an2"))).as("approx"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rescoreDepth)
    // stage 2: exact cosine over the surviving candidates only
    val q = base.filter(col("vec_id") === queryId)
      .select(col("emb").as("q_emb"), sqrt(V.norm2(col("emb"))).as("q_nrm"))
    approx.join(base, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("emb"), col("q_emb")), sqrt(V.norm2(col("emb"))) * col("q_nrm")))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF kNN with k-means-trained cells — the trained-index counterpart
    * of `lshKnn`'s data-independent hyperplane cells: centroids come from
    * [[KMeans.centroidsAfter]], every vector routes to its nearest
    * centroid's cell, and a query scans only the `nProbe` cells whose
    * centroids are closest to it, exact-cosine-reranking the survivors.
    *
    * At 100 TB this is the FAISS-style layout expressed in Spark terms:
    * the cell id is the partition key of the vector table (EmbeddingStore
    * writes exactly that layout), centroids (k·d doubles) broadcast, and
    * a probe is nProbe partition point-reads + a TakeOrdered — the corpus
    * scan only ever happens at train time. Here the routing join is the
    * same broadcast-filter shape the other kNN variants use, so the plan
    * stays codegen'd end to end. */
  def ivfKnn(embeddings: DataFrame, queryId: Long, k: Int = 10,
      nCells: Int = 8, nProbe: Int = 2, iters: Int = 2): DataFrame = {
    val cents = KMeans.centroidsAfter(embeddings, nCells, iters)
    val cells = KMeans.assignCells(embeddings, cents)
    val qEmb = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    // the nProbe cells whose centroids sit closest to the query (ties →
    // lower cell id), exactly the KMeans assignment metric
    val probeCells = cents.crossJoin(broadcast(qEmb))
      .select(col("cid"), KMeans.dist2(col("q_emb"), col("cent")).as("qd2"))
      .orderBy(col("qd2"), col("cid"))
      .limit(nProbe)
      .select(col("cid"))
    embeddings.filter(col("vec_id") =!= queryId)
      .join(cells.join(broadcast(probeCells), Seq("cid")), Seq("vec_id"))
      .crossJoin(broadcast(qEmb))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("embedding"), col("q_emb")), sqrt(V.norm2(col("embedding"))) * col("q_nrm")))
      .select(col("vec_id"), col("label"), col("cid").as("cell"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF+PQ kNN — the two index ideas composed, i.e. the FAISS IVFPQ
    * layout: coarse k-means cells bound WHICH vectors a probe touches
    * ([[ivfKnn]]'s routing), product-quantized codes bound what a touched
    * vector COSTS to score ([[pqKnn]]'s 8-byte ADC scan), and an exact
    * rerank restores full precision for the final top-k.
    *
    * Stage shape: train nCells centroids (collected to a local relation —
    * Catalyst does not CSE DataFrame references, so leaving the Lloyd
    * subtree in the plan would re-run training once per consumer); assign
    * every vector its cell; pick the query's nProbe nearest cells; ADC-
    * score ONLY the vectors assigned to those cells from their PQ codes
    * (broadcast LUT of m·256 dots, DECIMAL sums so aggregation order
    * cannot perturb the candidate ranking); exact-cosine rerank the top
    * `rescoreDepth`.
    *
    * At 100 TB: cells are the partition key (EmbeddingStore's layout), so
    * a probe reads nProbe partitions of 8 B/vector codes — the float
    * vectors are fetched for rescoreDepth rows only. That is the
    * memory-bandwidth story that makes billion-vector ANN work, expressed
    * as partition pruning + a broadcast-LUT aggregation Spark codegens. */
  def ivfPqKnn(embeddings: DataFrame, queryId: Long, k: Int = 10,
      nCells: Int = 8, nProbe: Int = 2, iters: Int = 2,
      subspaces: Int = 8, rescoreDepth: Int = 40): DataFrame = {
    val spark = embeddings.sparkSession
    val trained = KMeans.centroidsAfter(embeddings, nCells, iters)
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    val cells = KMeans.assignCells(embeddings, cents)
    val qEmb = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    val probeCells = cents.crossJoin(broadcast(qEmb))
      .select(col("cid"), KMeans.dist2(col("q_emb"), col("cent")).as("qd2"))
      .orderBy(col("qd2"), col("cid"))
      .limit(nProbe)
      .select(col("cid"))
    // membership of the probed cells — the only vectors stage 1 touches
    val probed = cells.join(broadcast(probeCells), Seq("cid"))
      .select(col("vec_id"), col("cid"))

    // --- PQ encode (identical arithmetic to pqKnn: sample-initialized
    // codebook from vec_id < 256, argmin over ‖c‖² − 2·a·c) ---
    val base = embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
    val m = subspaces
    val sub = base.select(col("vec_id"), col("emb"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("dsub", (size(col("emb")) / m).cast("int"))
      .withColumn("sub", slice(col("emb"), col("s") * col("dsub") + 1, col("dsub")))
      .select(col("vec_id"), col("s"), col("sub"))
    val cb2 = sub.filter(col("vec_id") < 256)
      .select(col("vec_id").as("c"), col("s"), col("sub").as("csub"))
      .withColumn("n2", V.dot(col("csub"), col("csub")))
    // encode only the probed membership: at rest the codes exist for the
    // whole corpus, but this probe's plan never has to touch the rest —
    // the semi-join keeps the local run honest about that cost model
    val codes = sub.join(broadcast(probed.select(col("vec_id"))), Seq("vec_id"), "left_semi")
      .join(broadcast(cb2), Seq("s"))
      .withColumn("d2", col("n2") - lit(2.0) * V.dot(col("sub"), col("csub")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("c"))).as("mn"))
      .select(col("vec_id"), col("s"), col("mn.c").as("c"))
    val qSub = sub.filter(col("vec_id") === queryId)
      .select(col("s"), col("sub").as("qsub"))
    val lut = cb2.join(broadcast(qSub), Seq("s"))
      .select(col("s"), col("c"),
        V.dot(col("csub"), col("qsub")).as("dotv"),
        col("n2").as("n2v"))
    // stage 1: ADC over probed-cell codes only
    val approx = codes.filter(col("vec_id") =!= queryId)
      .join(broadcast(lut), Seq("s", "c"))
      .groupBy(col("vec_id"))
      .agg(
        sum(col("dotv").cast("decimal(38,18)")).cast("double").as("adot"),
        sum(col("n2v").cast("decimal(38,18)")).cast("double").as("an2"))
      .select(col("vec_id"),
        when(col("an2") === 0.0, lit(-1e300))
          .otherwise(col("adot") / sqrt(col("an2"))).as("approx"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rescoreDepth)
    // stage 2: exact cosine over the surviving candidates, cell id kept
    approx.join(base, Seq("vec_id"))
      .join(probed, Seq("vec_id"))
      .crossJoin(broadcast(qEmb))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("emb"), col("q_emb")), sqrt(V.norm2(col("emb"))) * col("q_nrm")))
      .select(col("vec_id"), col("label"), col("cid").as("cell"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-path quality evaluation — recall@k of the nProbe-cell k-means
    * retrieval against the exact top-k over held-out queries (vec_id <
    * nQueries; centroids are trained on the full table, exactly as the
    * production index would be built before queries arrive). Same
    * one-scored-pass shape as [[lshRecallAtK]]: probe membership is a
    * broadcast join against the (nQueries·nProbe)-row probe-cell list,
    * and both rankings come from one window spec. */
  def ivfRecallAtK(embeddings: DataFrame, nQueries: Long = 8, k: Int = 10,
      nCells: Int = 8, nProbe: Int = 2, iters: Int = 2): DataFrame = {
    // collect the trained centroids (k rows — driver-bounded by
    // construction) and re-emit them as a local relation: both the
    // assignment and the probe branch reference them, and Catalyst does
    // not CSE DataFrame references, so leaving the training subtree in
    // the plan would run the full Lloyd iterations twice
    val spark = embeddings.sparkSession
    val trained = KMeans.centroidsAfter(embeddings, nCells, iters)
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    val cells = KMeans.assignCells(embeddings, cents)
    val q = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("qd2").asc, col("cid").asc)
    val probe = cents.crossJoin(broadcast(q))
      .select(col("query_id"), col("cid"),
        KMeans.dist2(col("q_emb"), col("cent")).as("qd2"))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("cid"), lit(true).as("in_probe"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val ranked = embeddings.filter(col("vec_id") >= nQueries)
      .join(cells.select(col("vec_id"), col("cid")), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .join(broadcast(probe), Seq("query_id", "cid"), "left")
      .withColumn("in_probe", coalesce(col("in_probe"), lit(false)))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("embedding"), col("q_emb")), sqrt(V.norm2(col("embedding"))) * col("q_nrm")))
      .withColumn("rn_all", row_number().over(wq))
      .withColumn("rn_probe", sum(when(col("in_probe"), 1L).otherwise(0L))
        .over(wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked
      .filter(col("rn_all") <= k && col("in_probe") && col("rn_probe") <= k)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      .join(q.select(col("query_id")), Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) / lit(k.toDouble)).as("recall"))
      .orderBy(col("query_id"))
  }

  /** IVFPQ retrieval quality — recall@k of the composed index
    * ([[ivfPqKnn]]: probe nProbe cells, ADC-rank their members' PQ codes
    * to rescoreDepth, exact rerank) against the exact top-k over held-out
    * queries (vec_id < nQueries). The eval the two single-index evals
    * ([[ivfRecallAtK]], [[pqRecallAtK]]) cannot substitute for: the
    * composed recall is bounded by BOTH the probe's cell coverage and the
    * ADC ranking's fidelity, and this measures the product on the actual
    * corpus. Same one-scored-pass shape: probe membership and ADC
    * candidacy are broadcast joins against per-query bounded lists, both
    * rankings come from one window spec. */
  def ivfPqRecallAtK(embeddings: DataFrame, nQueries: Long = 8, k: Int = 10,
      nCells: Int = 8, nProbe: Int = 2, iters: Int = 2,
      subspaces: Int = 8, rescoreDepth: Int = 40): DataFrame = {
    val spark = embeddings.sparkSession
    val trained = KMeans.centroidsAfter(embeddings, nCells, iters)
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    val cells = KMeans.assignCells(embeddings, cents)
    val m = subspaces
    val base = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val q = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        sqrt(V.norm2(col("emb"))).as("q_nrm"))
    // per-query probe cells (same assignment metric, ties → lower cid)
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("qd2").asc, col("cid").asc)
    val probe = cents.crossJoin(broadcast(q.select(col("query_id"), col("q_emb"))))
      .select(col("query_id"), col("cid"),
        KMeans.dist2(col("q_emb"), col("cent")).as("qd2"))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("cid"))
    // probe membership: corpus rows in a query's probed cells
    val member = cells.filter(col("vec_id") >= nQueries)
      .join(broadcast(probe), Seq("cid"))
      .select(col("query_id"), col("vec_id"))
    // PQ encode of the corpus (identical arithmetic to pqRecallAtK)
    val sub = base.select(col("vec_id"), col("emb"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("dsub", (size(col("emb")) / m).cast("int"))
      .withColumn("sub", slice(col("emb"), col("s") * col("dsub") + 1, col("dsub")))
      .select(col("vec_id"), col("s"), col("sub"))
    val cb2 = sub.filter(col("vec_id") < 256)
      .select(col("vec_id").as("c"), col("s"), col("sub").as("csub"))
      .withColumn("n2", V.dot(col("csub"), col("csub")))
    val codes = sub.filter(col("vec_id") >= nQueries)
      .join(broadcast(cb2), Seq("s"))
      .withColumn("d2", col("n2") - lit(2.0) * V.dot(col("sub"), col("csub")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("c"))).as("mn"))
      .select(col("vec_id"), col("s"), col("mn.c").as("c"))
    val qSub = sub.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("s"), col("sub").as("qsub"))
    val lut = cb2.join(broadcast(qSub), Seq("s"))
      .select(col("query_id"), col("s"), col("c"),
        V.dot(col("csub"), col("qsub")).as("dotv"), col("n2").as("n2v"))
    // ADC rank WITHIN the probe membership only — the composed candidacy
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val cand = codes.join(broadcast(lut), Seq("s", "c"))
      // membership semi-join BEFORE the per-(query,vec) aggregation: at
      // scale only probed-cell rows pay the ADC fold, mirroring ivfPqKnn
      .join(member, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id"), col("vec_id"))
      .agg(
        sum(col("dotv").cast("decimal(38,18)")).cast("double").as("adot"),
        sum(col("n2v").cast("decimal(38,18)")).cast("double").as("an2"))
      .select(col("query_id"), col("vec_id"),
        when(col("an2") === 0.0, lit(-1e300))
          .otherwise(col("adot") / sqrt(col("an2"))).as("approx"))
      .withColumn("crn", row_number().over(wApprox))
      .filter(col("crn") <= rescoreDepth)
      .select(col("query_id"), col("vec_id"), lit(true).as("is_cand"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val ranked = base.filter(col("vec_id") >= nQueries)
      .crossJoin(broadcast(q))
      .join(broadcast(cand), Seq("query_id", "vec_id"), "left")
      .withColumn("is_cand", coalesce(col("is_cand"), lit(false)))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("emb"), col("q_emb")), sqrt(V.norm2(col("emb"))) * col("q_nrm")))
      .withColumn("rn_all", row_number().over(wq))
      .withColumn("rn_cand", sum(when(col("is_cand"), 1L).otherwise(0L))
        .over(wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked
      .filter(col("rn_all") <= k && col("is_cand") && col("rn_cand") <= k)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      .join(q.select(col("query_id")), Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) / lit(k.toDouble)).as("recall"))
      .orderBy(col("query_id"))
  }

  /** PQ retrieval quality — recall@k of the two-stage product-quantized
    * search ([[pqKnn]]: ADC code scan to `rescoreDepth`, exact rerank)
    * against the exact top-k, over a held-out query set (vec_id <
    * nQueries; the corpus is the rest). Completes the eval symmetry:
    * every ANN family in the engine (LSH, IVF, PQ) now carries its own
    * measured per-corpus recall instead of a datasheet number.
    *
    * Shape: codes and codebook are query-independent (built once, the
    * persisted artifact at scale); per-query LUTs are a bounded
    * broadcast (nQueries · m · 256 rows). The PQ candidate set (nQueries
    * · rescoreDepth ids) joins back as a marker onto ONE exact-scoring
    * pass that feeds both rankings — same one-sort window discipline as
    * [[lshRecallAtK]]/[[ivfRecallAtK]], so truth and retrieval never
    * drift onto different scores. Deterministic throughout → the recall
    * values themselves sit under the cross-engine hash. */
  def pqRecallAtK(embeddings: DataFrame, nQueries: Long = 8, k: Int = 10,
      subspaces: Int = 8, rescoreDepth: Int = 40): DataFrame = {
    val m = subspaces
    val base = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val sub = base.select(col("vec_id"), col("emb"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("dsub", (size(col("emb")) / m).cast("int"))
      .withColumn("sub", slice(col("emb"), col("s") * col("dsub") + 1, col("dsub")))
      .select(col("vec_id"), col("s"), col("sub"))
    val cb2 = sub.filter(col("vec_id") < 256)
      .select(col("vec_id").as("c"), col("s"), col("sub").as("csub"))
      .withColumn("n2", V.dot(col("csub"), col("csub")))
    val codes = sub.filter(col("vec_id") >= nQueries)
      .join(broadcast(cb2), Seq("s"))
      .withColumn("d2", col("n2") - lit(2.0) * V.dot(col("sub"), col("csub")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("c"))).as("mn"))
      .select(col("vec_id"), col("s"), col("mn.c").as("c"))
    val qSub = sub.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("s"), col("sub").as("qsub"))
    val lut = cb2.join(broadcast(qSub), Seq("s"))
      .select(col("query_id"), col("s"), col("c"),
        V.dot(col("csub"), col("qsub")).as("dotv"), col("n2").as("n2v"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val cand = codes.join(broadcast(lut), Seq("s", "c"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(
        sum(col("dotv").cast("decimal(38,18)")).cast("double").as("adot"),
        sum(col("n2v").cast("decimal(38,18)")).cast("double").as("an2"))
      .select(col("query_id"), col("vec_id"),
        when(col("an2") === 0.0, lit(-1e300))
          .otherwise(col("adot") / sqrt(col("an2"))).as("approx"))
      .withColumn("crn", row_number().over(wApprox))
      .filter(col("crn") <= rescoreDepth)
      .select(col("query_id"), col("vec_id"), lit(true).as("is_cand"))
    val q = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        sqrt(V.norm2(col("emb"))).as("q_nrm"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val ranked = base.filter(col("vec_id") >= nQueries)
      .crossJoin(broadcast(q))
      .join(broadcast(cand), Seq("query_id", "vec_id"), "left")
      .withColumn("is_cand", coalesce(col("is_cand"), lit(false)))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("emb"), col("q_emb")), sqrt(V.norm2(col("emb"))) * col("q_nrm")))
      .withColumn("rn_all", row_number().over(wq))
      .withColumn("rn_cand", sum(when(col("is_cand"), 1L).otherwise(0L))
        .over(wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked
      .filter(col("rn_all") <= k && col("is_cand") && col("rn_cand") <= k)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      .join(q.select(col("query_id")), Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) / lit(k.toDouble)).as("recall"))
      .orderBy(col("query_id"))
  }

  /** Multi-probe LSH ANN: probe the query's bucket AND every bucket whose
    * sign pattern differs by ≤ `maxFlips` bits — the standard recall
    * recovery for hyperplane LSH (a near neighbor on the far side of one
    * hyperplane lands one bit away). `maxFlips` = 1 scans nPlanes+1 of the
    * 2^nPlanes cells, so candidate volume rises linearly in nPlanes while
    * recall approaches brute force. At scale the probed cells are
    * enumerable ((p choose ≤f) values) so a bucket-partitioned layout still
    * serves the probe as point lookups; here it is the same broadcast-
    * filter shape as lshKnn with a bit_count(xor) ≤ f predicate. */
  def lshKnnMultiProbe(embeddings: DataFrame, queryId: Long, k: Int = 10,
      nPlanes: Int = 4, maxFlips: Int = 1): DataFrame = {
    val bucketed = withBucket(embeddings, nPlanes)
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"),
        sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    bucketed.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= maxFlips)
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("embedding"), col("q_emb")), sqrt(V.norm2(col("embedding"))) * col("q_nrm")))
      .select(col("vec_id"), col("label"), col("bucket"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN quality evaluation — recall@k of the multi-probe LSH retrieval
    * against the exact top-k, measured over a held-out query set
    * (vec_id < nQueries; the corpus is the rest). "Measure, don't guess":
    * the recall a bucketed index actually delivers at a given
    * (nPlanes, maxFlips) is corpus-dependent, and this op is the
    * per-corpus measurement a pipeline runs before trusting the index.
    *
    * Shape: queries are the broadcast side (bounded by nQueries), and ONE
    * scored pass genuinely feeds both rankings — the exact rank is
    * row_number over the (query)-keyed window, the LSH rank is a running
    * count of probe-set rows over the SAME window spec (same partition,
    * same order → one sort, one Exchange, one Window operator), so the
    * corpus×queries dot products are computed exactly once. Every number
    * is deterministic (ties broken by vec_id), so the full recall values
    * sit under the cross-engine hash, not just a tolerance boolean. */
  def lshRecallAtK(embeddings: DataFrame, nQueries: Long = 8, k: Int = 10,
      nPlanes: Int = 4, maxFlips: Int = 1): DataFrame = {
    val bucketed = withBucket(embeddings, nPlanes)
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"), sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val ranked = bucketed.filter(col("vec_id") >= nQueries)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim",
        V.cosineRatio(V.dot(col("embedding"), col("q_emb")), sqrt(V.norm2(col("embedding"))) * col("q_nrm")))
      .withColumn("in_probe",
        bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= maxFlips)
      .withColumn("rn_all", row_number().over(wq))
      .withColumn("rn_probe", sum(when(col("in_probe"), 1L).otherwise(0L))
        .over(wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked
      .filter(col("rn_all") <= k && col("in_probe") && col("rn_probe") <= k)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      .join(q.select(col("query_id")), Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) / lit(k.toDouble)).as("recall"))
      .orderBy(col("query_id"))
  }

  /** Exact kNN JOIN: the top-k cosine neighbors of EVERY query in the
    * query block, from one corpus scan — the batch shape real retrieval
    * pipelines run (embed a request batch, join it against the corpus),
    * where the single-query `bruteForceKnn` is the debugging tool.
    *
    * Top-k per query is two-stage so the corpus is never shuffled onto
    * the query id: stage 1 ranks within (query, scan-partition) — a
    * window keyed by `spark_partition_id`, so its shuffle spreads over
    * |queries|·|partitions| skew-free keys — and keeps ≤ k rows each;
    * stage 2 ranks the ≤ k·P survivors per query. A single
    * `Window.partitionBy(query_id)` would instead funnel |corpus| rows
    * into each of a handful of reducers — the maximally-skewed shuffle.
    * The result is partition-count-independent: any global top-k row is
    * also top-k within whatever partition it sits in, so stage 1 can
    * never evict a true answer. Ties break on (cos_sim DESC, vec_id) in
    * both stages, same as every ANN ranking here. */
  def knnJoin(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    require(nQueries > 0 && k > 0, "nQueries and k must be positive")
    val q = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        sqrt(V.norm2(col("embedding"))).as("q_nrm"))
    val scored = embeddings.filter(col("vec_id") >= nQueries)
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"), col("label"),
        V.cosineRatio(V.dot(col("embedding"), col("q_emb")),
          sqrt(V.norm2(col("embedding"))) * col("q_nrm")).as("cos_sim"))
    val wLocal = Window.partitionBy(col("query_id"), col("pid"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k)
      .withColumn("rk", row_number().over(wGlobal).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("label"),
        col("cos_sim"))
      .orderBy(col("query_id"), col("rk"))
  }
}
