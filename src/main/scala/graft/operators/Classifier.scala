package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Deterministic distributed logistic regression — the trainable quality
  * classifier of a data pipeline (fastText-style keep/drop scoring),
  * expressed as pure dataflow the way [[KMeans]] expresses Lloyd's.
  *
  * Each gradient-descent iteration is ONE corpus scan: broadcast the
  * current 1-row weight vector, compute per-document residuals, and
  * reduce the per-dimension gradient in a single hash aggregate. Weights
  * never sit on the driver; they chain as 1-row DataFrames through the
  * plan (the k-means centroid discipline), so the same code trains on
  * 10³ or 10¹¹ documents — the aggregate is map-side combinable and the
  * only synchronization is the 1-row weight exchange per iteration.
  *
  * DETERMINISM (hash-gate contract):
  *  - features are exact-integer-derived doubles (token counts and
  *    ratios — the doc_quality signals);
  *  - the sigmoid (the one transcendental, exp) is quantized through
  *    float32 per evaluation;
  *  - each gradient component is integerized per document as
  *    floor(x_j · r · 1e9) nano-units BEFORE the sum (double multiply +
  *    floor are IEEE-exact everywhere; a float sum would be
  *    order-dependent, a double→DECIMAL cast engine-private), so the
  *    reduction is an exact BIGINT sum — partitioning-invariant;
  *  - the update w_j − lr · (g_j / 1e9 / N) is a fixed operation tree.
  */
object Classifier {

  /** Feature/label block: x0 bias, x1 length (n_tokens/100), x2 unique
    * ratio, x3 English stop ratio; label = the doc_quality keep rule. */
  def features(docs: DataFrame): DataFrame = {
    val t = T.tokens(col("text"))
    val nTok = size(t).cast("long")
    val uniq = size(array_distinct(t)).cast("long")
    docs.select(
      col("doc_id"),
      lit(1.0).as("x0"),
      (nTok.cast("double") / lit(100.0)).as("x1"),
      (uniq.cast("double") / nTok.cast("double")).as("x2"),
      (T.stopwordHits(col("text"), T.stopwords.toMap.apply("en")).cast("long").cast("double")
        / nTok.cast("double")).as("x3"),
      (nTok.between(30, 2000) &&
        (uniq.cast("double") / nTok.cast("double")) > 0.2).cast("long").as("y"))
  }

  private val Dims = Seq("x0", "x1", "x2", "x3")

  /** σ(w·x) through float32 — the only transcendental in the loop. */
  private def sigmoidF(z: Column): Column =
    (lit(1.0) / (lit(1.0) + exp(-z))).cast("float").cast("double")

  private def dotWx(w: Int => Column): Column =
    Dims.zipWithIndex.map { case (d, j) => w(j) * col(d) }.reduceLeft(_ + _)

  /** `iters` gradient steps from w = 0 at learning rate `lr`; returns the
    * 1-row model (w0..w3, n_pos, n_docs) where n_pos counts documents the
    * final model scores above 1/2. */
  def trainLogReg(docs: DataFrame, iters: Int = 2, lr: Double = 0.5): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val feat = features(docs)
    val w0 = feat.sparkSession.range(1).select(
      Dims.indices.map(j => lit(0.0).as(s"w$j")): _*)
    var w = w0
    for (_ <- 1 to iters) {
      val prev = w
      val joined = feat.crossJoin(broadcast(prev))
      val r = sigmoidF(dotWx(j => col(s"w$j"))) - col("y").cast("double")
      val gradAggs = Dims.zipWithIndex.map { case (d, j) =>
        sum(floor(col(d) * r * lit(1e9)).cast("long")).as(s"g$j")
      } :+ count(lit(1)).as("n")
      val g = joined.agg(gradAggs.head, gradAggs.tail: _*)
      w = prev.crossJoin(broadcast(g)).select(
        Dims.indices.map(j =>
          (col(s"w$j") - lit(lr) * (col(s"g$j").cast("double") / lit(1e9)
            / col("n").cast("double"))).as(s"w$j")): _*)
    }
    val scoredCols = col("doc_id") +: Dims.indices.map(j => col(s"w$j")) :+
      (sigmoidF(dotWx(j => col(s"w$j"))) > lit(0.5)).cast("long").as("pos")
    val scored = feat.crossJoin(broadcast(w)).select(scoredCols: _*)
    scored.groupBy(Dims.indices.map(j => col(s"w$j")): _*)
      .agg(sum(col("pos")).as("n_pos"), count(lit(1)).as("n_docs"))
  }

  /** Oracle-facing SQL replay of [[trainLogReg]]: one CTE pair per
    * iteration (gradient aggregate, weight update), generated from the
    * same dimension list and constants. */
  def trainOracleSql(iters: Int = 2, lr: Double = 0.5): String = {
    val sig = (z: String) => s"CAST(CAST(1.0 / (1.0 + exp(-($z))) AS FLOAT) AS DOUBLE)"
    def wx(wPfx: String) =
      Dims.zipWithIndex.map { case (d, j) => s"$wPfx.w$j * f.$d" }.mkString(" + ")
    val feat =
      s"""lrt AS (SELECT doc_id, ${dTokensLen("text")} AS nt,
         |  len(list_distinct(string_split(text, ' ')))::BIGINT AS uq,
         |  ${dStopHitsEn("text")} AS sh FROM documents),
         |lrf AS (SELECT doc_id, 1.0::DOUBLE AS x0, nt::DOUBLE / 100.0 AS x1,
         |  uq::DOUBLE / nt::DOUBLE AS x2, sh::DOUBLE / nt::DOUBLE AS x3,
         |  (CASE WHEN nt BETWEEN 30 AND 2000 AND uq::DOUBLE / nt::DOUBLE > 0.2
         |        THEN 1 ELSE 0 END)::BIGINT AS y FROM lrt),
         |lrw0 AS (SELECT ${Dims.indices.map(j => s"0.0::DOUBLE AS w$j").mkString(", ")})""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      val g = Dims.zipWithIndex.map { case (d, j) =>
        s"sum(floor(f.$d * (${sig(wx("w"))} - f.y::DOUBLE) * 1e9))::BIGINT AS g$j"
      }.mkString(",\n  ")
      val upd = Dims.indices.map(j =>
        s"w.w$j - $lr * ((g.g$j::DOUBLE / 1e9) / g.n::DOUBLE) AS w$j").mkString(", ")
      s"""lrg$i AS (SELECT
         |  $g,
         |  count(*)::BIGINT AS n FROM lrf f, lrw${i - 1} w),
         |lrw$i AS (SELECT $upd FROM lrw${i - 1} w, lrg$i g)""".stripMargin
    }
    s"""WITH $feat,
       |${iterCtes.mkString(",\n")}
       |SELECT ${Dims.indices.map(j => s"w.w$j").mkString(", ")},
       |  sum(CASE WHEN ${sig(wx("w"))} > 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       |  count(*)::BIGINT AS n_docs
       |FROM lrf f, lrw$iters w
       |GROUP BY ${Dims.indices.map(j => s"w.w$j").mkString(", ")}""".stripMargin
  }

  // SQL fragments for the feature block (match TextFunctions semantics)
  private def dTokensLen(c: String) = s"len(string_split($c, ' '))::BIGINT"
  private def dStopHitsEn(c: String): String = {
    val set = T.stopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(lower($c), ' '), sw -> sw IN ($set)))::BIGINT"
  }
}
