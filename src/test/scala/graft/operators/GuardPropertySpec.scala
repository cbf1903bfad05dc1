package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.SparkSpec

/** Property pin on the GUARDED n-gram pair path (the round-12 inline
  * array-intersect rewrite of the hot re-add): on random small corpora
  * with the cutoff forced low enough that the skew guard arms with a
  * real hot set, [[Dedup.ngramJaccardPairs]]'s guarded output must
  * equal a driver-side oracle computed from the engine's own shingle
  * index — candidates from rare-shingle overlap only, every surfaced
  * pair scored on its FULL intersection (rare + hot), jaccard ≥
  * threshold. This pins the documented deviation exactly too: a pair
  * whose every shared shingle is hot is NOT surfaced. */
object GuardPropertySpec extends Properties("guardedPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(1f)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  // a short shared phrase: planted in a random subset of docs so some
  // shingles cross a low cutoff (df > 2-4) and the guard arms
  private val phrase = "stop phrase block"

  private case class DocSpec(len: Int, seed: Long, planted: Boolean,
      nul: Boolean)
  private val docGen: Gen[DocSpec] = for {
    len <- Gen.choose(0, 12)
    seed <- Gen.choose(0L, Long.MaxValue - 1)
    planted <- Gen.prob(0.5)
    nul <- Gen.prob(0.1)
  } yield DocSpec(len, seed, planted, nul)

  private val corpusGen: Gen[(List[DocSpec], Long)] = for {
    docs <- Gen.choose(8, 22).flatMap(n => Gen.listOfN(n, docGen))
    cutoff <- Gen.choose(2L, 4L)
  } yield (docs, cutoff)

  private def textOf(d: DocSpec): String =
    if (d.nul) null
    else {
      val rnd = new scala.util.Random(d.seed)
      val base = Seq.fill(d.len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      if (d.planted) (base + " " + phrase).trim else base
    }

  property("guarded pairs equal the driver-side oracle (full-intersection " +
      "scoring, rare-only candidate generation) on random corpora") =
    Prop.forAll(corpusGen) { case (specs, cutoff) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = true)))
      val rows = specs.zipWithIndex.map { case (d, i) =>
        Row(i.toLong, textOf(d))
      }
      val docs = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)

      // the engine's own shingle grain is the oracle's input: this
      // property pins the PAIR PIPELINE given shingles, not the hashing
      val shingleSets: Map[Long, Set[Long]] =
        Dedup.shingleIndex(docs, 3).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (d, a) => d -> a.map(_._2).toSet }
      val df: Map[Long, Int] = shingleSets.values.flatten
        .groupBy(identity).map { case (sh, o) => sh -> o.size }
      val hot: Set[Long] = df.collect { case (sh, d) if d > cutoff => sh }.toSet

      val ids = shingleSets.keys.toSeq.sorted
      val expected = (for {
        ii <- ids.indices; jj <- (ii + 1) until ids.size
        i = ids(ii); j = ids(jj)
        si = shingleSets(i); sj = shingleSets(j)
        rareInter = ((si -- hot) & (sj -- hot)).size
        if rareInter > 0
        inter = (si & sj).size
        jac = inter.toDouble / (si.size + sj.size - inter)
        if jac >= 0.5
      } yield (i, j, inter.toLong, jac)).toSet

      val got = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5,
          dfCutoff = Some(cutoff))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

      val keysOk = got.map(t => (t._1, t._2, t._3)) ==
        expected.map(t => (t._1, t._2, t._3))
      val jacOk = keysOk && got.forall { g =>
        expected.exists(e => e._1 == g._1 && e._2 == g._2 &&
          math.abs(e._4 - g._4) < 1e-12)
      }
      if (!keysOk || !jacOk)
        System.err.println(s"[guard-prop] cutoff=$cutoff hot=${hot.size} " +
          s"expected=${expected.toSeq.sorted} got=${got.toSeq.sorted}")
      keysOk && jacOk
    }
}
