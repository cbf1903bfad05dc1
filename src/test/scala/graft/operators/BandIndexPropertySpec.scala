package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.SparkSpec

/** Property pin on the persisted band index (round-12 verdict ask #1):
  * on random corpora/increments and RANDOM bucket counts (including 1 —
  * everything in one bucket — and counts far above the distinct
  * band-value count — most buckets empty, exercising the missing-dir
  * path of the direct-bucket read), the bucket-pruned
  * [[Dedup.incrementalNearDupsIndexed]] against a written index must
  * equal the inline [[Dedup.incrementalNearDups]] over the same corpus
  * row-for-row — and stay equal after a random split of the corpus into
  * build + appended increments (append-path equivalence). */
object BandIndexPropertySpec extends Properties("bandIndex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(1f)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private case class DocSpec(len: Int, seed: Long, nearDupOf: Option[Int])
  private val docGen: Gen[DocSpec] = for {
    len <- Gen.choose(0, 12)
    seed <- Gen.choose(0L, Long.MaxValue - 1)
    dup <- Gen.option(Gen.choose(0, 7))
  } yield DocSpec(len, seed, dup)

  private val caseGen: Gen[(List[DocSpec], List[DocSpec], Int, Int, Int)] = for {
    corpus <- Gen.choose(6, 16).flatMap(n => Gen.listOfN(n, docGen))
    inc <- Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, docGen))
    nBuckets <- Gen.oneOf(1, 3, 16, 64, 257)
    splitAt <- Gen.choose(1, corpus.size)
    nParts <- Gen.oneOf(1, 7, 64)
  } yield (corpus, inc, nBuckets, splitAt, nParts)

  private def textOf(d: DocSpec, all: IndexedSeq[String]): String =
    d.nearDupOf.filter(_ < all.size).map(i => all(i) + " tail note")
      .getOrElse {
        val rnd = new scala.util.Random(d.seed)
        Seq.fill(d.len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }

  private def frame(rows: Seq[(Long, String)]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq.sorted

  property("indexed == inline on random corpora, bucket counts and " +
      "build/append splits — and == the stored-corpus overload") =
    Prop.forAll(caseGen) { case (corpusSpec, incSpec, nBuckets, splitAt, nParts) =>
      // base texts first so near-dups can reference them
      val baseTexts = corpusSpec.take(8).toIndexedSeq
        .map(d => textOf(d.copy(nearDupOf = None), Vector.empty))
      val corpusRows = corpusSpec.zipWithIndex.map { case (d, i) =>
        (i.toLong, textOf(d, baseTexts))
      }
      val incRows = incSpec.zipWithIndex.map { case (d, i) =>
        (1000L + i, textOf(d, baseTexts))
      }
      val corpus = frame(corpusRows)
      val inc = frame(incRows)

      val dir = Files.createTempDirectory("bandidx-prop").toString
      val cdir = Files.createTempDirectory("cstore-prop").toString
      try {
        // cold build over a prefix, then append the rest — the indexed
        // result must match the inline path over the FULL corpus. The
        // corpus TEXT store gets the same split so the stored-corpus
        // overload exercises its append path too.
        Dedup.writeBandIndex(frame(corpusRows.take(splitAt)), dir,
          k = 3, nBuckets = nBuckets)
        CorpusStore.write(frame(corpusRows.take(splitAt)), cdir,
          nParts = nParts)
        if (splitAt < corpusRows.size) {
          Dedup.appendBandIndex(frame(corpusRows.drop(splitAt)), dir)
          CorpusStore.append(frame(corpusRows.drop(splitAt)), cdir)
        }

        val indexed = pairsOf(Dedup.incrementalNearDupsIndexed(
          inc, dir, corpus, threshold = 0.5))
        val stored = pairsOf(Dedup.incrementalNearDupsIndexed(
          inc, dir, cdir, threshold = 0.5))
        val inline = pairsOf(Dedup.incrementalNearDups(
          inc, Dedup.bandIndex(corpus, k = 3), corpus,
          k = 3, threshold = 0.5))
        if (indexed != inline || stored != inline)
          System.err.println(s"[bandidx-prop] nBuckets=$nBuckets " +
            s"splitAt=$splitAt nParts=$nParts\n indexed=$indexed\n " +
            s"stored=$stored\n inline=$inline")
        indexed == inline && stored == inline
      } finally {
        Dedup.rmdir(new java.io.File(dir))
        Dedup.rmdir(new java.io.File(cdir))
      }
    }
}
