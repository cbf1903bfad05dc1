package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the id-partitioned corpus TEXT store (round-13 verdict ask #1):
  * the `cst2` layout — (doc_id, text) Hive-partitioned by pmod(doc_id,
  * n_parts), doc_id-sorted files, partition count + the listing-manifest
  * torn-append token ([[StoreManifest]]) + [[Dedup.docReceipt]] in
  * meta — and the contracts around it:
  *
  *  - [[CorpusStore.fetchDocs]] point reads open ONLY the touched idp
  *    directories (inputFiles-pinned) and return exactly the asked docs;
  *  - the stored-corpus [[Dedup.incrementalNearDupsIndexed]] overload is
  *    row-identical to the in-memory-corpus overload and the inline path
  *    (the randomized twin lives in BandIndexPropertySpec);
  *  - a band index and corpus store describing DIFFERENT corpora are
  *    refused up front via the shared receipt (stale-store guard);
  *  - torn appends are detected (rows ≠ meta) with a rebuild message;
  *  - compaction is row-preserving, drift-bounded, and restores the
  *    per-file doc_id sort;
  *  - a legacy/absent store is refused actionably.
  */
class CorpusStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tail(seed: Int): String =
    (0 until 12).map(i => s"w${seed}_$i").mkString(" ")

  private def corpusDocs: DataFrame =
    ((1L to 20L).map { id =>
      val t = if (id == 2L) tail(1) + " extra"
        else if (id == 6L) tail(5) + " extra"
        else tail(id.toInt)
      (id, t)
    }).toDF("doc_id", "text")

  private def incrementDocs: DataFrame = Seq(
    (101L, tail(1) + " note"),
    (102L, "fresh short page about topic x"),
    (103L, tail(400))).toDF("doc_id", "text")

  test("fetchDocs point-reads exactly the touched idp directories and " +
      "files are doc_id-sorted from the first write") {
    val dir = Files.createTempDirectory("cstore").toString
    try {
      CorpusStore.write(corpusDocs, dir, nParts = 8)
      val got = CorpusStore.fetchDocs(spark, dir, Seq(3L, 11L, 999L))
      val rows = got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(rows == Seq((3L, tail(3)), (11L, tail(11))),
        s"fetch must return asked docs and skip absent ids: $rows")
      // the read opens only idp=3 (3 and 11 share pmod 8 = 3; 999 -> 7)
      val dirsRead = got.inputFiles.map(f =>
        f.split("/").find(_.startsWith("idp=")).getOrElse("?")).toSet
      assert(dirsRead == Set("idp=3", "idp=7"),
        s"point read must open touched idp dirs only, opened $dirsRead")
      // every bucket file is a doc_id-sorted run on its own
      val base = new java.io.File(dir, s"docs_${CorpusStore.Layout}")
      val files = base.listFiles().filter(_.getName.startsWith("idp="))
        .flatMap(_.listFiles())
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      for (f <- files) {
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
        assert(ids == ids.sorted, s"unsorted store file ${f.getName}: $ids")
      }
      // empty ask: empty frame, correct schema, no FS work
      assert(CorpusStore.fetchDocs(spark, dir, Seq.empty).collect().isEmpty)
      // over-cap id list (graft.dedup.fetchDocsMaxIds forced to 0):
      // the lookup swaps the InSet literal for a broadcast semi-join —
      // same pruned dirs (ADVICE r14's multi-million-literal cliff
      // never reaches the driver), identical rows
      spark.conf.set("graft.dedup.fetchDocsMaxIds", "0")
      try {
        val joined = CorpusStore.fetchDocs(spark, dir, Seq(3L, 11L, 999L))
        val jRows = joined.collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
        assert(jRows == rows, s"semi-join fallback diverged: $jRows vs $rows")
        val jDirs = joined.inputFiles.map(f =>
          f.split("/").find(_.startsWith("idp=")).getOrElse("?")).toSet
        assert(jDirs == Set("idp=3", "idp=7"),
          s"the over-cap shape must keep the dir pruning, opened $jDirs")
      } finally spark.conf.unset("graft.dedup.fetchDocsMaxIds")
      // SATURATION guard (round 16): an id set touching >= half the
      // existing dirs takes ONE root discovery instead of enumerating
      // the dir paths (measured cheaper from ~50% coverage; at object-
      // store latencies the inversion is much larger) — rows identical,
      // absent ids still contribute nothing
      val sat = CorpusStore.fetchDocs(spark, dir, (1L to 20L) :+ 999L)
      val satRows = sat.collect().map(r => (r.getLong(0), r.getString(1)))
        .toSeq.sorted
      assert(satRows.map(_._1) == (1L to 20L),
        s"saturated fetch must return every present id: ${satRows.map(_._1)}")
      val satDirs = sat.inputFiles.map(f =>
        f.split("/").find(_.startsWith("idp=")).getOrElse("?")).toSet
      assert(satDirs.size == 8,
        s"the saturated shape reads the whole store via the root, opened $satDirs")
    } finally Dedup.rmdir(new java.io.File(dir))
  }

  test("stored-corpus overload == in-memory overload == inline; a store " +
      "describing a DIFFERENT corpus is refused via the shared receipt") {
    val idx = Files.createTempDirectory("cstore-idx").toString
    val cdir = Files.createTempDirectory("cstore-c").toString
    val stale = Files.createTempDirectory("cstore-stale").toString
    try {
      Dedup.writeBandIndex(corpusDocs, idx, k = 3, nBuckets = 16)
      CorpusStore.write(corpusDocs, cdir, nParts = 8)
      def pairs(df: DataFrame) = df.select(col("i"), col("j"), col("jaccard"))
        .as[(Long, Long, Double)].collect().toSeq.sorted
      val stored = pairs(Dedup.incrementalNearDupsIndexed(
        incrementDocs, idx, cdir, threshold = 0.5))
      val inMem = pairs(Dedup.incrementalNearDupsIndexed(
        incrementDocs, idx, corpusDocs, threshold = 0.5))
      val inline = pairs(Dedup.incrementalNearDups(
        incrementDocs, Dedup.bandIndex(corpusDocs, k = 3), corpusDocs,
        k = 3, threshold = 0.5))
      assert(stored == inline && inMem == inline,
        s"stored=$stored inMem=$inMem inline=$inline")
      assert(stored.exists { case (i, j, _) => i == 101L && j == 1L },
        s"the planted near-copy must be caught: $stored")
      // a stale text store (one doc missing) must loud-stop, not
      // silently verify-reject candidates whose text it cannot fetch
      CorpusStore.write(corpusDocs.filter(col("doc_id") =!= 1L), stale,
        nParts = 8)
      val e = intercept[IllegalArgumentException] {
        Dedup.incrementalNearDupsIndexed(incrementDocs, idx, stale,
          threshold = 0.5)
      }
      assert(e.getMessage.contains("different corpora"), e.getMessage)
    } finally {
      Dedup.rmdir(new java.io.File(idx))
      Dedup.rmdir(new java.io.File(cdir))
      Dedup.rmdir(new java.io.File(stale))
    }
  }

  test("append folds docs in (fetch + receipt track the union); torn " +
      "appends and legacy dirs are refused actionably") {
    val dir = Files.createTempDirectory("cstore-app").toString
    val legacy = Files.createTempDirectory("cstore-legacy").toString
    try {
      CorpusStore.write(corpusDocs.filter(col("doc_id") <= 10L), dir,
        nParts = 8)
      CorpusStore.append(corpusDocs.filter(col("doc_id") > 10L), dir)
      CorpusStore.verifyReceipt(corpusDocs, dir)
      val got = CorpusStore.fetchDocs(spark, dir, Seq(5L, 15L)).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(got == Seq((5L, tail(5)), (15L, tail(15))), s"$got")
      // swapped text must trip the receipt even with counts equal
      val tampered = corpusDocs.withColumn("text",
        when(col("doc_id") === 3L, lit("swapped")).otherwise(col("text")))
      val eRec = intercept[IllegalArgumentException] {
        CorpusStore.verifyReceipt(tampered, dir)
      }
      assert(eRec.getMessage.contains("corpus-of-record mismatch"), eRec.getMessage)
      // crash between row append and meta rewrite: rows beyond meta
      Seq((900L, tail(900))).toDF("doc_id", "text")
        .withColumn("idp", pmod(col("doc_id"), lit(8L)).cast("int"))
        .write.mode("append").partitionBy("idp")
        .parquet(s"$dir/docs_${CorpusStore.Layout}")
      val eTorn = intercept[IllegalArgumentException] {
        CorpusStore.append(incrementDocs, dir)
      }
      assert(eTorn.getMessage.contains("torn append") &&
        eTorn.getMessage.contains("CorpusStore.write"), eTorn.getMessage)
      // legacy: a raw unpartitioned (doc_id, text) dump
      corpusDocs.write.mode("overwrite").parquet(legacy)
      val eLegacy = intercept[IllegalArgumentException] {
        CorpusStore.fetchDocs(spark, legacy, Seq(1L))
      }
      assert(eLegacy.getMessage.contains("CorpusStore.write"), eLegacy.getMessage)
    } finally {
      Dedup.rmdir(new java.io.File(dir))
      Dedup.rmdir(new java.io.File(legacy))
    }
  }

  test("an empty corpus round-trips: zero partition dirs, valid meta, " +
      "appends and fetches work") {
    val dir = Files.createTempDirectory("cstore-empty").toString
    try {
      CorpusStore.write(corpusDocs.limit(0), dir, nParts = 8)
      val m = CorpusStore.readMeta(spark, dir)
      assert(m.nDocs == 0L && m.nFiles == 0L, s"$m")
      assert(CorpusStore.fetchDocs(spark, dir, Seq(1L)).collect().isEmpty)
      assert(CorpusStore.read(spark, dir).collect().isEmpty)
      // the store grows from empty via the normal append path
      CorpusStore.append(corpusDocs.limit(2), dir)
      assert(CorpusStore.fetchDocs(spark, dir, Seq(1L, 2L)).count() == 2L)
      CorpusStore.verifyReceipt(corpusDocs.limit(2), dir)
    } finally Dedup.rmdir(new java.io.File(dir))
  }

  test("compact rewrites only fragmented partitions, row-preserving, " +
      "and restores the per-file doc_id sort") {
    val dir = Files.createTempDirectory("cstore-compact").toString
    try {
      CorpusStore.write(corpusDocs, dir, nParts = 4)
      // five appends land five extra files in idp=1 (ids ≡ 1 mod 4)
      for (i <- 0 until 5)
        CorpusStore.append(Seq((201L + 4 * i, tail(300 + i)))
          .toDF("doc_id", "text"), dir)
      val base = new java.io.File(dir, s"docs_${CorpusStore.Layout}")
      def files(p: String): Seq[java.io.File] =
        new java.io.File(base, p).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
      assert(files("idp=1").size > 4,
        s"fixture must fragment idp=1, got ${files("idp=1").size}")
      val untouchedBefore = files("idp=0").map(_.getName).toSet
      val metaBefore = CorpusStore.readMeta(spark, dir)
      val done = CorpusStore.compact(spark, dir, maxFilesPerPart = 4)
      assert(done == Seq(1L), s"only the drifted partition compacts: $done")
      assert(files("idp=1").size == 1)
      assert(files("idp=0").map(_.getName).toSet == untouchedBefore,
        "partitions within bound must be untouched")
      // rows + receipt unchanged (the listing manifest legitimately
      // changes — the rewrite moved bytes — and compact re-records it,
      // so a post-compact append must validate cleanly)
      val metaAfter = CorpusStore.readMeta(spark, dir)
      assert((metaAfter.nParts, metaAfter.nDocs, metaAfter.docXor) ==
        ((metaBefore.nParts, metaBefore.nDocs, metaBefore.docXor)))
      CorpusStore.append(Seq((500L, tail(500))).toDF("doc_id", "text"), dir)
      CorpusStore.verifyReceipt(CorpusStore.read(spark, dir), dir)
      val got = CorpusStore.fetchDocs(spark, dir, Seq(1L, 5L, 201L, 213L))
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(got == Seq(1L, 5L, 201L, 213L), s"$got")
      val ids = spark.read.parquet(files("idp=1").head.getAbsolutePath)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"compacted file must be doc_id-sorted: $ids")
    } finally Dedup.rmdir(new java.io.File(dir))
  }
}
