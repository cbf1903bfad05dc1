package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the PERSISTED band index (round-12 verdict ask #1): the at-rest
  * `bidx1` layout — bands bucketed by pmod(band_val, n_buckets), k and
  * the bucket count carried in meta from day one — and the contracts
  * around it:
  *
  *  - the bucket-pruned incremental query is row-identical to the
  *    unpruned inline path (candidates match on band_val EQUALITY, so
  *    every matching corpus row shares the increment's bucket set);
  *  - append folds the increment in (query-equal to an index rebuilt
  *    over the union) and preserves the index's own k/bucket count;
  *  - torn appends are detected (rows ≠ meta) with a rebuild message;
  *  - a legacy unversioned band dump is refused actionably;
  *  - the corpus-of-record receipt catches missing/swapped/altered
  *    corpora, sharing [[Dedup.docReceipt]]'s semantics with the
  *    shingle artifact (round-12 verdict ask #6).
  */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  // near-dup fixture: docs 1/2 and 5/6 are ≥0.5-jaccard pairs; the
  // increment holds one near-copy of doc 1 (caught), one fresh text
  // (must verify-reject even if it band-collides) — disjoint ids
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

  private def collectPairs(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("i"), col("j"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq.sorted

  test("bucket-pruned incremental query equals the unpruned inline path " +
      "row-for-row, and the layout really is pmod-bucketed at rest") {
    val dir = Files.createTempDirectory("bandidx").toString
    try {
      Dedup.writeBandIndex(corpusDocs, dir, k = 3, nBuckets = 16)
      val m = Dedup.readBandIndexMeta(spark, dir)
      assert(m.k == 3 && m.nBuckets == 16 && m.nDocs == 20L, s"$m")
      // partition dirs carry the pmod-16 bucket, all under 16
      val buckets = new java.io.File(dir, s"bands_${Dedup.BandIndexLayout}")
        .listFiles().filter(_.getName.startsWith("bvb="))
        .map(_.getName.stripPrefix("bvb=").toInt)
      assert(buckets.nonEmpty && buckets.max < 16,
        buckets.toSeq.sorted.mkString(","))
      val indexed = collectPairs(Dedup.incrementalNearDupsIndexed(
        incrementDocs, dir, corpusDocs, threshold = 0.5))
      val inline = collectPairs(Dedup.incrementalNearDups(
        incrementDocs, Dedup.bandIndex(corpusDocs, k = 3), corpusDocs,
        k = 3, threshold = 0.5))
      assert(indexed == inline, s"pruned vs inline:\n$indexed\n$inline")
      assert(indexed.exists { case (i, j, _) => i == 101L && j == 1L },
        s"the planted near-copy must be caught: $indexed")
      assert(indexed.forall { case (i, _, _) => i != 102L },
        "fresh text must be verify-rejected")
    } finally Dedup.rmdir(new java.io.File(dir))
  }

  test("append folds the increment in: query-equal to a rebuild over the " +
      "union, meta accounting and receipt track the full history") {
    val dir = Files.createTempDirectory("bandidx-app").toString
    val rebuilt = Files.createTempDirectory("bandidx-reb").toString
    try {
      Dedup.writeBandIndex(corpusDocs, dir, k = 3, nBuckets = 16)
      val m0 = Dedup.readBandIndexMeta(spark, dir)
      Dedup.appendBandIndex(incrementDocs, dir)
      val m1 = Dedup.readBandIndexMeta(spark, dir)
      assert(m1.k == 3 && m1.nBuckets == 16,
        "append must preserve the index's own k and bucket count")
      assert(m1.nDocs == m0.nDocs + 3 && m1.nBandRows > m0.nBandRows, s"$m1")
      val grown = corpusDocs.unionByName(incrementDocs)
      Dedup.writeBandIndex(grown, rebuilt, k = 3, nBuckets = 16)
      // identical accounting (count, rows, receipt, guard); the listing
      // manifests legitimately DIFFER — an appended index carries more,
      // smaller files than a fresh build until compaction
      val mReb = Dedup.readBandIndexMeta(spark, rebuilt)
      assert(mReb.copy(nFiles = m1.nFiles, nBytes = m1.nBytes) == m1,
        "appended meta must equal the rebuilt index's (count, rows, receipt)")
      // a second increment queried against the appended index equals the
      // same query against the rebuilt one
      val inc2 = Seq((201L, tail(5) + " note")).toDF("doc_id", "text")
      val viaAppend = collectPairs(
        Dedup.incrementalNearDupsIndexed(inc2, dir, grown, threshold = 0.5))
      val viaRebuild = collectPairs(
        Dedup.incrementalNearDupsIndexed(inc2, rebuilt, grown, threshold = 0.5))
      assert(viaAppend == viaRebuild && viaAppend.nonEmpty,
        s"$viaAppend vs $viaRebuild")
      // receipt: the true grown corpus passes, a tampered one is caught
      Dedup.verifyBandIndexReceipt(grown, dir)
      val eBad = intercept[IllegalArgumentException] {
        Dedup.verifyBandIndexReceipt(grown.withColumn("text",
          when(col("doc_id") === 101L, lit("tampered")).otherwise(col("text"))),
          dir)
      }
      assert(eBad.getMessage.contains("corpus-of-record mismatch"),
        eBad.getMessage)
    } finally {
      Dedup.rmdir(new java.io.File(dir))
      Dedup.rmdir(new java.io.File(rebuilt))
    }
  }

  test("compactBandIndex rewrites only fragmented buckets in place: " +
      "query-identical, meta/receipt untouched, appends keep working") {
    val dir = Files.createTempDirectory("bandidx-compact").toString
    try {
      Dedup.writeBandIndex(corpusDocs, dir, k = 3, nBuckets = 4)
      // five appends fragment the (wide-touching) buckets past the bound
      for (a <- 0 until 5)
        Dedup.appendBandIndex(
          Seq((500L + a, tail(1000 + a))).toDF("doc_id", "text"), dir)
      val bands = new java.io.File(dir, s"bands_${Dedup.BandIndexLayout}")
      def files(b: java.io.File): Int = b.listFiles().count(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      val bucketDirs = bands.listFiles().filter(_.getName.startsWith("bvb=")).toSeq
      assert(bucketDirs.exists(files(_) > 2),
        "fixture must fragment at least one bucket past the bound")
      val mBefore = Dedup.readBandIndexMeta(spark, dir)
      val grown = corpusDocs.unionByName(
        (0 until 5).map(a => (500L + a, tail(1000 + a))).toDF("doc_id", "text"))
      val before = collectPairs(Dedup.incrementalNearDupsIndexed(
        incrementDocs, dir, grown, threshold = 0.5))
      val compacted = Dedup.compactBandIndex(spark, dir, maxFilesPerBucket = 2)
      assert(compacted.nonEmpty, "at least one bucket must compact")
      assert(bucketDirs.forall(files(_) <= 2),
        "every bucket must be within the bound after compaction")
      // rows/receipt/k/buckets/guard untouched; the listing manifest
      // legitimately changes (the rewrite moved bytes) and compaction
      // re-records it so the post-compact append below validates
      val mAfter = Dedup.readBandIndexMeta(spark, dir)
      assert(mAfter.copy(nFiles = mBefore.nFiles, nBytes = mBefore.nBytes)
          == mBefore,
        "compaction must not touch meta beyond the listing manifest")
      assert((mAfter.nFiles, mAfter.nBytes) != ((mBefore.nFiles, mBefore.nBytes)),
        "the compacted layout must re-record its manifest")
      val after = collectPairs(Dedup.incrementalNearDupsIndexed(
        incrementDocs, dir, grown, threshold = 0.5))
      assert(after == before && after.nonEmpty,
        s"compaction must be query-invisible:\n$before\n$after")
      // the torn-append validation still holds and appends still work
      Dedup.appendBandIndex(Seq((600L, tail(2000))).toDF("doc_id", "text"), dir)
      Dedup.verifyBandIndexReceipt(grown.unionByName(
        Seq((600L, tail(2000))).toDF("doc_id", "text")), dir)
    } finally Dedup.rmdir(new java.io.File(dir))
  }

  test("compactBandIndex(refreshHotBands=true) re-derives the hot sidecar " +
      "from the at-rest band rows, equal to a cold rebuild's at the same " +
      "cutoff, and bumps meta — arming a previously-unguarded index") {
    val dir = Files.createTempDirectory("bandidx-refresh").toString
    val rebuilt = Files.createTempDirectory("bandidx-refresh-reb").toString
    try {
      // 10 boilerplate-identical docs at build (df=10 ≤ the auto cutoff
      // of 16 → no band is hot), then 30 more appended (df=40 > 16):
      // the corpus drifted hot while the snapshot guard stayed off
      val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
      def docs(ids: Range) = ids.map(i => (i.toLong, boiler)).toDF("doc_id", "text")
      Dedup.writeBandIndex(docs(0 until 10), dir, k = 3, nBuckets = 8)
      Dedup.appendBandIndex(docs(10 until 40), dir)
      assert(Dedup.readBandIndexMeta(spark, dir).hotBandCutoff == -1L)
      Dedup.compactBandIndex(spark, dir, refreshHotBands = true)
      val m = Dedup.readBandIndexMeta(spark, dir)
      assert(m.hotBandCutoff == Dedup.autoDfCutoffFor(40L),
        s"meta must record the refreshed cutoff, got ${m.hotBandCutoff}")
      // the refreshed sidecar == a cold rebuild's at the same cutoff
      Dedup.writeBandIndex(docs(0 until 40), rebuilt, k = 3, nBuckets = 8,
        hotBandCutoff = Some(Dedup.autoDfCutoffFor(40L)))
      def hotSet(d: String): Set[(Int, Long)] =
        spark.read.parquet(s"$d/hot_bands_${Dedup.BandIndexLayout}")
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(hotSet(dir).nonEmpty, "the drifted-hot bands must be captured")
      assert(hotSet(dir) == hotSet(rebuilt),
        s"refreshed=${hotSet(dir)} rebuilt=${hotSet(rebuilt)}")
      // the armed guard actually guards: an increment carrying only the
      // boilerplate generates no candidates (recall deviation by design)
      val inc = Seq((1000L, boiler)).toDF("doc_id", "text")
      assert(Dedup.incrementalNearDupsIndexed(inc, dir, docs(0 until 40),
        threshold = 0.5).isEmpty)
    } finally {
      Dedup.rmdir(new java.io.File(dir))
      Dedup.rmdir(new java.io.File(rebuilt))
    }
  }

  test("fresh builds AND appends write (band_val, doc_id)-sorted bucket " +
      "files — row-group min/max skipping needs no compaction first") {
    val dir = Files.createTempDirectory("bandidx-sort").toString
    try {
      Dedup.writeBandIndex(corpusDocs, dir, k = 3, nBuckets = 4)
      Dedup.appendBandIndex(incrementDocs, dir)
      val bands = new java.io.File(dir, s"bands_${Dedup.BandIndexLayout}")
      val files = bands.listFiles().filter(_.getName.startsWith("bvb="))
        .flatMap(_.listFiles())
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      // nBuckets=4 → several buckets share a shuffle task, and the append
      // adds a second file per touched bucket: every file must still be a
      // sorted run on its own
      assert(files.length > 4, s"fixture must span buckets+appends: ${files.length}")
      for (f <- files) {
        val rows = spark.read.parquet(f.getAbsolutePath)
          .select(col("band_val"), col("doc_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(rows == rows.sorted,
          s"bucket file ${f.getParentFile.getName}/${f.getName} not " +
            s"(band_val, doc_id)-sorted: $rows")
      }
    } finally Dedup.rmdir(new java.io.File(dir))
  }

  test("backfill fallbacks forced via the session-conf caps: the " +
      "distributed band-collect and candidate-collect shapes stay " +
      "row-identical to the inline path") {
    val dir = Files.createTempDirectory("bandidx-caps").toString
    val cdir = Files.createTempDirectory("bandidx-caps-c").toString
    try {
      Dedup.writeBandIndex(corpusDocs, dir, k = 3, nBuckets = 16)
      CorpusStore.write(corpusDocs, cdir, nParts = 8)
      val inline = collectPairs(Dedup.incrementalNearDups(
        incrementDocs, Dedup.bandIndex(corpusDocs, k = 3), corpusDocs,
        k = 3, threshold = 0.5))
      // cap = 1: every fixture lookup overflows, so the indexed path
      // takes the distributed incBands + saturated root read, and the
      // stored path's verify falls back to the store's full read —
      // the backfill regime, on a fixture small enough to assert on
      spark.conf.set("graft.dedup.incrementBandCollectMaxRows", "1")
      spark.conf.set("graft.dedup.candidatePairCollectMaxRows", "1")
      try {
        val indexed = collectPairs(Dedup.incrementalNearDupsIndexed(
          incrementDocs, dir, corpusDocs, threshold = 0.5))
        val stored = collectPairs(Dedup.incrementalNearDupsIndexed(
          incrementDocs, dir, cdir, threshold = 0.5))
        assert(indexed == inline, s"band-cap fallback:\n$indexed\n$inline")
        assert(stored == inline, s"pair-cap fallback:\n$stored\n$inline")
      } finally {
        spark.conf.unset("graft.dedup.incrementBandCollectMaxRows")
        spark.conf.unset("graft.dedup.candidatePairCollectMaxRows")
      }
      // third knob (round-14 verdict ask #3): fetchDocsMaxIds = 0 forces
      // the stored verify's candidate-text fetch onto the broadcast
      // semi-join shape while the pair collect stays on the point path —
      // still row-identical to inline
      spark.conf.set("graft.dedup.fetchDocsMaxIds", "0")
      try {
        val storedJoin = collectPairs(Dedup.incrementalNearDupsIndexed(
          incrementDocs, dir, cdir, threshold = 0.5))
        assert(storedJoin == inline,
          s"fetchDocs-cap fallback:\n$storedJoin\n$inline")
      } finally spark.conf.unset("graft.dedup.fetchDocsMaxIds")
    } finally {
      Dedup.rmdir(new java.io.File(dir))
      Dedup.rmdir(new java.io.File(cdir))
    }
  }

  test("torn append is detected (rows beyond meta) and a legacy unversioned " +
      "dump is refused with the rebuild message") {
    val dir = Files.createTempDirectory("bandidx-torn").toString
    val legacy = Files.createTempDirectory("bandidx-legacy").toString
    try {
      Dedup.writeBandIndex(corpusDocs, dir, k = 3, nBuckets = 16)
      // simulate a crash AFTER the band append, BEFORE the meta rewrite:
      // append bands manually without touching meta
      Dedup.bandIndex(Seq((900L, tail(900))).toDF("doc_id", "text"), k = 3)
        .withColumn("bvb", pmod(col("band_val"), lit(16L)).cast("int"))
        .write.mode("append").partitionBy("bvb")
        .parquet(s"$dir/bands_${Dedup.BandIndexLayout}")
      val eTorn = intercept[IllegalArgumentException] {
        Dedup.appendBandIndex(incrementDocs, dir)
      }
      assert(eTorn.getMessage.contains("torn append") &&
        eTorn.getMessage.contains("writeBandIndex"), eTorn.getMessage)
      // legacy: a raw unbucketed band-row dump (the pre-bidx1 shape)
      Dedup.bandIndex(corpusDocs, k = 3).write.mode("overwrite").parquet(legacy)
      val eLegacy = intercept[IllegalArgumentException] {
        Dedup.incrementalNearDupsIndexed(incrementDocs, legacy, corpusDocs)
      }
      assert(eLegacy.getMessage.contains("writeBandIndex"), eLegacy.getMessage)
    } finally {
      Dedup.rmdir(new java.io.File(dir))
      Dedup.rmdir(new java.io.File(legacy))
    }
  }

  test("hot-band guard: boilerplate-hot bands are excluded from candidate " +
      "generation (documented recall deviation pinned BOTH ways), content " +
      "near-dups still surface, and the sidecar rides meta through appends") {
    // 12 identical boilerplate docs: identical texts → identical
    // signatures → every band of that text has df = 12
    val boiler = "terms of service apply to all pages " + tail(7)
    val corpus = ((1L to 12L).map(id => (id, boiler)) ++
      Seq((20L, tail(3)), (21L, tail(4)))).toDF("doc_id", "text")
    val inc = Seq(
      (101L, boiler),             // collides ONLY via hot bands
      (102L, tail(3) + " note")). // content near-dup of doc 20
      toDF("doc_id", "text")
    val guarded = Files.createTempDirectory("bandidx-hot").toString
    val unguarded = Files.createTempDirectory("bandidx-nohot").toString
    try {
      Dedup.writeBandIndex(corpus, guarded, k = 3, nBuckets = 16,
        hotBandCutoff = Some(8L))
      Dedup.writeBandIndex(corpus, unguarded, k = 3, nBuckets = 16)
      assert(Dedup.readBandIndexMeta(spark, guarded).hotBandCutoff == 8L)
      assert(Dedup.readBandIndexMeta(spark, unguarded).hotBandCutoff == -1L)
      val got = collectPairs(Dedup.incrementalNearDupsIndexed(
        inc, guarded, corpus, threshold = 0.5))
      // the deviation, pinned: doc 101's only collision route is the
      // hot boilerplate bands — not surfaced despite jaccard 1.0
      assert(got.forall(_._1 != 101L), s"hot-only collisions must drop: $got")
      // the content near-dup still surfaces, exact-jaccard verified
      assert(got.exists { case (i, j, _) => i == 102L && j == 20L }, s"$got")
      // ...and the unguarded twin DOES surface the boilerplate pairs
      // (the contrast that proves the guard is the thing dropping them)
      val raw = collectPairs(Dedup.incrementalNearDupsIndexed(
        inc, unguarded, corpus, threshold = 0.5))
      assert(raw.count { case (i, _, jac) => i == 101L && jac == 1.0 } == 12,
        s"unguarded must surface all 12 boilerplate dups: $raw")
      // append preserves the guard config (snapshot-fixed sidecar)
      Dedup.appendBandIndex(Seq((200L, tail(900))).toDF("doc_id", "text"),
        guarded)
      assert(Dedup.readBandIndexMeta(spark, guarded).hotBandCutoff == 8L)
      val after = collectPairs(Dedup.incrementalNearDupsIndexed(
        inc, guarded, corpus.unionByName(
          Seq((200L, tail(900))).toDF("doc_id", "text")), threshold = 0.5))
      assert(after == got, s"$after vs $got")
      // the guard must compose with the backfill FALLBACK too: cap
      // forced to 1 → distributed increment bands, sidecar applied as
      // a broadcast anti-join instead of the driver-side filter
      spark.conf.set("graft.dedup.incrementBandCollectMaxRows", "1")
      try {
        val fb = collectPairs(Dedup.incrementalNearDupsIndexed(
          inc, guarded, corpus.unionByName(
            Seq((200L, tail(900))).toDF("doc_id", "text")), threshold = 0.5))
        assert(fb == got, s"guarded fallback diverged: $fb vs $got")
      } finally spark.conf.unset("graft.dedup.incrementBandCollectMaxRows")
    } finally {
      Dedup.rmdir(new java.io.File(guarded))
      Dedup.rmdir(new java.io.File(unguarded))
    }
  }

  test("an empty increment yields an empty result without reading any bucket") {
    val dir = Files.createTempDirectory("bandidx-empty").toString
    try {
      Dedup.writeBandIndex(corpusDocs, dir, k = 3, nBuckets = 16)
      val out = Dedup.incrementalNearDupsIndexed(
        corpusDocs.limit(0), dir, corpusDocs, threshold = 0.5)
      assert(out.count() == 0L)
    } finally Dedup.rmdir(new java.io.File(dir))
  }

  test("a band-less corpus (every doc under k tokens) round-trips: zero " +
      "partition dirs, valid meta, appends and lookups work") {
    // the explicit-schema read exists for exactly this: partitionBy over
    // zero rows writes no bvb= dirs, and schema inference over the empty
    // dir would throw where the declared schema reads empty
    val shorties = Seq((1L, "a b"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("bandidx-bandless").toString
    try {
      Dedup.writeBandIndex(shorties, dir, k = 3, nBuckets = 16)
      val m = Dedup.readBandIndexMeta(spark, dir)
      assert(m.nDocs == 3L && m.nBandRows == 0L, s"$m")
      // lookups against the empty index return empty, not throw
      assert(Dedup.incrementalNearDupsIndexed(
        incrementDocs, dir, shorties, threshold = 0.5).count() == 0L)
      // an append of REAL docs brings the index to life
      Dedup.appendBandIndex(corpusDocs.withColumn("doc_id",
        col("doc_id") + 500L), dir)
      val inc2 = Seq((901L, tail(1) + " note")).toDF("doc_id", "text")
      val grown = shorties.unionByName(
        corpusDocs.withColumn("doc_id", col("doc_id") + 500L))
      val got = collectPairs(Dedup.incrementalNearDupsIndexed(
        inc2, dir, grown, threshold = 0.5))
      assert(got.exists { case (i, j, _) => i == 901L && j == 501L }, s"$got")
    } finally Dedup.rmdir(new java.io.File(dir))
  }
}
