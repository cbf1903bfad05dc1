package graft.ct

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

/** End-to-end: log list admission → micro-batch ingest → store → queries
  * (SURVEY §5.2 "End-to-end"). Entries come from an injected fixture source
  * (zero-egress stand-in for get-sth/get-entries). */
class IngestorEndToEndSpec extends graft.SparkSpec {

  private val logListJson =
    """{"operators":[{"logs":[
      |{"description":"Usable Log","url":"https://l1.example/","state":{"usable":{}},
      | "temporal_interval":{"start_inclusive":"2023-01-01T00:00:00Z","end_exclusive":"2025-01-01T00:00:00Z"}},
      |{"description":"Frozen Log","url":"https://l2.example","state":{"frozen":{}}},
      |{"description":"Retired Log","url":"https://l3.example","state":{"retired":{}}},
      |{"description":"Future Log","url":"https://l4.example","state":{"usable":{}},
      | "temporal_interval":{"start_inclusive":"2030-01-01T00:00:00Z","end_exclusive":"2031-01-01T00:00:00Z"}}
      |]}]}""".stripMargin

  test("admission: retired and out-of-interval logs dropped (S2)") {
    val logs = LogList.parse(logListJson, Instant.parse("2024-01-15T00:00:00Z"))
    assert(logs.map(_.name) == Seq("Usable Log", "Frozen Log"))
    assert(logs.map(_.state) == Seq("usable", "frozen"))
    assert(logs.head.url == "https://l1.example") // trailing slash stripped
  }

  test("micro-batch ingest to store, offset resume, frozen-log boundedness") {
    val logs = LogList.parse(logListJson, Instant.parse("2024-01-15T00:00:00Z"))
    val store = Files.createTempDirectory("store").toString
    val offsets = new Ingestor.FileOffsets(Files.createTempDirectory("off").toString)

    // fixture source: every log has 3 entries, each the same fixture cert
    val source = new Ingestor.EntrySource {
      var fetches = 0
      def treeSize(log: LogList.CtLog): Long = 3L
      def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] = {
        fetches += 1
        (start to end).map(i => RawEntry(log.name, i, Fixtures.leafB64()))
      }
    }

    val t0 = Timestamp.valueOf("2024-01-15 00:00:00")
    val n = Ingestor.runOnce(spark, logs, source, store, offsets, t0, batchSize = 2)
    assert(n > 0)
    // offsets advanced to tree size → second run is a no-op (bounded, S8)
    val before = source.fetches
    assert(Ingestor.runOnce(spark, logs, source, store, offsets, t0, batchSize = 2) == 0L)
    assert(source.fetches == before)

    // stored rows are queryable through the endpoint shapes
    val table = CertStore.read(spark, store)
    val subs = CtQueries.subdomains(table, "example.com").collect()
    assert(subs.map(_.getAs[String]("domain")).contains("www.example.com"))
    assert(CertStore.sizeBytes(spark, store) > 0)
  }

  test("runOnceParallel lands the same rows as the serial loop, resumes " +
      "offsets, and replays idempotently through the dedupe merge") {
    val logs = LogList.parse(logListJson, Instant.parse("2024-01-15T00:00:00Z"))
    // unique cert per (log, index): no cross-entry dedup, so the two
    // loop shapes must land IDENTICAL row sets, not merely
    // dedupe-equivalent ones
    def src() = new Ingestor.EntrySource {
      def treeSize(log: LogList.CtLog): Long = 5L
      def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] =
        (start to end).map { i =>
          val tag = (if (log.name == "Usable Log") 0L else 1L) * 1000L + i
          RawEntry(log.name, i, Fixtures.leafB64(DemoFixture.uniqueDer(tag)))
        }
    }
    val t0 = Timestamp.valueOf("2024-01-15 00:00:00")
    def rowsOf(store: String): Seq[Seq[Any]] =
      CertStore.read(spark, store).select(CertDomain.columns.map(
        org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq.map {
          case s: Seq[_] => s.mkString("|"); case x => x
        }).toSeq.sortBy(_.mkString(","))
    val serialStore = Files.createTempDirectory("store-ser").toString
    val serialOff = new Ingestor.FileOffsets(
      Files.createTempDirectory("off-ser").toString)
    val nSerial = Ingestor.runOnce(spark, logs, src(), serialStore,
      serialOff, t0, batchSize = 2)
    val parStore = Files.createTempDirectory("store-par").toString
    val parOffDir = Files.createTempDirectory("off-par").toString
    val parOff = new Ingestor.FileOffsets(parOffDir)
    val nPar = Ingestor.runOnceParallel(spark, logs, src(), parStore,
      parOff, t0, batchSize = 2, fetchThreads = 4,
      maxBatchesPerLogPerRound = 2)
    assert(nPar == nSerial, s"parallel appended $nPar vs serial $nSerial")
    assert(rowsOf(parStore) == rowsOf(serialStore),
      "the two loop shapes must land identical row sets")
    // offsets advanced to tree size → second run is a bounded no-op (S8)
    assert(Ingestor.runOnceParallel(spark, logs, src(), parStore, parOff,
      t0, batchSize = 2) == 0L)
    // at-least-once replay: rewind offsets, re-ingest, dedupe-merge —
    // the FINAL (compacted) table equals the never-replayed one's
    logs.foreach(lg => parOff.write(lg.name.replace(' ', '_'), 0L))
    assert(Ingestor.runOnceParallel(spark, logs, src(), parStore, parOff,
      t0, batchSize = 2) == nPar)
    val parFinal = Files.createTempDirectory("store-par-final").toString
    val serFinal = Files.createTempDirectory("store-ser-final").toString
    CertStore.compact(spark, parStore, parFinal, dedupe = true)
    CertStore.compact(spark, serialStore, serFinal, dedupe = true)
    assert(rowsOf(parFinal) == rowsOf(serFinal),
      "replay + dedupe merge must be idempotent")
    // runLoop(parallel = true) drains through the batched shape and
    // terminates on the frozen/caught-up logs like the serial loop
    val loopStore = Files.createTempDirectory("store-loop").toString
    val loopOff = new Ingestor.FileOffsets(
      Files.createTempDirectory("off-loop").toString)
    val nLoop = Ingestor.runLoop(spark, logs, src(), loopStore, loopOff,
      () => t0, rounds = 2, pollMs = 1L, batchSize = 2, parallel = true)
    assert(nLoop == nSerial, s"loop appended $nLoop vs $nSerial")
    assert(rowsOf(loopStore) == rowsOf(serialStore))
  }

  test("runOnceParallel advances offsets by entries ACTUALLY returned: a " +
      "short get-entries return (RFC 6962 truncation) skips nothing — the " +
      "next fetch resumes at the true high-watermark") {
    val logs = LogList.parse(logListJson, Instant.parse("2024-01-15T00:00:00Z"))
    val t0 = Timestamp.valueOf("2024-01-15 00:00:00")
    def entryAt(log: LogList.CtLog, i: Long): RawEntry = {
      val tag = (if (log.name == "Usable Log") 0L else 1L) * 1000L + i
      RawEntry(log.name, i, Fixtures.leafB64(DemoFixture.uniqueDer(tag)))
    }
    // well-behaved source → the reference row set
    def fullSrc() = new Ingestor.EntrySource {
      def treeSize(log: LogList.CtLog): Long = 5L
      def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] =
        (start to end).map(entryAt(log, _))
    }
    // truncating source: EVERY fetch returns only the first entry of the
    // requested range — the old `idx = end + 1` advance would skip the
    // tail of every batch forever (2 of 5 entries per log surviving)
    val shortFetches = new java.util.concurrent.atomic.AtomicLong(0L)
    def shortSrc() = new Ingestor.EntrySource {
      def treeSize(log: LogList.CtLog): Long = 5L
      def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] = {
        shortFetches.incrementAndGet()
        Seq(entryAt(log, start))
      }
    }
    def rowsOf(store: String): Seq[Seq[Any]] =
      CertStore.read(spark, store).select(CertDomain.columns.map(
        org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq.map {
          case s: Seq[_] => s.mkString("|"); case x => x
        }).toSeq.sortBy(_.mkString(","))
    val refStore = Files.createTempDirectory("store-ref").toString
    val nRef = Ingestor.runOnceParallel(spark, logs, fullSrc(), refStore,
      new Ingestor.FileOffsets(Files.createTempDirectory("off-ref").toString),
      t0, batchSize = 2)
    val store = Files.createTempDirectory("store-short").toString
    val off = new Ingestor.FileOffsets(
      Files.createTempDirectory("off-short").toString)
    val n = Ingestor.runOnceParallel(spark, logs, shortSrc(), store, off,
      t0, batchSize = 2)
    assert(n == nRef, s"short returns lost rows: $n vs $nRef")
    assert(rowsOf(store) == rowsOf(refStore),
      "every truncated tail must be re-fetched, none skipped")
    logs.foreach { lg =>
      assert(off.read(lg.name.replace(' ', '_')) == 5L,
        s"${lg.name} offset must reach tree size")
    }
    // and the drained state is a bounded no-op
    assert(Ingestor.runOnceParallel(spark, logs, shortSrc(), store, off,
      t0, batchSize = 2) == 0L)
  }

  test("ingest evaluates the X.509 parse exactly once per entry") {
    val logs = LogList.parse(logListJson, Instant.parse("2024-01-15T00:00:00Z"))
    val store = Files.createTempDirectory("store-once").toString
    val offsets = new Ingestor.FileOffsets(Files.createTempDirectory("off-once").toString)
    val source = new Ingestor.EntrySource {
      def treeSize(log: LogList.CtLog): Long = 3L
      def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] =
        (start to end).map(i => RawEntry(log.name, i, Fixtures.leafB64()))
    }
    CertParser.parseInvocations.set(0)
    val n = Ingestor.runOnce(spark, logs, source, store, offsets,
      Timestamp.valueOf("2024-01-15 00:00:00"), batchSize = 2)
    assert(n > 0)
    // 2 admitted logs × 3 entries: a count() action after the write would
    // double this to 12 by re-running the whole parse pipeline.
    assert(CertParser.parseInvocations.get() == 6L,
      s"expected 6 parse calls, got ${CertParser.parseInvocations.get()}")
  }
}
