package graft.ct

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Timestamp
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Micro-batch ingestion driver — the v0 port of the reference's per-log
  * worker loop (/root/reference/ingestion/ct_ingestor.py:150-230, SURVEY
  * §7.2 step 5).
  *
  * The reference runs one OS process per CT log (S6, :240-247); here each
  * log's batch becomes a Spark job whose parse/explode work is distributed
  * across executors, so per-log parallelism comes from tasks instead of
  * processes. Offsets are plain per-log files written AFTER a successful
  * append (S5, :169,224-226) — at-least-once, made effectively exactly-once
  * by the pipeline's (fingerprint, domain) dedup plus `Compact.dedupe`.
  *
  * The entry source is pluggable: production would wrap the CT HTTP API
  * (get-sth/get-entries, S3-S4); tests inject fixtures (zero-egress).
  *
  * DEPLOYMENT ROUTING (measured ×1/×10/×100 backlog, local[32],
  * SCALE.md round 15): the serial loop lands 2.4-3.0k rows/s (reference
  * parity — one fetch at a time, driver-side); [[runOnceParallel]]
  * lands 16k/43k/39k rows/s (driver-pooled fetches, one union append
  * per round); the DSv2 source ([[StreamIngest]]) lands 14.7k/81k/74k
  * rows/s — ~2× the parallel loop from ×10 up, because its
  * partition-per-(log, range) fetches run ON EXECUTORS and scale with
  * the cluster instead of a driver pool. Deployments route through
  * [[StreamIngest]]: executor-side transport, checkpointed offsets
  * (exactly-once via the epoch-overwrite sink), and scheme-qualified
  * store/checkpoint roots pinned end-to-end (CtDsv2Spec's file:-scheme
  * lifecycle leg). The loops here remain the small-backlog/dev shapes
  * and the reference-parity baseline.
  */
object Ingestor {

  /** Reference BATCH_SIZE (ct_ingestor.py:25). NOTE: runOnce requests the
    * range [idx, idx + BatchSize] INCLUSIVE — BatchSize+1 = 513 entries per
    * get-entries call — faithfully reproducing the reference's off-by-one
    * (`end = min(idx + BATCH_SIZE, size - 1)`); kept for bug-parity. */
  val BatchSize = 512

  /** S3 + S4: tree size high-watermark and contiguous entry fetch.
    *
    * THREAD SAFETY IS PART OF THE CONTRACT (ADVICE r14):
    * [[runOnceParallel]] calls both methods concurrently from a bounded
    * pool, one thread per log — an implementation with shared mutable
    * state (a single connection, a reused buffer) must synchronize or
    * use per-thread resources, or concurrent fetches corrupt silently.
    * Fixture sources built on immutable maps are safe by construction.
    *
    * `fetchEntries` MAY return fewer entries than the requested range
    * (RFC 6962 §4.6 allows servers to truncate); see the two run loops
    * for how each handles short returns. */
  trait EntrySource {
    def treeSize(log: LogList.CtLog): Long
    def fetchEntries(log: LogList.CtLog, start: Long, endInclusive: Long): Seq[RawEntry]
  }

  final class FileOffsets(dir: String) {
    Files.createDirectories(Paths.get(dir))
    private def p(name: String) = Paths.get(dir, s"${name.replace(' ', '_')}.offset")
    def read(name: String): Long =
      if (Files.exists(p(name))) new String(Files.readAllBytes(p(name))).trim.toLong else 0L
    def write(name: String, v: Long): Unit =
      Files.write(p(name), v.toString.getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
  }

  /** Ingest every admitted log up to its current tree size (frozen-log
    * boundedness S8: a frozen log is done once the offset reaches the
    * size; usable logs are re-polled by the caller on its trigger cadence).
    * Returns rows appended. `ingestTs` parameterizes the wall clock.
    *
    * BUG-PARITY NOTE: like the reference (ct_ingestor.py:223 — `idx =
    * end + 1` unconditionally), a SHORT get-entries return (RFC 6962
    * lets servers truncate) skips the unreturned tail of the range.
    * [[runOnceParallel]] — our own shape, no parity debt — advances by
    * entries actually returned instead. */
  def runOnce(spark: SparkSession, logs: Seq[LogList.CtLog], source: EntrySource,
      storePath: String, offsets: FileOffsets, ingestTs: Timestamp,
      batchSize: Int = BatchSize): Long = {
    import spark.implicits._
    var appended = 0L
    logs.foreach { lg =>
      val name = lg.name.replace(' ', '_')
      var idx = offsets.read(name)
      val size = source.treeSize(lg)
      while (idx < size) {
        val end = math.min(idx + batchSize, size - 1)
        val entries = source.fetchEntries(lg, idx, end)
        if (entries.nonEmpty) {
          // Observation piggybacks the row count on the write action itself,
          // so the parse→explode→dedup pipeline (incl. the X.509 UDF) runs
          // exactly once per batch — a separate df.count() would re-run it.
          val obs = new org.apache.spark.sql.Observation()
          val df = IngestPipeline.certDomains(spark.createDataset(entries), ingestTs)
            .observe(obs, org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("rows"))
          CertStore.write(df, storePath, SaveMode.Append)
          appended += obs.get("rows").asInstanceOf[Long]
        }
        idx = end + 1
        offsets.write(name, idx) // after successful append → at-least-once
      }
    }
    appended
  }

  /** [[runOnce]] with the reference's per-log parallelism (S6,
    * ct_ingestor.py:240-247 — one OS process per CT log) re-expressed
    * for Spark's execution model. Two costs dominate the serial loop at
    * n logs: the network-bound get-entries fetches run one at a time,
    * and every 513-entry batch pays a full Spark job + store append (a
    * repartition + file commit). Here the per-log fetches run
    * concurrently on a bounded driver pool (exactly the work the
    * reference's processes parallelize) and each ROUND lands as ONE
    * batched job + ONE append over the union of every log's fetched
    * entries — parse parallelism comes from the local rows fanning out
    * to defaultParallelism tasks, and the per-batch job/commit overhead
    * amortizes across all logs (measured: the ct_ingest throughput
    * probe, SCALE.md). Concurrent per-log APPENDS would be wrong, not
    * just slower: parquet path appends share the job-attempt
    * `_temporary` staging dir, so simultaneous writers race each
    * other's cleanup — the union write is the safe parallel shape
    * without a table format's transaction log.
    *
    * Offsets advance only AFTER the round's single append succeeds
    * (same at-least-once + dedup-idempotence contract as [[runOnce]]; a
    * crash mid-round replays every log's current round).
    * `maxBatchesPerLogPerRound` bounds driver-held entries per round
    * (logs × that × batch rows); a deployment whose fetch volume
    * outgrows the driver routes through the DSv2 source instead, whose
    * partition-per-log fetch runs on executors
    * (source/CtMicroBatchSource.scala:172). */
  def runOnceParallel(spark: SparkSession, logs: Seq[LogList.CtLog],
      source: EntrySource, storePath: String, offsets: FileOffsets,
      ingestTs: Timestamp, batchSize: Int = BatchSize,
      fetchThreads: Int = 8, maxBatchesPerLogPerRound: Int = 8): Long = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    require(fetchThreads >= 1 && maxBatchesPerLogPerRound >= 1,
      s"fetchThreads/maxBatchesPerLogPerRound must be >= 1, got " +
        s"$fetchThreads/$maxBatchesPerLogPerRound")
    var appended = 0L
    var progress = true
    while (progress) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(fetchThreads, math.max(1, logs.size)))
      // (log name, offset before, offset after, this round's entries)
      val fetched: Seq[(String, Long, Long, Seq[RawEntry])] = try {
        pool.invokeAll(logs.map { lg =>
          new java.util.concurrent.Callable[(String, Long, Long, Seq[RawEntry])] {
            def call(): (String, Long, Long, Seq[RawEntry]) = {
              val name = lg.name.replace(' ', '_')
              val start = offsets.read(name)
              var idx = start
              val size = source.treeSize(lg)
              val buf = scala.collection.mutable.ArrayBuffer.empty[RawEntry]
              var b = 0
              var short = false
              while (idx < size && b < maxBatchesPerLogPerRound && !short) {
                val end = math.min(idx + batchSize, size - 1)
                val requested = end - idx + 1
                val got = source.fetchEntries(lg, idx, end)
                require(got.length <= requested,
                  s"$name returned ${got.length} entries for range " +
                    s"[$idx,$end] — more than requested; refusing to " +
                    "guess offsets over a non-contiguous source")
                buf ++= got
                // advance by entries ACTUALLY returned (round-14 verdict
                // ask #4): RFC 6962 lets a server truncate the range, and
                // `idx = end + 1` on a short return would silently skip
                // the unreturned tail forever (the reference's own bug,
                // kept only in the serial bug-parity loop). A short (or
                // empty) return ends this log's round; the next round
                // re-fetches from the true high-watermark.
                idx += got.length
                short = got.length < requested
                b += 1
              }
              (name, start, idx, buf.toSeq)
            }
          }
        }.asJava).asScala.map(_.get()).toSeq // rethrows any fetch failure
      } finally pool.shutdown()
      val entries = fetched.flatMap(_._4)
      if (entries.nonEmpty) {
        val obs = new org.apache.spark.sql.Observation()
        val df = IngestPipeline.certDomains(spark.createDataset(entries), ingestTs)
          .observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows"))
        CertStore.write(df, storePath, SaveMode.Append)
        appended += obs.get("rows").asInstanceOf[Long]
      }
      // offsets after the successful append → at-least-once per log
      fetched.foreach { case (name, start, idx, _) =>
        if (idx != start) offsets.write(name, idx)
      }
      progress = fetched.exists(_._4.nonEmpty)
    }
    appended
  }

  /** Long-running ingest loop with the reference's error handling (S9,
    * ct_ingestor.py:228-230): any failure logs, sleeps `backoffMs`, and
    * retries; when caught up, sleeps `pollMs` before re-polling (S7).
    * `rounds` bounds the loop for tests/bounded deployments
    * (Int.MaxValue = run forever). */
  def runLoop(spark: SparkSession, logs: Seq[LogList.CtLog], source: EntrySource,
      storePath: String, offsets: FileOffsets, ingestTs: () => Timestamp,
      rounds: Int, pollMs: Long = 5000L, backoffMs: Long = 5000L,
      batchSize: Int = BatchSize, parallel: Boolean = false): Long = {
    var total = 0L
    var i = 0
    while (i < rounds) {
      try {
        // `parallel` routes each drain through [[runOnceParallel]] —
        // the measured 14× throughput shape; the serial default stays
        // reference-faithful (one batch, one job, one append at a time)
        val n =
          if (parallel) runOnceParallel(spark, logs, source, storePath,
            offsets, ingestTs(), batchSize)
          else runOnce(spark, logs, source, storePath, offsets, ingestTs(),
            batchSize)
        total += n
        if (n == 0 && i < rounds - 1) Thread.sleep(pollMs)
      } catch {
        case e: Throwable =>
          System.err.println(s"[ingest] error: ${e.getMessage}; retrying in ${backoffMs}ms")
          if (i < rounds - 1) Thread.sleep(backoffMs)
      }
      i += 1
    }
    total
  }
}
