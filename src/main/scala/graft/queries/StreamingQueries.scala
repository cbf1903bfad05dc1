package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStreams

/** Declared queries proving stream/batch agreement (SURVEY §2.10): the
  * streaming operator runs as a REAL StreamingQuery (micro-batch engine,
  * checkpoint, watermark, append mode) via Trigger.AvailableNow, and the
  * DuckDB oracle is its deterministic batch equivalent — the exactly-once
  * unified-semantics claim of the engine, hash-checked.
  *
  * Determinism: AvailableNow with no per-trigger source limits reads all
  * available files in one batch, so no row can be late-dropped mid-run;
  * the final no-data batch then flushes every window closed by the
  * terminal watermark (max event time, floored to ms, minus the delay).
  * The oracle reproduces exactly that emission rule.
  */
object StreamingQueries {

  /** Per-run streaming checkpoint directory — pure scratch (deleted on
    * termination), so it lives on tmpfs when available: the state store's
    * delta/snapshot files and the offset/commit WALs are rewritten every
    * micro-batch, and a gate/bench run makes no durability claim for them
    * — a production deployment points checkpointLocation at durable
    * shared storage and pays its real latencies there. The parquet STATE
    * tables of the foreachBatch queries (the maintained view itself) stay
    * on disk: they are the production artifact, not scratch. */
  private def scratchCkpt(name: String): String = {
    // guard against container realities before leaving tmpdir: a default
    // Docker /dev/shm is 64 MB (and can be mounted read-only) — a
    // checkpoint that lands there would abort streams that ran fine on
    // disk, so require writability and comfortable headroom
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= (1L << 30))
        shm
      else new java.io.File(System.getProperty("java.io.tmpdir"))
    new java.io.File(base, name).getAbsolutePath
  }

  /** Drives a streaming aggregation to completion: append mode into a
    * uniquely-named memory sink with a fresh checkpoint, AvailableNow
    * trigger, blocking until the terminal no-data batch has flushed
    * every window/session closed by the final watermark.
    *
    * The stream runs on its OWN `spark.newSession()` (shared
    * SparkContext, isolated SQLConf + catalog): a streaming query pins
    * its state partitioning from `spark.sql.shuffle.partitions` when the
    * micro-batch thread plans batch 0 — asynchronously, AFTER `.start()`
    * returns — so mutating the caller's session conf and restoring it
    * would be a coin flip for this query AND visible to every
    * concurrently-running one. Per-query session = no global mutation,
    * no race. Every state partition is a state-store instance paying
    * open/commit/snapshot per micro-batch; at the gate's data sizes that
    * per-store overhead dominates the actual state work, so the harness
    * sizes its fresh-checkpoint queries at 8 state partitions (measured
    * ~2x on the 7-query set at sf0.1). Production sizing is the normal
    * knob: set shuffle partitions on the stream's session before first
    * start, ~2-4x cores (SCALE.md).
    */
  private def runToCompletion(spark: SparkSession, prefix: String,
      build: SparkSession => DataFrame, order: Seq[String],
      mode: String = "append"): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val name = prefix + "_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = scratchCkpt(name)
    val q = build(s).writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    // the memory sink holds the rows; the checkpoint has served its
    // purpose once the query terminates (or fails) — don't litter tmpdir
    try q.awaitTermination()
    finally graft.operators.Dedup.rmdir(new java.io.File(ckpt))
    // Memory-sink contents are driver-resident BY DESIGN (that's the sink's
    // contract), so collecting them adds no new scale hazard — and it
    // moves the rows onto the CALLER's session before the stream session
    // (and its uniquely-named temp view) is dropped, instead of
    // accumulating one leaked in-memory table per run in a long-lived
    // session (bench warmup+timed passes, correctness reruns).
    val sunk = s.table(name)
    val rows = java.util.Arrays.asList(sunk.collect(): _*)
    val out = spark.createDataFrame(rows, sunk.schema)
    s.catalog.dropTempView(name)
    out.orderBy(order.map(col): _*)
  }

  /** EventStreams.windowedStats (10 min tumbling windows, 30 min
    * watermark) driven to completion over the events table. */
  def streamWindowStats(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "swstats",
      s => EventStreams.windowedStats(EventStreams.readTestdataEvents(s, dir)),
      Seq("win_start", "event_type"))

  /** EventStreams.slidingStats (20 min windows hopping every 10 min,
    * 30 min watermark) driven to completion: every event lands in exactly
    * two overlapping windows, so a tumbling-window pass-off can't go
    * green — the doubled per-window membership is what the oracle pins. */
  def streamSliding(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "sslide",
      s => EventStreams.slidingStats(EventStreams.readTestdataEvents(s, dir)),
      Seq("win_start", "event_type"))

  /** EventStreams.sessionStats (30 min gap sessions, 30 min watermark)
    * driven to completion over the events table. */
  def streamSessions(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "ssess",
      s => EventStreams.sessionStats(EventStreams.readTestdataEvents(s, dir)),
      Seq("user_id", "s_start"))

  /** EventStreams.sessionConversions driven to completion: q75's
    * session-grain conversion question answered by the stream — closed
    * sessions only, each carrying its converted flag. */
  def streamSessionConv(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "ssconv",
      s => EventStreams.sessionConversions(EventStreams.readTestdataEvents(s, dir)),
      Seq("user_id", "s_start"))

  /** EventStreams.dedupedEvents over the events table UNIONED WITH
    * ITSELF — every event arrives exactly twice, so a vacuous pass-through
    * can't go green: the dedup must emit each event exactly once (both
    * copies are identical, so which "wins" is immaterial). Proves the
    * at-least-once → effectively-exactly-once claim under the hash gate. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "sdedup",
      s => EventStreams.dedupedEvents(
        EventStreams.readTestdataEvents(s, dir)
          .union(EventStreams.readTestdataEvents(s, dir))),
      Seq("event_id"))

  /** EventStreams.runningUserAggs (mapGroupsWithState custom state,
    * update mode) driven to completion: the terminal per-user state must
    * equal the plain batch aggregate. */
  def streamUserAggs(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "suagg",
      s => EventStreams.runningUserAggs(
        s, EventStreams.readTestdataEvents(s, dir)).toDF(),
      Seq("user_id"), mode = "update")

  /** EventStreams.eventPairsWithin — views within the 4 hours before
    * each click, per user — driven to completion. Inner stream-stream
    * interval joins emit each pair the moment both sides have arrived
    * (the watermark only expires state), so the batch range join over the
    * same data is a bit-exact oracle. The 4 h lookback is sized to the
    * testdata's event density: 10 min would pair almost nothing at the
    * gate's SFs and leave the oracle near-vacuous. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "sjoin",
      s => EventStreams.eventPairsWithin(
        EventStreams.readTestdataEvents(s, dir),
        "click", "view", lookback = "4 hours"),
      Seq("a_id", "b_id"))

  /** Streaming incremental view maintenance: the events table is split
    * into four parquet files (untimed fixture), streamed back one file
    * per micro-batch (maxFilesPerTrigger=1 under AvailableNow), and each
    * batch folds its AggState increment into the parquet-persisted view
    * via foreachBatch — history is never rescanned, exactly the
    * production refresh loop. The oracle is q51's full recompute: four
    * successive delta-merges must converge to the from-scratch aggregate
    * bit-for-bit. The final view is day×type-bounded (≤ a few hundred
    * rows), so collecting it to cut the scratch-dir lifetime is the
    * memory-sink treatment, not a scale hazard. */
  /** Content fingerprint of a source parquet path (file or directory):
    * names + sizes + mtimes. The split caches below key on THIS, not just
    * the path — a driver-side testdata regeneration (which has happened
    * mid-round) must invalidate the cache, or the fixtures would silently
    * replay stale data into the stream gates. */
  private[queries] def sourceStamp(path: String): String = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val sig = walk(root).map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(path + "#" + sig))
  }

  /** Build-once guard for the content-stamped /tmp artifacts (split
    * fixtures, the components artifact): `build` writes into a
    * PROCESS-UNIQUE staging directory which is then atomically renamed
    * into place. A plain `_SUCCESS`-existence check around an in-place
    * `mode(overwrite)` write races across JVMs — bench and verify share
    * /tmp, and a reader can list the directory mid-rewrite (after
    * overwrite has deleted `_SUCCESS`, before the new files land). With
    * the rename, a reader sees either nothing or the complete artifact;
    * the loser of a concurrent build race discards its staging copy.
    * `_SUCCESS` at the artifact root still marks completeness (the cheap
    * existence check; the atomic rename is what makes it trustworthy —
    * it can never name a half-written directory). */
  private val stagingSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def buildOnce(dirPath: String)(build: String => Unit): String = {
    val dir = new java.io.File(dirPath)
    def complete = new java.io.File(dir, "_SUCCESS").exists
    if (!complete) {
      // staging names are unique per ATTEMPT: pid separates JVMs, the
      // atomic counter separates same-JVM threads (nanoTime alone can
      // tie on coarse clocks), nanoTime separates pid-reuse across boots
      val staged = new java.io.File(dirPath + "_staging_" +
        ProcessHandle.current().pid() + "_" + stagingSeq.incrementAndGet() +
        "_" + System.nanoTime())
      // a failed build must not litter /tmp: without cleanup every retry
      // would strand another partial copy
      try build(staged.getAbsolutePath)
      catch { case e: Throwable =>
        graft.operators.Dedup.rmdir(staged); throw e
      }
      val marker = new java.io.File(staged, "_SUCCESS")
      if (!marker.exists) {
        java.nio.file.Files.createFile(marker.toPath); ()
      }
      def moveInto(src: java.io.File, dst: java.io.File): Boolean =
        try {
          java.nio.file.Files.move(src.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch { case _: java.nio.file.FileSystemException => false }
      // Commit = atomic move WITHOUT clearing the target first: a
      // marker-present target is always a COMPLETE artifact (the marker is
      // created in staging, so it becomes visible only via the atomic
      // move) and must never be deleted — a concurrent JVM may be
      // mid-scan of it. Move failure means either a concurrent winner
      // (marker present: keep theirs, drop ours) or a stale markerless
      // leftover from a crashed writer. The leftover is EVICTED by atomic
      // rename — never rmdir'd in place: a complete artifact could land
      // at the path between our `complete` probe and the cleanup, and a
      // rename keeps it intact (inspect the evicted dir's marker, restore
      // if it turns out complete) where a delete would yank it from under
      // a concurrent reader mid-scan.
      if (!moveInto(staged, dir)) {
        if (!complete) {
          val evictedDir = new java.io.File(dirPath + "_stale_" +
            ProcessHandle.current().pid() + "_" + stagingSeq.incrementAndGet())
          val evicted = moveInto(dir, evictedDir)
          if (evicted && new java.io.File(evictedDir, "_SUCCESS").exists) {
            // raced a winner: what we evicted is a COMPLETE artifact —
            // restore it (or, if a third writer published meanwhile,
            // drop it: same content stamp, equal by construction)
            if (!moveInto(evictedDir, dir))
              graft.operators.Dedup.rmdir(evictedDir)
            graft.operators.Dedup.rmdir(staged)
          } else {
            if (evicted) graft.operators.Dedup.rmdir(evictedDir) // true stale
            if (!moveInto(staged, dir)) {
              val won = complete
              graft.operators.Dedup.rmdir(staged)
              if (!won)
                throw new java.io.IOException(
                  s"buildOnce could not publish $dirPath (target blocked, no winner)")
            }
          }
        } else graft.operators.Dedup.rmdir(staged)
      }
    }
    dirPath
  }

  /** THE slice/boundary arithmetic of the 4-slice time-ordered replay
    * split, shared between [[eventsSplitByTime]]'s routing and
    * HostileGen's watermark-boundary planting. One definition on
    * purpose (ADVICE r8): two private copies of the slice-width /
    * boundary math could drift, and a drifted HostileGen would plant
    * rows that no longer land exactly on sliceMax(i) − 30 min — the
    * odd-id boundary rule would silently no-op and the hostile gate
    * would quietly stop exercising the cross-file ts-tie case. */
  private[graft] object ReplaySlicing {
    val NSlices = 4
    /** The 30-min watermark every replayed stream uses (µs). */
    val WatermarkUs = 1800000000L

    /** Slicing state of an events frame: span min, slice width, and each
      * slice's raw max(ts) µs — everything both users derive from. */
    private[graft] case class SliceSpec(mn: Long, width: Long,
        sliceMax: Map[Int, Long]) {
      /** Per-row slice id over unix_micros(ts) — integer range tests,
        * not float division: a µs value at an exact slice edge must
        * never round across it. */
      def sliceExpr: org.apache.spark.sql.Column = {
        val us = unix_micros(col("ts"))
        when(us < mn + width, 0)
          .when(us < mn + 2 * width, 1)
          .when(us < mn + 3 * width, 2)
          .otherwise(3).cast("int")
      }
      /** The watermark-boundary µs slice i will establish (its raw max
        * − 30 min); None for an absent or degenerate (< 30 min of span)
        * slice. The degenerate filter is behavior-neutral for routing —
        * a boundary below the slice's start can match no row OF that
        * slice — and is what lets planting skip slices that cannot
        * carry an interior boundary row. */
      def boundaryUs(i: Int): Option[Long] =
        sliceMax.get(i).map(_ - WatermarkUs).filter(_ >= mn + i.toLong * width)
    }

    /** Derive the slicing state (two bounded driver-side aggregates:
      * the 2-value span row and the ≤ NSlices per-slice maxima). */
    def of(ev: DataFrame): SliceSpec = {
      val us = unix_micros(col("ts"))
      val Array(mnRow) = ev.agg(min(us), max(us)).collect()
      val (mn, mx) = (mnRow.getLong(0), mnRow.getLong(1))
      val width = (mx - mn) / NSlices + 1
      val pre = SliceSpec(mn, width, Map.empty)
      val sliceMax = ev.groupBy(pre.sliceExpr.as("sl"))
        .agg(max(us).as("mx")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      pre.copy(sliceMax = sliceMax)
    }
  }

  /** The events table split into four untimed parquet files, built once
    * per (sfDir, content stamp) — the replayable fixture for
    * file-per-micro-batch streaming maintenance queries. */
  private def eventsSplit(spark: SparkSession, dir: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    val splitDir = new java.io.File(tmp,
      "graft_mv_split_" + sourceStamp(s"$dir/events.parquet")).getAbsolutePath
    buildOnce(splitDir) { staged =>
      graft.Tables.events(spark, dir).repartition(4)
        .write.mode("overwrite").parquet(staged)
    }
  }

  /** The events table split into four EVENT-TIME-ORDERED parquet files
    * (slice i = i-th quarter of the [min ts, max ts] span), named and
    * mtime-stamped so the streaming file source replays them oldest
    * slice first — the fixture for MULTI-batch watermark semantics.
    * Time-ordered delivery is what a log-structured source (Kafka,
    * CDC tail, CT logs) actually provides, and it is what lets the
    * watermark advance monotonically without classifying whole slices
    * as late: slice k's min ts ≥ slice k−1's max ts > slice k−1's
    * watermark.
    *
    * ADVERSARIAL boundary rule: a row whose ts is EXACTLY its slice's
    * max(ts) − 30 min — i.e. exactly the watermark the slice will
    * establish — and whose event_id is ODD is delivered one file LATE
    * (moved into the next slice). That is the worst lateness the
    * watermark contract admits: during slice k+1's batch the watermark
    * is at most maxRaw(k) − 30 min (less for the type/value-filtered
    * streams), so the moved row is never STRICTLY behind it and must be
    * admitted, merged into the still-buffered per-key arrivals, and
    * folded in (ts, event_id) order — including ts TIES that straddle
    * the file boundary when the even-id tie partner stayed on time
    * (pinned by BufferedReplaySpec's boundary case; HostileGen plants
    * exactly these rows). On data with no exact-boundary odd-id row the
    * rule no-ops and the split is the plain time slicing. */
  private[graft] def eventsSplitByTimeForProfile(spark: SparkSession,
      dir: String): String = eventsSplitByTime(spark, dir)

  private def eventsSplitByTime(spark: SparkSession, dir: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    // _v2: the boundary rule changed the fixture's content contract —
    // a cached pre-rule split must not be reused for the hostile gate
    val splitDir = new java.io.File(tmp,
      "graft_replay_split_v2_" + sourceStamp(s"$dir/events.parquet")).getAbsolutePath
    buildOnce(splitDir) { stagedPath =>
      val ev = graft.Tables.events(spark, dir)
      val us = unix_micros(col("ts"))
      val spec = ReplaySlicing.of(ev)
      val baseSlice = spec.sliceExpr
      val boundaryOf = (0 until ReplaySlicing.NSlices)
        .foldLeft(lit(Long.MinValue)) { (acc, i) =>
          spec.boundaryUs(i).map(b => when(baseSlice === i, lit(b))
            .otherwise(acc)).getOrElse(acc)
        }
      val dest = baseSlice + when(us === boundaryOf &&
        col("event_id") % 2 === 1 && baseSlice < 3, 1).otherwise(0)
      val staged = new java.io.File(stagedPath)
      (0 until 4).foreach { i =>
        ev.filter(dest === i)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$staged/work/slice$i")
      }
      (0 until 4).foreach { i =>
        val part = new java.io.File(s"$staged/work/slice$i").listFiles
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(staged, f"slice-$i%04d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        // the file source orders same-mtime files by path, but make the
        // replay order explicit anyway: strictly increasing mtimes
        dst.setLastModified(1700000000000L + i * 60000L)
        ()
      }
      graft.operators.Dedup.rmdir(new java.io.File(staged, "work"))
    }
  }

  /** Embeddings table split into 4 files so a file-per-trigger stream
    * replays the corpus as 4 micro-batches (the embeddings analog of
    * [[eventsSplit]]; routing is arrival-order-independent, so no time
    * slicing is needed). */
  private def embsSplit(spark: SparkSession, dir: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    val splitDir = new java.io.File(tmp,
      "graft_emb_split_" + sourceStamp(s"$dir/embeddings.parquet")).getAbsolutePath
    buildOnce(splitDir) { staged =>
      graft.Tables.embeddings(spark, dir).repartition(4)
        .write.mode("overwrite").parquet(staged)
    }
  }

  /** Streaming maintenance of the IVF embedding store — the similarity
    * index's answer to stream_mv: each micro-batch (one file,
    * AvailableNow) routes its vectors to their LSH cells via
    * EmbeddingStore.append (deterministic routing, so arrival order is
    * immaterial), fragmented cells are reclustered once at the end, and
    * the probe over the incrementally-built store must be
    * indistinguishable from the one-shot store's — emb_knn_store's
    * oracle gates it verbatim. History is never rescanned: each append
    * touches only the arriving batch, recluster only the cells past the
    * compaction bound. (Production hardening note: a redelivered batch
    * would re-append its vectors; the exactly-once deployment stamps
    * appends with the batchId and skips committed ones, the AggState
    * fencing pattern — under AvailableNow with a fresh checkpoint each
    * batch delivers exactly once, which is what the gate exercises.) */
  def streamEmbStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.EmbeddingStore
    val tmp = System.getProperty("java.io.tmpdir")
    val splitDir = embsSplit(spark, dir)
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    val storePath = new java.io.File(tmp, s"graft_emb_stream_$runId").getAbsolutePath
    val ckpt = scratchCkpt(s"graft_emb_sckpt_$runId")
    val src = spark.readStream
      .schema(graft.Tables.embeddings(spark, dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // knob-sweep force (graft.Knobs): sidecar born with batch 0 and
        // auto-maintained by every append (hadIdx path), so the final
        // probe can resolve the query id through it
        if (batchId == 0L)
          EmbeddingStore.write(batch.toDF(), storePath, nPlanes = 4,
            idIndex = graft.Knobs.forced)
        else
          EmbeddingStore.append(batch.toDF(), storePath, nPlanes = 4)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally graft.operators.Dedup.rmdir(new java.io.File(ckpt))
    EmbeddingStore.recluster(spark, storePath, maxFilesPerCell = 2)
    val view = EmbeddingStore.knnProbe(spark, storePath, queryId = 0L, k = 10,
        nPlanes = 4, maxFlips = 1, directRead = graft.Knobs.forced)
      .select(col("vec_id"), col("label"),
        col("bucket").cast("long").as("bucket"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val rows = java.util.Arrays.asList(view.collect(): _*)
    graft.operators.Dedup.rmdir(new java.io.File(storePath))
    spark.createDataFrame(rows, view.schema)
      .orderBy(col("cos_sim").desc, col("vec_id"))
  }

  /** Documents table split into 4 files so a file-per-trigger stream
    * replays the corpus as 4 micro-batches (the documents analog of
    * [[eventsSplit]]). */
  private def docsSplit(spark: SparkSession, dir: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    val splitDir = new java.io.File(tmp,
      "graft_hh_split_" + sourceStamp(s"$dir/documents.parquet")).getAbsolutePath
    buildOnce(splitDir) { staged =>
      graft.Tables.documents(spark, dir).repartition(4)
        .write.mode("overwrite").parquet(staged)
    }
  }

  def streamMvMaintain(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggState
    val tmp = System.getProperty("java.io.tmpdir")
    val splitDir = eventsSplit(spark, dir)
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    val statePath = new java.io.File(tmp, s"graft_mv_stream_$runId").getAbsolutePath
    val ckpt = scratchCkpt(s"graft_mv_ckpt_$runId")
    val src = spark.readStream
      .schema(graft.Tables.events(spark, dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        AggState.maintainParquet(spark, statePath, batch.toDF(), batchId)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally graft.operators.Dedup.rmdir(new java.io.File(ckpt))
    val view = AggState.finish(AggState.readState(spark, statePath))
      .orderBy("day", "event_type")
    val rows = java.util.Arrays.asList(view.collect(): _*)
    graft.operators.Dedup.rmdir(new java.io.File(statePath))
    spark.createDataFrame(rows, view.schema)
      .orderBy("day", "event_type")
  }

  /** Streaming KMV sketch-state maintenance — the q52 HLL-union flow
    * with a sketch whose merge is DETERMINISTIC set algebra, so the
    * streamed state is gated hash-exact instead of within-tolerance:
    * each micro-batch (one file, AvailableNow) folds its per-day KMV
    * delta into the parquet-persisted sketch table via
    * `slice(array_sort(array_union(…)), 1, k)` — KMV union IS
    * k-smallest-of-merged, order-insensitive, so four incremental merges
    * must equal the one-shot batch sketch value-for-value, and the
    * DuckDB oracle rebuilds day sketches + estimates from scratch.
    * History is never rescanned; state is |days|·k longs. */
  def streamKmv(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.KmvSketch.kmvSketch
    import graft.functions.{TextFunctions => T}
    val kk = 64
    val tmp = System.getProperty("java.io.tmpdir")
    val splitDir = eventsSplit(spark, dir)
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    val statePath = new java.io.File(tmp, s"graft_kmv_stream_$runId").getAbsolutePath
    val ckpt = scratchCkpt(s"graft_kmv_ckpt_$runId")
    def mixed(c: org.apache.spark.sql.Column) =
      pmod(T.polyHash(c.cast("string")) * lit(1103515245L) + lit(12345L),
        lit(1000000007L))
    val src = spark.readStream
      .schema(graft.Tables.events(spark, dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val delta = batch.toDF()
          .select(to_date(col("ts")).as("day"), mixed(col("user_id")).as("h"))
          .groupBy(col("day")).agg(kmvSketch(col("h"), kk).as("sk"))
        // versioned snapshot dirs + pointer swap (the AggState pattern):
        // the fold reads the committed snapshot and writes a NEW one, so
        // no materialize-before-overwrite pass is needed — the in-place
        // formulation paid a persist+count of the merged state per batch
        // solely to avoid overwriting the parquet it was lazily reading
        // (optimization round r16). REPLAY FENCE (ADVICE r16): KMV union
        // is idempotent set algebra, so RE-FOLDING a delta is harmless —
        // but a replay after _CURRENT was published and before the
        // streaming checkpoint committed would make committed == newDir,
        // and the fold would lazily read and Overwrite-write the SAME
        // parquet dir (the self-clobber the removed persist+count guard
        // prevented). The pointer says the state already includes this
        // batch; skip the fold instead of re-writing it.
        val committed = graft.operators.FsPointers.read(statePath, "_CURRENT")
        val newDir = s"b$batchId"
        if (!committed.contains(newDir)) {
        val merged = committed match {
          case Some(dir) =>
            spark.read.parquet(s"$statePath/$dir").as("s")
              .join(delta.as("d"), Seq("day"), "full")
              .select(col("day"),
                slice(array_sort(array_union(
                  coalesce(col("s.sk"), array().cast("array<long>")),
                  coalesce(col("d.sk"), array().cast("array<long>")))),
                  1, kk).as("sk"))
          case None => delta
        }
        merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$statePath/$newDir")
        graft.operators.FsPointers.publish(statePath, "_CURRENT", newDir)
        val keep = Set(newDir) ++ committed
        val rootP = new org.apache.hadoop.fs.Path(statePath)
        val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
        fs.listStatus(rootP)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("b") &&
            !keep.contains(st.getPath.getName))
          .foreach(st => graft.operators.FsPointers.deleteDir(st.getPath.toString))
        }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally graft.operators.Dedup.rmdir(new java.io.File(ckpt))
    val view = spark.read.parquet(statePath + "/" +
        graft.operators.FsPointers.read(statePath, "_CURRENT").getOrElse(
          sys.error(s"stream_kmv: no committed sketch state under $statePath")))
      .select(col("day"), size(col("sk")).cast("long").as("n_sk"),
        when(size(col("sk")) < kk, size(col("sk")).cast("double"))
          .otherwise(lit((kk - 1).toDouble) /
            (element_at(col("sk"), kk).cast("double") / lit(1000000007.0)))
          .as("est_users"))
      .orderBy("day")
    val rows = java.util.Arrays.asList(view.collect(): _*)
    graft.operators.Dedup.rmdir(new java.io.File(statePath))
    spark.createDataFrame(rows, view.schema).orderBy("day")
  }

  /** Streaming Misra-Gries heavy-hitter maintenance — BOUNDED state over
    * an UNBOUNDED key space, the constraint that separates streaming-at-
    * scale from batch: the token vocabulary grows with the corpus, but the
    * maintained state never exceeds `cap` counters. Each micro-batch (one
    * file, AvailableNow) folds its exact per-token counts into the
    * parquet-persisted sketch by union-sum, then MG-compresses: subtract
    * the (cap+1)th-largest merged count from every counter and drop the
    * non-positive — the Agarwal et al. mergeable-summaries merge, whose
    * cumulative undercount over ANY fold order is ≤ N/(cap+1). With
    * cap=128 counters and the declared n/64 threshold, every true heavy
    * hitter (count > N/64 > N/129 + undercount bound) is guaranteed to
    * survive all folds, so the closing candidates-only exact recount —
    * the same pass-2 contract as the batch operator — makes the declared
    * output EQUAL to `doc_heavy_hitters` independent of fold order, and
    * the oracle is that query's SQL verbatim. At 100 TB the recount
    * semi-join touches only |candidates| ≤ cap tokens; the maintained
    * state is ≤ cap rows regardless of corpus size. */
  def streamHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val cap = 128
    val k = 64L
    val tmp = System.getProperty("java.io.tmpdir")
    val splitDir = docsSplit(spark, dir)
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    val statePath = new java.io.File(tmp, s"graft_hh_stream_$runId").getAbsolutePath
    val ckpt = scratchCkpt(s"graft_hh_ckpt_$runId")
    val src = spark.readStream
      .schema(graft.Tables.documents(spark, dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val batchCounts = batch.toDF()
          .select(explode(T.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        // versioned snapshot dirs + pointer swap (the AggState pattern):
        // the fold writes a NEW snapshot instead of overwriting the one
        // it reads, so the filtered state needs no persist+count
        // materialization pass per batch (optimization round r16). The
        // merged frame stays persisted: it has two genuine consumers
        // (the decrement's top-k collect and the snapshot write).
        // MG-fold replay is absorbed by the error bound (the summary is
        // approximate-with-guarantee; the closing exact recount is what
        // the declared output rides), matching the prior shape.
        // REPLAY FENCE (ADVICE r16): if _CURRENT already points at this
        // batch's dir, the fold ran and published but the streaming
        // checkpoint didn't commit — re-folding would lazily read and
        // Overwrite-write the SAME parquet dir (self-clobber). The state
        // already includes this batch; skip the fold.
        val committed = graft.operators.FsPointers.read(statePath, "_CURRENT")
        val newDir = s"b$batchId"
        if (!committed.contains(newDir)) {
        val merged =
          (committed match {
             case Some(dir) =>
               spark.read.parquet(s"$statePath/$dir").unionByName(batchCounts)
                 .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))
             case None => batchCounts
           })
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the compression decrement: the (cap+1)th-largest merged count
        // (0 when ≤ cap counters survive the union) — a VALUE, not a row
        // choice, so ties cost no determinism
        val top = merged.orderBy(col("cnt").desc, col("token"))
          .limit(cap + 1).select(col("cnt")).collect()
        val d = if (top.length > cap) top.last.getLong(0) else 0L
        try merged.filter(col("cnt") > lit(d))
          .select(col("token"), (col("cnt") - lit(d)).as("cnt"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$statePath/$newDir")
        finally { merged.unpersist(false); () }
        graft.operators.FsPointers.publish(statePath, "_CURRENT", newDir)
        val keep = Set(newDir) ++ committed
        val rootP = new org.apache.hadoop.fs.Path(statePath)
        val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
        fs.listStatus(rootP)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("b") &&
            !keep.contains(st.getPath.getName))
          .foreach(st => graft.operators.FsPointers.deleteDir(st.getPath.toString))
        }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally graft.operators.Dedup.rmdir(new java.io.File(ckpt))
    val candidates = spark.read.parquet(statePath + "/" +
        graft.operators.FsPointers.read(statePath, "_CURRENT").getOrElse(
          sys.error(s"stream_heavy_hitters: no committed state under $statePath")))
      .select(col("token"))
    val tokens = graft.Tables.documents(spark, dir)
      .select(explode(T.tokens(col("text"))).as("token"))
    val total = tokens.agg(count(lit(1)).as("n"))
    val view = tokens
      .join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(k) > col("n"))
      .select(col("token"), col("cnt"), col("n"))
      .orderBy(col("cnt").desc, col("token"))
    val rows = java.util.Arrays.asList(view.collect(): _*)
    graft.operators.Dedup.rmdir(new java.io.File(statePath))
    spark.createDataFrame(rows, view.schema)
      .orderBy(col("cnt").desc, col("token"))
  }

  /** EventStreams.funnelStages (mapGroupsWithState windowFunnel DP,
    * update mode) driven to completion: the terminal per-user stage must
    * equal the batch funnel — the oracle IS q36_funnel's join-chain
    * formulation, shared verbatim. */
  def streamFunnel(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "sfunnel",
      s => EventStreams.funnelStages(
        s, EventStreams.readTestdataEvents(s, dir),
        Seq("view", "click", "purchase"), windowMicros = 21600000000L).toDF(),
      Seq("user_id"), mode = "update")

  /** EventStreams.seqCountStages (mapGroupsWithState sequence counting,
    * update mode) driven to completion: the terminal per-user count must
    * equal the batch operator — the oracle IS q46_seq_count's
    * recursive-CTE state machine, shared verbatim. */
  def streamSeqCount(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "ssqc",
      s => EventStreams.seqCountStages(
        s, EventStreams.readTestdataEvents(s, dir),
        Seq("view", "click", "purchase")).toDF(),
      Seq("user_id"), mode = "update")

  /** EventStreams.latestState (CDC latest-with-tombstone, update mode)
    * driven to completion: each user's terminal state is their
    * (ts, event_id)-max event, and users whose latest event is the
    * tombstone type ('error') are deleted — the streaming face of
    * operators.Merge, gated against the batch window-rank oracle. */
  def streamMerge(spark: SparkSession, dir: String): DataFrame = {
    // update-mode sink holds one row per key PER BATCH; reduce to the
    // terminal (ts, id)-max state first so the gate stays correct even
    // if the source is ever delivered across several micro-batches
    // (maxFilesPerTrigger, multi-file testdata) — only then drop deleted
    runToCompletion(spark, "smerge",
      s => EventStreams.latestState(
        s, EventStreams.readTestdataEvents(s, dir), tombstone = "error").toDF(),
      Seq("user_id"), mode = "update")
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts_us"), col("event_id"), col("event_type"),
          col("value"), col("deleted")),
        struct(col("ts_us"), col("event_id"))).as("s"))
      .filter(!col("s.deleted"))
      .select(col("user_id"), col("s.ts_us").as("ts_us"),
        col("s.event_id").as("event_id"),
        col("s.event_type").as("event_type"), col("s.value").as("value"))
      .orderBy(col("user_id"))
  }

  /** EventStreams.anomalies (flatMapGroupsWithState prefix z-test,
    * update mode) driven to completion: every flagged event depends only
    * on the immutable event-time prefix before it, so the batch window
    * oracle (prefix sums + the same exact-integer z-test in HUGEINT) is
    * bit-exact. */
  def streamAnomaly(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "sanom",
      s => EventStreams.anomalies(
        s, EventStreams.readTestdataEvents(s, dir)).toDF(),
      Seq("user_id", "event_id"), mode = "update")

  /** EventStreams.ewma (flatMapGroupsWithState bounded tap-list state,
    * update mode) driven to completion: dyadic weights make every
    * intermediate exact, so the streamed smoother must bit-equal the
    * batch lag-chain — q64_ewma's oracle gates it verbatim. */
  def streamEwma(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, "sewma",
      s => EventStreams.ewma(
        s, EventStreams.readTestdataEvents(s, dir)).toDF(),
      Seq("user_id", "event_id"), mode = "update")

  /** EventStreams.anomaliesBuffered driven across a FOUR-micro-batch
    * time-ordered replay (maxFilesPerTrigger=1 over [[eventsSplitByTime]]):
    * the multi-batch form of stream_anomaly, where no key can rely on one
    * AvailableNow iterator delivering all its events — the per-key
    * event-time buffer + watermark flush must reconstruct the exact
    * (ts, event_id) fold order across batch boundaries. The oracle is the
    * batch z-test restricted to ts ≤ the terminal watermark (events inside
    * the final 30 min horizon are still buffered at stream end, undecided
    * by design). */
  def streamAnomalyReplay(spark: SparkSession, dir: String): DataFrame = {
    val splitDir = eventsSplitByTime(spark, dir)
    runToCompletion(spark, "sanomr",
      s => EventStreams.anomaliesBuffered(
        s, replaySource(s, dir, splitDir)).toDF(),
      Seq("user_id", "event_id"), mode = "update")
  }

  /** The time-sliced four-file replay source shared by the *_replay
    * gates (schema probed from the batch loader; 5-column event shape). */
  private def replaySource(s: SparkSession, dir: String, splitDir: String) =
    s.readStream
      .schema(graft.Tables.events(s, dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

  /** EventStreams.ewmaBuffered across the four-micro-batch time-ordered
    * replay: each event's smoothed value emits only once the watermark
    * decides it, in (ts, event_id) fold order across batch boundaries —
    * the q64 lag-chain restricted to the terminal watermark gates it
    * bit-exact (dyadic weights, as for stream_ewma). */
  def streamEwmaReplay(spark: SparkSession, dir: String): DataFrame = {
    val splitDir = eventsSplitByTime(spark, dir)
    runToCompletion(spark, "sewmar",
      s => EventStreams.ewmaBuffered(s, replaySource(s, dir, splitDir)).toDF(),
      Seq("user_id", "event_id"), mode = "update")
  }

  /** EventStreams.funnelBuffered across the replay: terminal per-user
    * funnel stage over the DECIDED (ts ≤ terminal watermark) prefix.
    * Update-mode sinks append one row per (user, emitting batch); stage
    * counts only grow, so the terminal state is the per-user max. */
  def streamFunnelReplay(spark: SparkSession, dir: String): DataFrame = {
    val splitDir = eventsSplitByTime(spark, dir)
    runToCompletion(spark, "sfunr",
      s => EventStreams.funnelBuffered(s, replaySource(s, dir, splitDir),
        Seq("view", "click", "purchase"), windowMicros = 21600000000L).toDF(),
      Seq("user_id"), mode = "update")
      .groupBy(col("user_id"))
      .agg(max(col("funnel_stage")).as("funnel_stage"))
      .orderBy(col("user_id"))
  }

  /** EventStreams.seqCountBuffered across the replay: terminal per-user
    * completed-sequence count over the decided prefix, per-user max of
    * the update-mode emissions (counts only grow). */
  def streamSeqReplay(spark: SparkSession, dir: String): DataFrame = {
    val splitDir = eventsSplitByTime(spark, dir)
    runToCompletion(spark, "ssqr",
      s => EventStreams.seqCountBuffered(s, replaySource(s, dir, splitDir),
        Seq("view", "click", "purchase")).toDF(),
      Seq("user_id"), mode = "update")
      .groupBy(col("user_id"))
      .agg(max(col("n_matches")).as("n_matches"))
      .orderBy(col("user_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_emb_store" -> (streamEmbStore _),
    "stream_seq_replay" -> (streamSeqReplay _),
    "stream_funnel_replay" -> (streamFunnelReplay _),
    "stream_ewma_replay" -> (streamEwmaReplay _),
    "stream_anomaly_replay" -> (streamAnomalyReplay _),
    "stream_ewma" -> (streamEwma _),
    "stream_anomaly" -> (streamAnomaly _),
    "stream_merge" -> (streamMerge _),
    "stream_seq_count" -> (streamSeqCount _),
    "stream_funnel" -> (streamFunnel _),
    "stream_window_stats" -> (streamWindowStats _),
    "stream_sliding" -> (streamSliding _),
    "stream_mv" -> (streamMvMaintain _),
    "stream_kmv" -> (streamKmv _),
    "stream_heavy_hitters" -> (streamHeavyHitters _),
    "stream_sessions" -> (streamSessions _),
    "stream_session_conv" -> (streamSessionConv _),
    "stream_dedup" -> (streamDedup _),
    "stream_user_aggs" -> (streamUserAggs _),
    "stream_join" -> (streamJoin _))

  /** Batch equivalent of the append-mode streaming emission: tumbling
    * windows (epoch-aligned, as Spark's window()), emitted iff the window
    * closed under the terminal watermark. Spark tracks event-time stats in
    * milliseconds, hence the ms floor on max(ts). */
  def oracleSql: Map[String, String] = Map(
    // the batch 16-tap EWMA lag-chain, verbatim — dyadic weights make the
    // streamed fold and the window formulation bit-equal
    "stream_ewma" -> RelationalQueries.oracleSql("q64_ewma"),

    // prefix z-test in exact integer (HUGEINT) arithmetic — the cleared
    // form (x·n − s)² > 9·(n·ss − s²) the streaming state evaluates in
    // BigInt; the 1-PRECEDING frame IS the immutable prior-events prefix
    "stream_anomaly" ->
      """WITH c AS (SELECT user_id, event_id, ts, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |p AS (SELECT user_id, event_id, ts, value, cents,
        |    count(*) OVER w AS np,
        |    coalesce(sum(cents) OVER w, 0) AS s,
        |    coalesce(sum(cents * cents) OVER w, 0) AS ss
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |  np::BIGINT AS n_prior,
        |  CAST(s AS DOUBLE) / (100.0 * np) AS mean_prior
        |FROM p
        |WHERE np >= 8
        |  AND CAST(cents * np - s AS HUGEINT) * CAST(cents * np - s AS HUGEINT)
        |      > 9 * (CAST(np AS HUGEINT) * ss - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
        |ORDER BY user_id, event_id""".stripMargin,

    // the one-shot store's oracle verbatim: four incremental cell-routed
    // appends + recluster must be probe-indistinguishable from writing
    // the whole corpus at once
    "stream_emb_store" -> PipelineQueries.oracleSql("emb_knn_store"),

    // q64's lag-chain EWMA restricted to the terminal watermark: only
    // decided (ts ≤ wm) events are emitted, and a decided event's tap
    // prefix is all-decided by time order, so the restriction commutes
    // with the window
    "stream_ewma_replay" -> {
      val taps = 16
      // ::DOUBLE on every weight literal — see the q64 oracle note (bare
      // decimal literals are DECIMAL-typed in DuckDB)
      val num = (0 until taps).map(i =>
        s"coalesce(lag(cents, $i) OVER w * ${math.pow(0.5, i + 1)}::DOUBLE, 0)")
        .mkString(" + ")
      val den = (0 until taps).map(i =>
        s"CASE WHEN lag(cents, $i) OVER w IS NOT NULL THEN ${math.pow(0.5, i + 1)}::DOUBLE ELSE 0 END")
        .mkString(" + ")
      s"""WITH m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
         |             - INTERVAL 30 MINUTE AS wm FROM events WHERE value IS NOT NULL),
         |c AS (SELECT user_id, event_id, ts, value,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events, m WHERE ts <= wm AND value IS NOT NULL)
         |SELECT user_id, event_id, ts, value, ($num) / ($den) / 100.0 AS ewma
         |FROM c
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    // q36's join-chain funnel over the DECIDED prefix. The wm is computed
    // over the TYPE-FILTERED stream: although the engine writes
    // withWatermark BEFORE the filter, Catalyst pushes a predicate that
    // does not reference the event-time column below the
    // EventTimeWatermark operator, so the executed plan's watermark
    // tracks the filtered source — the oracle mirrors the plan, not the
    // source-code order. Users whose qualifying events are all undecided
    // are absent.
    "stream_funnel_replay" ->
      """WITH m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
        |             - INTERVAL 30 MINUTE AS wm FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |ff AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et FROM events, m
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts <= wm),
        |f1 AS (SELECT user_id, t AS t0 FROM ff WHERE et = 'view'),
        |f2 AS (SELECT a.user_id, a.t0, min(b.t) AS t2 FROM f1 a JOIN ff b
        |  ON a.user_id = b.user_id AND b.et = 'click'
        |  AND b.t >= a.t0 AND b.t <= a.t0 + 21600000000 GROUP BY 1, 2),
        |f3 AS (SELECT DISTINCT a.user_id FROM f2 a JOIN ff c
        |  ON a.user_id = c.user_id AND c.et = 'purchase'
        |  AND c.t >= a.t2 AND c.t <= a.t0 + 21600000000),
        |fu AS (SELECT DISTINCT user_id FROM ff)
        |SELECT fu.user_id,
        |  (CASE WHEN fu.user_id IN (SELECT user_id FROM f3) THEN 3
        |        WHEN fu.user_id IN (SELECT user_id FROM f2) THEN 2
        |        WHEN fu.user_id IN (SELECT user_id FROM f1) THEN 1
        |        ELSE 0 END)::BIGINT AS funnel_stage
        |FROM fu ORDER BY fu.user_id""".stripMargin,

    // q46's recursive-CTE state machine over the decided prefix
    // same filtered-stream wm as stream_funnel_replay (pushdown note there)
    "stream_seq_replay" ->
      """WITH RECURSIVE m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
        |             - INTERVAL 30 MINUTE AS wm FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |sq AS (SELECT user_id, epoch_us(ts) AS t,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 END AS s
        |  FROM events, m
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts <= wm),
        |sqo AS (SELECT user_id, s,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, s) AS rn FROM sq),
        |fold(user_id, rn, st, cnt) AS (
        |  SELECT user_id, 0, 0, 0::BIGINT FROM (SELECT DISTINCT user_id FROM sqo)
        |  UNION ALL
        |  SELECT f.user_id, f.rn + 1,
        |    CASE WHEN o.s = f.st + 1
        |         THEN CASE WHEN f.st + 1 = 3 THEN 0 ELSE f.st + 1 END
        |         ELSE f.st END,
        |    CASE WHEN o.s = f.st + 1 AND f.st + 1 = 3 THEN f.cnt + 1 ELSE f.cnt END
        |  FROM fold f JOIN sqo o ON o.user_id = f.user_id AND o.rn = f.rn + 1)
        |SELECT user_id, max(cnt) AS n_matches FROM fold
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the stream_anomaly prefix z-test restricted to the terminal
    // watermark: an event is DECIDED (emitted or passed over) only once
    // the watermark reaches its event time, so flags inside the final
    // 30 min horizon are still buffered when the replay ends
    "stream_anomaly_replay" ->
      """WITH c AS (SELECT user_id, event_id, ts, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |p AS (SELECT user_id, event_id, ts, value, cents,
        |    count(*) OVER w AS np,
        |    coalesce(sum(cents) OVER w, 0) AS s,
        |    coalesce(sum(cents * cents) OVER w, 0) AS ss
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
        |             - INTERVAL 30 MINUTE AS wm FROM events WHERE value IS NOT NULL)
        |SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |  np::BIGINT AS n_prior,
        |  CAST(s AS DOUBLE) / (100.0 * np) AS mean_prior
        |FROM p, m
        |WHERE np >= 8 AND ts <= wm
        |  AND CAST(cents * np - s AS HUGEINT) * CAST(cents * np - s AS HUGEINT)
        |      > 9 * (CAST(np AS HUGEINT) * ss - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
        |ORDER BY user_id, event_id""".stripMargin,

    "stream_merge" ->
      """WITH sm AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, "value",
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts_us, event_id, event_type, "value"
        |FROM sm WHERE rn = 1 AND event_type IS DISTINCT FROM 'error'
        |ORDER BY user_id""".stripMargin,
    // the batch funnel's join-chain oracle, verbatim — terminal streaming
    // state and the batch DP must agree on every user
    "stream_funnel" -> RelationalQueries.oracleSql("q36_funnel"),

    // q46's recursive-CTE state machine, verbatim — terminal streaming
    // count and the batch greedy fold must agree on every user
    "stream_seq_count" -> RelationalQueries.oracleSql("q46_seq_count"),

    // the batch heavy-hitter query's SQL, verbatim — the MG-maintained
    // candidate set plus candidates-only recount must reproduce the exact
    // heavy-hitter set (the mergeable-summaries retention guarantee)
    "stream_heavy_hitters" -> PipelineQueries.oracleSql("doc_heavy_hitters"),

    "stream_window_stats" ->
      """WITH w AS (
        |  SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS win_start,
        |    event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
        |             - INTERVAL 30 MINUTE AS wm FROM events)
        |SELECT win_start, win_start + INTERVAL 10 MINUTE AS win_end,
        |  event_type, n, sum_value
        |FROM w, m
        |WHERE win_start + INTERVAL 10 MINUTE <= wm
        |ORDER BY win_start, event_type""".stripMargin,

    // four streamed delta-merges must equal the full recompute — q51's
    // oracle, verbatim
    "stream_mv" -> RelationalQueries.oracleSql("q51_mv_incremental"),

    // KMV union is deterministic set algebra, so the incrementally
    // maintained sketch table must equal a from-scratch per-day rebuild —
    // including the (k−1)/θ estimates — under the hash gate
    "stream_kmv" ->
      """WITH keh AS (SELECT CAST(ts AS DATE) AS day,
        |    (list_reduce(list_prepend(0::BIGINT, list_transform(string_split(CAST(user_id AS VARCHAR), ''), pc -> ascii(pc)::BIGINT)), (pa, px) -> (pa*31 + px) % 1000000007)
        |     * 1103515245 + 12345) % 1000000007 AS h FROM events),
        |ked AS (SELECT DISTINCT day, h FROM keh),
        |ker AS (SELECT day, h,
        |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM ked),
        |ksk AS (SELECT day, list(h ORDER BY h) AS sk FROM ker
        |        WHERE rn <= 64 GROUP BY day)
        |SELECT day, len(sk)::BIGINT AS n_sk,
        |  CASE WHEN len(sk) < 64 THEN len(sk)::DOUBLE
        |       ELSE 63.0 / (sk[64]::DOUBLE / 1000000007.0) END AS est_users
        |FROM ksk ORDER BY day""".stripMargin,

    // sliding windows: each event expands to its two hop-aligned window
    // starts (i ∈ {0,1}; t − start < 2·slide = window holds for both),
    // then the tumbling emission rule applies per window
    "stream_sliding" ->
      """WITH ws AS (
        |  SELECT make_timestamp((epoch_us(ts) // 600000000 - i.i) * 600000000) AS win_start,
        |    event_type, value
        |  FROM events, (SELECT unnest([0, 1]) AS i) i),
        |w AS (SELECT win_start, event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM ws GROUP BY 1, 2),
        |m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
        |             - INTERVAL 30 MINUTE AS wm FROM events)
        |SELECT win_start, win_start + INTERVAL 20 MINUTE AS win_end,
        |  event_type, n, sum_value
        |FROM w, m
        |WHERE win_start + INTERVAL 20 MINUTE <= wm
        |ORDER BY win_start, event_type""".stripMargin,

    // gaps-and-islands sessionization (same break rule as q26's oracle:
    // a gap of EXACTLY the 30 min threshold still MERGES — session_window's
    // inclusive-gap merge, empirically pinned), session end = last event
    // + gap, emitted iff the terminal watermark passed the end
    "stream_sessions" ->
      """WITH d AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d),
        |agg AS (
        |  SELECT user_id, min(ts) AS s_start,
        |    max(ts) + INTERVAL 30 MINUTE AS s_end, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM s GROUP BY user_id, sid),
        |m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
        |             - INTERVAL 30 MINUTE AS wm FROM events)
        |SELECT user_id, s_start, s_end, n, sum_value
        |FROM agg, m WHERE s_end <= wm
        |ORDER BY user_id, s_start""".stripMargin,

    // stream_sessions' gaps-and-islands + terminal-watermark emission
    // rule, with the session's converted flag (purchase indicator max)
    // instead of the value sum
    "stream_session_conv" ->
      """WITH d AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d),
        |agg AS (
        |  SELECT user_id, min(ts) AS s_start,
        |    max(ts) + INTERVAL 30 MINUTE AS s_end, count(*) AS n,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |      AS converted
        |  FROM s GROUP BY user_id, sid),
        |m AS (SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
        |             - INTERVAL 30 MINUTE AS wm FROM events)
        |SELECT user_id, s_start, s_end, n, converted
        |FROM agg, m WHERE s_end <= wm
        |ORDER BY user_id, s_start""".stripMargin,

    // the doubled stream must collapse back to exactly the events table
    "stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    // terminal mapGroupsWithState state == the plain batch aggregate;
    // the state's integer-cents accumulation is exactly the
    // DECIMAL(18,2) sum
    "stream_user_aggs" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  max(ts) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the batch range join the streaming interval join must reproduce
    "stream_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
        |  a.ts AS a_ts, b.ts AS b_ts
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id
        | AND b.ts >= a.ts - INTERVAL 4 HOUR AND b.ts <= a.ts
        |WHERE a.event_type = 'click' AND b.event_type = 'view'
        |ORDER BY a_id, b_id""".stripMargin)
}
