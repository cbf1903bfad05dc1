package graft.ct

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** End-to-end streaming ingest over the DataSource-v2 CT source: readStream
  * (transport) → IngestPipeline.certDomains (parse/explode/dedup — the SAME
  * transform as batch ingest) → one idempotent store write per micro-batch.
  *
  * foreachBatch rather than the parquet streaming sink because the store
  * write is not a plain append — it month-partitions, repartitions and
  * sorts (CertStore.write).
  *
  * Exactly-once, not just effectively: offsets live in the checkpoint and
  * each epoch's ranges are a pure function of the offset pair, so a
  * replayed micro-batch recomputes identical rows — and `writeEpoch` lands
  * them in the epoch's OWN `epoch=<id>` directory with Overwrite mode, so
  * the replay REPLACES any partial output from the crashed attempt instead
  * of appending a duplicate (a bare Append sink re-appends when the crash
  * falls between the write and the checkpoint commit). Readers see `epoch`
  * as an extra partition column, which CertStore.read drops.
  *
  * `ingestTs` parameterizes the wall clock per micro-batch (determinism
  * rule, SURVEY §7.4).
  *
  * THE DEPLOYMENT DEFAULT (round-15/16): this route measured
  * 14.7k/81k/74k rows/s across ×1/×10/×100 backlogs on local[32] —
  * ~2× [[Ingestor.runOnceParallel]] from ×10 up — and is the only
  * ingest shape whose fetches run on executors (partition-per-
  * (log, range), source/CtMicroBatchSource.scala:172), so it scales
  * with the cluster rather than a driver thread pool. Row identity
  * with the serial loop is spec-pinned (CtDsv2Spec). Cluster-FS
  * portability is pinned too: store root, checkpoint WAL, and the
  * layout guard below all resolve scheme-qualified URIs through the
  * Hadoop FS API (CtDsv2Spec's file:-scheme lifecycle leg — the
  * round-15 FsPointers defect class, kept out by test).
  */
object StreamIngest {

  /** Idempotent per-epoch store write (exposed for direct testing of the
    * replay contract).
    *
    * Layout discipline: a streaming store is epoch-layered (`epoch=N/
    * ts_month=M/`) for its whole life — Parquet partition discovery cannot
    * mix directory depths, so writing epochs into a plain batch store (or
    * vice versa) would poison every subsequent read. This is guarded, not
    * just documented. To compact a streaming store: stop the query, then
    * `CertStore.compact(spark, store, s"$tmp/epoch=0")` — compact's plain
    * ts_month output lands as epoch 0 of a fresh epoch-layered store —
    * swap directories, restart (the checkpoint keeps the CT offsets; epoch
    * ids continue upward, so new epochs never collide with 0). */
  def writeEpoch(batch: DataFrame, storePath: String, batchId: Long,
      ts: Timestamp): Unit = {
    val s = batch.sparkSession
    // layout guard through the Hadoop FS API: the production store root
    // is the cluster FS, where a java.io.File probe would silently
    // no-op (isDirectory false → guard skipped) and let a plain-layout
    // store be poisoned with epoch dirs
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(root) && fs.getFileStatus(root).isDirectory) {
      val kids = fs.listStatus(root).map(_.getPath.getName)
      require(!kids.exists(_.startsWith(CertStore.partitionCol + "=")),
        s"$storePath holds a plain (non-epoch) store layout; streaming ingest " +
          "must write to its own epoch-layered store (see writeEpoch docs)")
    }
    import s.implicits._
    val rows = IngestPipeline.certDomains(batch.as[RawEntry], ts)
    CertStore.write(rows, s"$storePath/epoch=$batchId", SaveMode.Overwrite)
  }

  def start(spark: SparkSession, sourceOptions: Map[String, String],
      storePath: String, checkpoint: String,
      ingestTs: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
      trigger: Trigger = Trigger.ProcessingTime(5000L)): StreamingQuery = {
    val raw = spark.readStream
      .format(classOf[source.CtTableProvider].getName)
      .options(sourceOptions)
      .load()
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeEpoch(batch, storePath, batchId, ingestTs())
      }
      .start()
  }
}
