package graft.ct

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** End-to-end streaming ingest over the DataSource-v2 CT source: readStream
  * (transport) → IngestPipeline.certDomains (parse/explode/dedup — the SAME
  * transform as batch ingest) → CertStore.write per micro-batch.
  *
  * foreachBatch rather than the parquet streaming sink because the store
  * write is not a plain append — it month-partitions, repartitions and
  * sorts (CertStore.write). Offsets live in the checkpoint: a replayed
  * micro-batch refetches identical ranges and the (fingerprint, domain)
  * dedup makes the replay idempotent — the same effectively-exactly-once
  * contract as the v0 driver loop (Ingestor), now held by the engine.
  *
  * `ingestTs` parameterizes the wall clock per micro-batch (determinism
  * rule, SURVEY §7.4).
  */
object StreamIngest {

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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val rows = IngestPipeline.certDomains(batch.as[RawEntry], ingestTs())
        CertStore.write(rows, storePath, SaveMode.Append)
      }
      .start()
  }
}
