package graft.ct

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** GET /stream change feed, Spark-native (SURVEY §3.3).
  *
  * The reference polls the table every 2 s with `ts > last ... LIMIT 100`
  * and an in-memory cursor (/root/reference/api/app.py:246-272) — losing
  * rows at the cursor boundary and replaying from scratch per reconnect.
  * Structured Streaming's file source replaces that with checkpointed,
  * exactly-once delivery of newly appended Parquet files; the 2 s cadence
  * maps to a processing-time trigger (ST4).
  *
  * The batch polling variant (reference-faithful, bug fixed) is
  * `CtQueries.streamTail`.
  */
object StreamTail {

  /** Unbounded view of the store as a stream of appended rows. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(CertDomain.schema.add(CertStore.partitionCol, "string"))
      .parquet(path)

  /** Push each micro-batch to a subscriber callback (the SSE writer in a
    * serving deployment). 2 s trigger = reference poll period (app.py:272). */
  def start(stream: DataFrame, checkpoint: String)(
      onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("2 seconds"))
      .foreachBatch { (df: DataFrame, id: Long) => onBatch(df, id) }
      .start()
}
