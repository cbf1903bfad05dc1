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

  /** EventStreams.windowedStats (10 min tumbling windows, 30 min
    * watermark) driven to completion over the events table. */
  def streamWindowStats(spark: SparkSession, dir: String): DataFrame = {
    val name = "swstats_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = new java.io.File(
      System.getProperty("java.io.tmpdir"), name).getAbsolutePath
    val agg = EventStreams.windowedStats(
      EventStreams.readTestdataEvents(spark, dir))
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy(col("win_start"), col("event_type"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_stats" -> (streamWindowStats _))

  /** Batch equivalent of the append-mode streaming emission: tumbling
    * windows (epoch-aligned, as Spark's window()), emitted iff the window
    * closed under the terminal watermark. Spark tracks event-time stats in
    * milliseconds, hence the ms floor on max(ts). */
  def oracleSql: Map[String, String] = Map(
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
        |ORDER BY win_start, event_type""".stripMargin)
}
