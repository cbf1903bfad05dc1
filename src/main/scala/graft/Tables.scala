package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loads the driver-generated testdata tables (see TESTDATA.md / FIXTURES.md §B).
  *
  * Every declared query receives `(spark, sfDir)` and reads only from this
  * loader so the same code runs at any scale factor. Reads are plain
  * `spark.read.parquet` → `FileSourceScanExec` with Catalyst predicate
  * pushdown + column pruning intact (SURVEY §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark's reader
    * rejects outright — reading it requires `spark.sql.legacy.parquet.
    * nanosAsLong=true`. This is a deliberate, DOCUMENTED session-lifetime
    * mutation, not an oversight: the conf is consulted at SCAN time, when
    * the (lazy) frames built here finally execute, so "restore it after
    * building the plan" would break every frame still in flight. Set-once
    * (idempotent guard) keeps repeated table loads from churning the conf
    * map.
    */
  private[graft] def ensureNanosAsLong(s: SparkSession): Unit =
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Events with `ts` truncated to microseconds — exactly what DuckDB does
    * when it loads the same file, so oracle comparisons stay bit-identical.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
