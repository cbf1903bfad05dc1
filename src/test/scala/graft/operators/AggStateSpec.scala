package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggStateSpec extends SparkSpec {

  private def events = graft.Tables.events(spark, sf("sf0.001"))

  test("merged partial states equal the from-scratch state for any split") {
    val full = AggState.finish(AggState.dailyState(events))
      .orderBy("day", "event_type").collect().toSeq
    // three unrelated ways to slice the history into increments — all
    // must converge to the same view (associativity + commutativity)
    val splits = Seq(
      col("event_id") % 2 === 0,                 // interleaved
      col("ts") < lit("2024-01-10"),             // time-ordered backfill
      col("user_id") < 10)                       // skewed, key-correlated
    for (p <- splits) {
      val merged = AggState.finish(AggState.merge(
        AggState.dailyState(events.filter(p)),
        AggState.dailyState(events.filter(!p))))
        .orderBy("day", "event_type").collect().toSeq
      assert(merged === full, s"split $p")
    }
  }

  test("three-way merge and merge-of-merges agree (associativity)") {
    val a = AggState.dailyState(events.filter(col("event_id") % 3 === 0))
    val b = AggState.dailyState(events.filter(col("event_id") % 3 === 1))
    val c = AggState.dailyState(events.filter(col("event_id") % 3 === 2))
    val flat = AggState.finish(AggState.merge(a, b, c))
      .orderBy("day", "event_type").collect().toSeq
    val nested = AggState.finish(AggState.merge(AggState.merge(a, b), c))
      .orderBy("day", "event_type").collect().toSeq
    assert(flat === nested)
    assert(flat === AggState.finish(AggState.dailyState(events))
      .orderBy("day", "event_type").collect().toSeq)
  }

  test("maintainParquet over successive increments equals the full state") {
    val path = java.nio.file.Files
      .createTempDirectory("aggstate_maintain").toString + "/view"
    try {
      for (r <- 0L to 2L)
        AggState.maintainParquet(spark, path,
          events.filter(col("event_id") % 3 === r), batchId = r)
      val maintained = AggState.finish(AggState.readState(spark, path))
        .orderBy("day", "event_type").collect().toSeq
      val full = AggState.finish(AggState.dailyState(events))
        .orderBy("day", "event_type").collect().toSeq
      assert(maintained === full)
    } finally Dedup.rmdir(new java.io.File(path).getParentFile)
  }

  test("maintainParquet works through a scheme-qualified (file:) state " +
      "root — pointer, snapshots and prune ride the Hadoop FS API (the " +
      "cluster-FS-readiness pin, same class as the components artifact's)") {
    val local = java.nio.file.Files
      .createTempDirectory("aggstate_scheme").toString + "/view"
    val path = s"file:$local"
    try {
      for (r <- 0L to 2L)
        AggState.maintainParquet(spark, path,
          events.filter(col("event_id") % 3 === r), batchId = r)
      val maintained = AggState.finish(AggState.readState(spark, path))
        .orderBy("day", "event_type").collect().toSeq
      val full = AggState.finish(AggState.dailyState(events))
        .orderBy("day", "event_type").collect().toSeq
      assert(maintained === full)
      // the pointer landed under the local path the file: URI names,
      // and pruning kept only the last two snapshots
      assert(new java.io.File(local, "_CURRENT").exists())
      val snaps = new java.io.File(local).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("b")).map(_.getName)
      assert(snaps.toSet == Set("b1", "b2"), snaps.mkString(","))
    } finally Dedup.rmdir(new java.io.File(local).getParentFile)
  }

  test("maintainParquet is idempotent under micro-batch replay") {
    val path = java.nio.file.Files
      .createTempDirectory("aggstate_replay").toString + "/view"
    try {
      AggState.maintainParquet(spark, path,
        events.filter(col("event_id") % 2 === 0), batchId = 0L)
      AggState.maintainParquet(spark, path,
        events.filter(col("event_id") % 2 === 1), batchId = 1L)
      val once = AggState.finish(AggState.readState(spark, path))
        .orderBy("day", "event_type").collect().toSeq
      // at-least-once delivery: the engine re-runs batch 1 after a crash
      // before the checkpoint commit — the fold must skip it
      AggState.maintainParquet(spark, path,
        events.filter(col("event_id") % 2 === 1), batchId = 1L)
      val replayed = AggState.finish(AggState.readState(spark, path))
        .orderBy("day", "event_type").collect().toSeq
      assert(replayed === once, "a replayed batchId must not double-count")
    } finally Dedup.rmdir(new java.io.File(path).getParentFile)
  }

  test("an empty increment is the identity") {
    val state = AggState.dailyState(events)
    val withEmpty = AggState.finish(
      AggState.merge(state, AggState.dailyState(events.filter(lit(false)))))
      .orderBy("day", "event_type").collect().toSeq
    assert(withEmpty ===
      AggState.finish(state).orderBy("day", "event_type").collect().toSeq)
  }
}
