package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams.Event

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeBatch(dir: String, rows: Seq[Event]): Unit =
    rows.toDF().coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  test("windowed aggregation closes windows as the watermark advances; late rows dropped") {
    val dir = Files.createTempDirectory("events-in").toString
    val ckpt = Files.createTempDirectory("ckpt").toString

    writeBatch(dir, Seq(
      Event(1, ts("2024-01-01 00:01:00"), 1, "click", Some(1.0)),
      Event(2, ts("2024-01-01 00:05:00"), 2, "click", Some(2.0)),
      Event(3, ts("2024-01-01 00:12:00"), 1, "view", Some(3.0))))

    val q = EventStreams.runToMemory(
      EventStreams.windowedStats(EventStreams.readEvents(spark, dir),
        window = "10 minutes", watermark = "10 minutes"),
      "win_out", ckpt)
    q.processAllAvailable()
    // watermark so far: 00:12 - 10m = 00:02 → first window [00:00,00:10) not closed yet
    assert(spark.table("win_out").count() == 0)

    // advance event time far enough to close both earlier windows
    writeBatch(dir, Seq(Event(4, ts("2024-01-01 01:00:00"), 3, "click", Some(4.0))))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select("win_start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows == Set(
      (ts("2024-01-01 00:00:00"), "click", 2L, 3.0),
      (ts("2024-01-01 00:10:00"), "view", 1L, 3.0)))

    // a row far behind the watermark must be dropped, not re-open its window
    writeBatch(dir, Seq(Event(5, ts("2024-01-01 00:01:30"), 9, "click", Some(100.0))))
    q.processAllAvailable()
    assert(spark.table("win_out").count() == rows.size)
    q.stop()
  }

  test("streaming sessionization finalizes sessions once the watermark passes the gap") {
    val dir = Files.createTempDirectory("events-sess").toString
    val ckpt = Files.createTempDirectory("ckpt-sess").toString

    // user 1: two events 5 min apart (one session), then a 2h gap
    writeBatch(dir, Seq(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", Some(1.0)),
      Event(2, ts("2024-01-01 00:05:00"), 1, "click", Some(2.0))))
    val q = EventStreams.runToMemory(
      EventStreams.sessionStats(EventStreams.readEvents(spark, dir),
        gap = "30 minutes", watermark = "10 minutes"),
      "sess_out", ckpt)
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // session still open

    writeBatch(dir, Seq(Event(3, ts("2024-01-01 02:00:00"), 1, "view", Some(5.0))))
    q.processAllAvailable()
    val rows = spark.table("sess_out")
      .select("user_id", "s_start", "n", "sum_value")
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    assert(rows == Set((1L, ts("2024-01-01 00:00:00"), 2L, 3.0)))
    q.stop()
  }

  test("streaming dedup drops replayed event_ids within the watermark horizon") {
    val dir = Files.createTempDirectory("events-dd").toString
    val ckpt = Files.createTempDirectory("ckpt-dd").toString
    writeBatch(dir, Seq(
      Event(1, ts("2024-01-01 00:01:00"), 1, "click", Some(1.0)),
      Event(2, ts("2024-01-01 00:02:00"), 2, "click", Some(2.0))))
    val q = EventStreams.runToMemory(
      EventStreams.dedupedEvents(EventStreams.readEvents(spark, dir),
        watermark = "30 minutes"),
      "dd_out", ckpt)
    q.processAllAvailable()
    // an at-least-once upstream replays event 2 (same id, same payload) in
    // a later micro-batch, plus a genuinely new event
    writeBatch(dir, Seq(
      Event(2, ts("2024-01-01 00:02:00"), 2, "click", Some(2.0)),
      Event(3, ts("2024-01-01 00:03:00"), 1, "view", Some(3.0))))
    q.processAllAvailable()
    try {
      val ids = spark.table("dd_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"replay must be dropped, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user state across micro-batches") {
    val dir = Files.createTempDirectory("events-in2").toString
    val ckpt = Files.createTempDirectory("ckpt2").toString

    writeBatch(dir, Seq(
      Event(1, ts("2024-01-01 00:00:01"), 1, "click", Some(1.5)),
      Event(2, ts("2024-01-01 00:00:02"), 1, "view", Some(2.5)),
      Event(3, ts("2024-01-01 00:00:03"), 2, "click", Some(10.0))))

    val q = EventStreams.runToMemory(
      EventStreams.runningUserAggs(spark,
        EventStreams.readEvents(spark, dir)).toDF(),
      "user_out", ckpt, OutputMode.Update())
    q.processAllAvailable()

    writeBatch(dir, Seq(Event(4, ts("2024-01-01 00:01:00"), 1, "click", Some(6.0))))
    q.processAllAvailable()

    // latest state per user: user 1 saw 3 events across two batches
    assert(spark.table("user_out").filter($"user_id" === 1 && $"n_events" === 3
      && $"total_value" === 10.0).count() == 1)
    assert(spark.table("user_out").filter($"user_id" === 2 && $"n_events" === 1).count() == 1)
    q.stop()
  }

  test("latestState: latest wins across batches, tombstone deletes, later change revives") {
    val dir = Files.createTempDirectory("events-in3").toString
    val ckpt = Files.createTempDirectory("ckpt3").toString

    writeBatch(dir, Seq(
      Event(1, ts("2024-01-01 00:00:01"), 1, "click", Some(1.0)),
      Event(2, ts("2024-01-01 00:00:02"), 1, "error", Some(0.0)), // tombstone so far
      Event(3, ts("2024-01-01 00:00:01"), 2, "view", Some(2.0))))
    val q = EventStreams.runToMemory(
      EventStreams.latestState(spark,
        EventStreams.readEvents(spark, dir), tombstone = "error").toDF(),
      "lstate_out", ckpt, OutputMode.Update())
    q.processAllAvailable()
    // user 1's latest is the tombstone; user 2 alive
    val afterB1 = spark.table("lstate_out")
      .groupBy($"user_id").agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct($"event_id", $"deleted"), $"ts_us").as("s"))
      .select($"user_id", $"s.event_id", $"s.deleted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(afterB1(1L) == (2L, true) && afterB1(2L) == (3L, false))

    // a later batch revives user 1 (state carried across micro-batches)
    writeBatch(dir, Seq(Event(4, ts("2024-01-01 00:01:00"), 1, "view", Some(5.0))))
    q.processAllAvailable()
    q.stop()
    val terminal = spark.table("lstate_out")
      .groupBy($"user_id").agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct($"event_id", $"deleted"), $"ts_us").as("s"))
      .select($"user_id", $"s.event_id", $"s.deleted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(terminal(1L) == (4L, false), "revival must clear the tombstone")
    assert(terminal(2L) == (3L, false))
  }

  test("streaming funnel terminal state equals the batch windowFunnel") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val types = Seq("view", "click", "purchase")
    val ckpt = Files.createTempDirectory("ckpt-funnel").toString
    val q = EventStreams.runToMemory(
      EventStreams.funnelStages(spark,
        EventStreams.readTestdataEvents(spark, "/root/testdata/sf0.001"),
        types, windowMicros = 21600000000L).toDF(),
      "funnel_out", ckpt, OutputMode.Update())
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_out")
      .groupBy($"user_id").agg(org.apache.spark.sql.functions.max($"funnel_stage").as("funnel_stage"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Funnel.windowFunnel(events, types, 21600000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "terminal streaming state must equal the batch DP")
  }

  test("anomalies: planted spike flagged once priors exist, steady series never flags") {
    val dir = Files.createTempDirectory("events-anom").toString
    val ckpt = Files.createTempDirectory("ckpt-anom").toString
    // user 1: nine near-constant values (slight jitter so variance > 0),
    // then one wild spike — only the spike clears the 3σ prefix z-test.
    // user 2: a perfectly steady series (zero variance) stays silent for
    // the steady value; the z-test's strict > never fires on dev == 0.
    val steady = (0 until 9).map(i => Event(10 + i,
      ts(f"2024-01-01 00:0$i:00"), 1, "m", Some(if (i % 2 == 0) 10.0 else 10.02)))
    val spike = Event(19, ts("2024-01-01 00:09:30"), 1, "m", Some(500.0))
    val flat = (0 until 10).map(i => Event(20 + i,
      ts(f"2024-01-01 01:0$i:00"), 2, "m", Some(7.0)))
    writeBatch(dir, steady :+ spike)
    writeBatch(dir, flat)
    val q = EventStreams.runToMemory(
      EventStreams.anomalies(spark, EventStreams.readEvents(spark, dir)).toDF(),
      "anom_out", ckpt, OutputMode.Update())
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("anom_out")
      .select("user_id", "event_id", "n_prior")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 19L, 9L)),
      s"exactly the planted spike, after 9 priors: $rows")
  }

  test("ewma: tap state carries across micro-batches, equals full-series formula") {
    val dir = Files.createTempDirectory("events-ewma").toString
    val ckpt = Files.createTempDirectory("ckpt-ewma").toString
    val vals = Seq(10.0, 20.0, 40.0, 80.0, 160.0)
    writeBatch(dir, vals.take(3).zipWithIndex.map { case (v, i) =>
      Event(i + 1, ts(f"2024-01-01 00:0$i:00"), 1, "m", Some(v)) })
    val q = EventStreams.runToMemory(
      EventStreams.ewma(spark, EventStreams.readEvents(spark, dir)).toDF(),
      "ewma_out", ckpt, OutputMode.Update())
    q.processAllAvailable()
    writeBatch(dir, vals.drop(3).zipWithIndex.map { case (v, i) =>
      Event(i + 4, ts(f"2024-01-01 00:0${i + 3}:00"), 1, "m", Some(v)) })
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ewma_out")
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    // independent full-series formula (same cents-domain arithmetic as
    // the batch q64 contract): taps are the reversed prefix
    vals.indices.foreach { i =>
      val taps = vals.take(i + 1).reverse.take(16)
      val num = taps.zipWithIndex.map { case (v, j) =>
        (v * 100.0) * math.pow(0.5, j + 1) }.sum
      val den = taps.indices.map(j => math.pow(0.5, j + 1)).sum
      assert(got(i + 1L) == num / den / 100.0,
        s"event ${i + 1}: ${got(i + 1L)} != ${num / den / 100.0}")
    }
  }

  test("streaming sequence count terminal state equals the batch greedy fold") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val types = Seq("view", "click", "purchase")
    val ckpt = Files.createTempDirectory("ckpt-seqcount").toString
    val q = EventStreams.runToMemory(
      EventStreams.seqCountStages(spark,
        EventStreams.readTestdataEvents(spark, "/root/testdata/sf0.001"),
        types).toDF(),
      "seqcount_out", ckpt, OutputMode.Update())
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("seqcount_out")
      .groupBy($"user_id").agg(org.apache.spark.sql.functions.max($"n_matches").as("n_matches"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Funnel.sequenceCount(events, types)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "terminal streaming count must equal the batch fold")
    assert(batch.values.exists(_ > 0L), "corpus should complete at least one chain")
  }
}
