package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def funnel(rows: Seq[(Long, Long, String)], window: Long) = {
    val df = rows.toDF("user_id", "tus", "event_type")
      .select(col("user_id"), timestamp_micros(col("tus")).as("ts"), col("event_type"))
    Funnel.windowFunnel(df, Seq("view", "click", "purchase"), window).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("windowFunnel: ordering, window, restart, ties, absent stages") {
    val got = funnel(Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),   // full chain
      (2L, 0L, "click"), (2L, 10L, "view"),                          // wrong order
      (3L, 0L, "view"), (3L, 200L, "click"),                         // click outside window
      (4L, 0L, "view"), (4L, 50L, "click"), (4L, 150L, "purchase"),  // purchase too late
      (5L, 0L, "view"), (5L, 90L, "click"), (5L, 95L, "purchase"),   // just inside
      (6L, 0L, "purchase"),                                          // never stage 1
      // restart: the SECOND view's chain completes inside its window
      (7L, 0L, "view"), (7L, 150L, "click"), (7L, 100L, "view"),
      (7L, 180L, "click"), (7L, 199L, "purchase"),
      (8L, 0L, "view"), (8L, 0L, "click"), (8L, 0L, "purchase")      // same-ts chain
    ), window = 100L)
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 3L, 6L -> 0L, 7L -> 3L, 8L -> 3L), s"got $got")
  }

  test("windowFunnel: Column fold equals the pure reference on random fixtures") {
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "click", "purchase")
    val rows = (0L until 50L).flatMap { u =>
      (0 until rnd.nextInt(12)).map(_ =>
        (u, rnd.nextInt(40).toLong, types(rnd.nextInt(3))))
    }
    val got = funnel(rows, window = 15L)
    val expect = rows.groupBy(_._1).map { case (u, es) =>
      u -> Funnel.referenceStage(
        es.map(e => (e._2, types.indexOf(e._3) + 1)), 3, 15L).toLong
    }
    assert(got == expect, s"diff: ${got.toSet.diff(expect.toSet)}")
  }

  private def seqCount(rows: Seq[(Long, Long, String)]) = {
    val df = rows.toDF("user_id", "tus", "event_type")
      .select(col("user_id"), timestamp_micros(col("tus")).as("ts"), col("event_type"))
    Funnel.sequenceCount(df, Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sequenceCount: sequential chains, noise, ties, wrong order") {
    val got = seqCount(Seq(
      // two back-to-back completions
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "purchase"),
      (1L, 3L, "view"), (1L, 4L, "click"), (1L, 5L, "purchase"),
      // interleaved starts: sequential semantics count 1, not 2
      (2L, 0L, "view"), (2L, 1L, "view"), (2L, 2L, "click"),
      (2L, 3L, "click"), (2L, 4L, "purchase"), (2L, 5L, "purchase"),
      // wrong order never completes
      (3L, 0L, "purchase"), (3L, 1L, "click"), (3L, 2L, "view"),
      // noise between stages is fine
      (4L, 0L, "view"), (4L, 1L, "purchase"), (4L, 2L, "click"),
      (4L, 3L, "view"), (4L, 4L, "purchase"),
      // same-timestamp chain resolves lower-stage-first
      (5L, 0L, "view"), (5L, 0L, "click"), (5L, 0L, "purchase")
    ))
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 1L),
      s"got $got")
  }

  test("sequenceCount: Column fold equals the pure reference on random fixtures") {
    val rnd = new scala.util.Random(7)
    val types = Vector("view", "click", "purchase")
    val rows = (0L until 50L).flatMap { u =>
      (0 until rnd.nextInt(14)).map(_ =>
        (u, rnd.nextInt(40).toLong, types(rnd.nextInt(3))))
    }
    val got = seqCount(rows)
    val expect = rows.groupBy(_._1).map { case (u, es) =>
      u -> Funnel.referenceSeqCount(
        es.map(e => (e._2, types.indexOf(e._3) + 1)), 3)
    }
    assert(got == expect, s"diff: ${got.toSet.diff(expect.toSet)}")
  }

  test("windowFunnel: partitioning-invariant on the real corpus") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val a = Funnel.windowFunnel(events, Seq("view", "click", "purchase"),
      21600000000L).collect().map(_.toSeq).toSeq
    val b = Funnel.windowFunnel(events.repartition(11), Seq("view", "click", "purchase"),
      21600000000L).collect().map(_.toSeq).toSeq
    assert(a == b)
    val stages = a.map(_(1).asInstanceOf[Long]).groupBy(identity).view.mapValues(_.size)
    assert(stages.keySet.size >= 2, s"corpus should spread across stages: $stages")
  }
}
