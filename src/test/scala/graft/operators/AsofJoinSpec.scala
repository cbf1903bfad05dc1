package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: inclusive match, latest-wins, tie-break, null when none") {
    val left = Seq(
      (100L, 1L, 10L), // matches right ts 10 (inclusive)
      (101L, 1L, 7L),  // matches right ts 5
      (102L, 1L, 4L),  // no right row at or before -> nulls
      (103L, 2L, 50L)  // other key: its own timeline
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 5L, 5L, 900L),
      (1L, 10L, 10L, 901L),
      (1L, 10L, 10L, 902L), // equal ts: greatest tie-break id wins
      (1L, 20L, 20L, 903L), // after every left row
      (2L, 49L, 49L, 950L)
    ).toDF("user_id", "ts", "p_ts", "p_event_id")

    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("p_ts", "p_event_id"), rightTieBreak = Some("p_event_id"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.get(r.fieldIndex("p_event_id")))))

    assert(got.toSeq == Seq(
      100L -> Some(902L),
      101L -> Some(900L),
      102L -> None,
      103L -> Some(950L)))
  }
}
