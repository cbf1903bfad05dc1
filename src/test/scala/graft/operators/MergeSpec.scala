package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "tag", "v")

  test("mergeUpsert: update wins, tombstone deletes, unseen key inserts") {
    val changes = Seq(
      (2L, "b2", 21.0, 1L, false), // update
      (3L, "c", 30.0, 1L, true),   // delete
      (9L, "new", 90.0, 1L, false) // insert
    ).toDF("k", "tag", "v", "ver", "del")
    val got = Merge.mergeUpsert(base, changes, "k", "ver", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (9L, "new", 90.0)))
  }

  test("mergeUpsert: later version beats earlier; ties resolve tombstone-first") {
    val changes = Seq(
      (1L, "v1", 11.0, 1L, false),
      (1L, "v2", 12.0, 2L, false), // highest version wins
      (2L, "x", 99.0, 1L, true),
      (2L, "y", 98.0, 1L, false)   // tie with a tombstone -> delete wins
    ).toDF("k", "tag", "v", "ver", "del")
    val got = Merge.mergeUpsert(base, changes, "k", "ver", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "v2", 12.0), (3L, "c", 30.0)))
    // and the outcome ignores input partitioning
    val got13 = Merge.mergeUpsert(base.repartition(13), changes.repartition(7),
        "k", "ver", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got13 == got)
  }
}
