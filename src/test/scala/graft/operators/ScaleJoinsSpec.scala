package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under skew") {
    // pathological skew: 90% of left rows share one key
    val left = (1 to 2000).map(i => (if (i <= 1800) "hot" else s"k$i", i))
      .toDF("key", "v")
    val right = Seq(("hot", "H"), ("k1900", "A"), ("k1999", "B")).toDF("key", "tag")
    val plain = left.join(right, Seq("key")).select("key", "v", "tag")
      .collect().toSet
    val salted = ScaleJoins.saltedEquiJoin(left, right, "key", nSalts = 8)
      .select("key", "v", "tag").collect().toSet
    assert(salted == plain)
    assert(salted.count(_.getString(0) == "hot") == 1800)
  }

  test("bucketed range join equals the naive inequality join, no nested loop") {
    val points = (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("id", "pt")
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 50L, 60L), (3L, 990L, 1000L),
      (4L, 0L, 1000L), // corpus-spanning interval still explodes to few buckets
      (5L, 120L, 121L) // single-point interval
    ).toDF("iv_id", "lo", "hi")
    val naive = points.join(intervals, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("id", "iv_id").collect().toSet
    val bucketed = ScaleJoins.rangeJoinBucketed(points, intervals, "pt", "lo", "hi", width = 64)
    assert(bucketed.select("id", "iv_id").collect().toSet == naive)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed range join must be an equi-join:\n$plan")
  }

  test("interval overlap join equals the naive join for any width, no nested loop") {
    // deterministic pseudo-random closed intervals on [0, 400]
    val a = (0L until 120L).map(i => (i, i * 37 % 400, i * 37 % 400 + i % 23))
      .toDF("a_id", "a_s", "a_e")
    val b = (0L until 90L).map(i => (i, i * 53 % 400, i * 53 % 400 + i % 17))
      .toDF("b_id", "b_s", "b_e")
    val naive = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect().toSet
    for (w <- Seq(1L, 16L, 1000L)) {
      val got = ScaleJoins.intervalOverlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", w)
      // the arithmetic dedup must make every pair appear EXACTLY once
      val rows = got.select("a_id", "b_id").collect()
      assert(rows.length == rows.toSet.size, s"width=$w emitted duplicates")
      assert(rows.toSet == naive, s"width=$w")
    }
    val plan = ScaleJoins
      .intervalOverlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join must be an equi-join:\n$plan")
  }

  test("range join: fractional bounds keep the final bucket; inverted drop out") {
    // pt = 100.5 lives in bucket 2 (width 50) and satisfies pt < hi = 100.7;
    // the old floor((hi-1)/width) bound stopped at bucket 1 and lost it
    val points = Seq((1L, 100.5), (2L, 99.0), (3L, 100.9)).toDF("id", "pt")
    val intervals = Seq(
      (10L, 0.0, 100.7),   // fractional hi crossing a bucket boundary
      (11L, 100.0, 100.5), // fractional both ends, single bucket
      (12L, 50.0, 50.0),   // empty interval: must contribute nothing
      (13L, 80.0, 20.0)    // inverted interval: must contribute nothing
    ).toDF("iv_id", "lo", "hi")
    val naive = points.join(intervals, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("id", "iv_id").collect().toSet
    val got = ScaleJoins.rangeJoinBucketed(points, intervals, "pt", "lo", "hi", width = 50)
      .select("id", "iv_id").collect().toSet
    assert(got == naive, s"expected $naive, got $got")
    assert(got.exists(r => r.getLong(0) == 1L && r.getLong(1) == 10L),
      "the fractional-hi final-bucket row must be present")
  }

  test("bloom semi-join: result-neutral vs plain semi-join, sketch prunes pre-shuffle") {
    // parquet-backed big side: a LocalRelation would let Catalyst evaluate
    // the might_contain filter at optimization time and hide it from the plan
    val bigDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bloom_spec").getAbsolutePath
    (1L to 5000L).map(i => (i % 500, i)).toDF("k", "v")
      .write.mode("overwrite").parquet(bigDir)
    val big = spark.read.parquet(bigDir)
    val small = Seq(7L, 13L, 99L).toDF("sk")
    val plain = big.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
      .collect().toSet
    val bloomed = ScaleJoins.bloomSemiJoin(big, small, "k", "sk",
      expectedItems = 100L, fpp = 0.01)
    assert(bloomed.collect().toSet == plain)
    // the might_contain predicate must sit on the big side BELOW the join
    // (scan-stage pruning is the operator's entire point)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"sketch filter missing from plan:\n$plan")
    // keys 7/13/99 each appear 10× in big (i % 500) → 30 surviving rows
    assert(bloomed.count() == 30)
  }

  test("dedup survivors: one doc kept per cluster, unpaired docs untouched") {
    val docs = (1L to 8L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val kept = Dedup.survivors(docs, clusters).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 7L, 8L))
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf("sf0.001"))
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    ScaleJoins.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    ScaleJoins.writeBucketed(o, "o_bucketed", "l_orderkey", 4)

    val joined = ScaleJoins.bucketedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
    // force a sort-merge plan decision (disable broadcast for the check)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = ScaleJoins.bucketedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(j.count() == li.join(o, Seq("l_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
