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
