package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAggSpec extends SparkSpec {
  import spark.implicits._

  test("saltedDistinctCount matches the plain aggregation on a planted hot key") {
    // key "hot" holds 90% of rows with many repeated x values; the rest
    // spread over cold keys — the regime the salted plan exists for
    val df = spark.range(10000).select(
      when(col("id") % 10 < 9, lit("hot")).otherwise(concat(lit("cold"), col("id") % 7)).as("k"),
      (col("id") % 137).as("x"))

    val salted = SkewAgg.saltedDistinctCount(df, "k", "x", nSalts = 8)
      .orderBy("k").collect()
    val plain = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), count_distinct(col("x")).as("n_distinct"))
      .orderBy("k").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("exactness holds for any nSalts (value partitioning across salts)") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 3L), ("b", 3L))
      .toDF("k", "x")
    for (n <- Seq(1, 2, 3, 16)) {
      val got = SkewAgg.saltedDistinctCount(df, "k", "x", nSalts = n)
        .orderBy("k").as[(String, Long, Long)].collect().toSeq
      assert(got === Seq(("a", 3L, 2L), ("b", 2L, 1L)), s"nSalts=$n")
    }
  }

  test("stage-1 shuffle key carries the salt (hot key spreads over tasks)") {
    val df = spark.range(100).select(lit("hot").as("k"), col("id").as("x"))
    // Catalyst renames the salt projection to `_groupingexpression`; the
    // load-bearing fact is that the FIRST exchange hash-partitions on two
    // keys (key + salt), not on the bare key
    val plan = SkewAgg.saltedDistinctCount(df, "k", "x", nSalts = 8)
      .queryExecution.executedPlan.toString
    val firstExchange = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq.last
    assert(firstExchange.contains("_groupingexpression") || firstExchange.contains("__salt"),
      s"stage-1 shuffle must carry the salt key: $firstExchange")
  }
}
