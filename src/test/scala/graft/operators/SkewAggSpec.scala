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

  test("stage-1 shuffle key carries the distinct value (hot key spreads over tasks)") {
    // parquet-backed input, NOT Range: the planner can prove Range's id
    // unique and partition-disjoint and elides the stage-1 exchange
    // outright, hiding the shape this test pins
    val tmp = java.nio.file.Files.createTempDirectory("skewagg_plan").toFile
    try {
      spark.range(100).select(lit("hot").as("k"), (col("id") % 37).as("x"))
        .write.mode("overwrite").parquet(s"$tmp/t")
      val df = spark.read.parquet(s"$tmp/t")
      // the load-bearing fact is that the FIRST exchange hash-partitions on
      // (key, x) — the finest salt — not on the bare key, so a hot key's
      // rows spread over every reducer
      val plan = SkewAgg.saltedDistinctCount(df, "k", "x", nSalts = 8)
        .queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.size == 2,
        s"the value-grain shape needs exactly two exchanges, got ${exchanges.size}:\n$plan")
      val firstExchange = exchanges.last // innermost (stage-1) prints last
      assert(firstExchange.contains("x#"),
        s"stage-1 shuffle must carry the distinct column: $firstExchange")
    } finally Dedup.rmdir(tmp)
  }

  test("NULL distinct values count as rows but not as distinct (count_distinct semantics)") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", None), ("b", None))
      .toDF("k", "x")
    val got = SkewAgg.saltedDistinctCount(df, "k", "x")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val plain = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), count_distinct(col("x")).as("n_distinct"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got === plain)
    assert(got === Seq(("a", 3L, 1L), ("b", 1L, 0L)))
  }
}
