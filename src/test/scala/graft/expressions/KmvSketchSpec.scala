package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.expressions.KmvSketch.kmvSketch

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sk(rows: Seq[Long], k: Int, parts: Int = 1): Seq[Long] =
    rows.toDF("h").repartition(parts)
      .agg(kmvSketch(col("h"), k).as("sk"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("sk").toSeq

  test("exhaustive below k: all distinct values, sorted, duplicates collapsed") {
    assert(sk(Seq(5L, 3L, 9L, 3L, 5L), k = 8) == Seq(3L, 5L, 9L))
  }

  test("bounded at k: exactly the k smallest distinct values survive") {
    val vals = (1L to 100L).map(i => (i * 37L) % 101L)
    assert(sk(vals, k = 4) == vals.distinct.sorted.take(4))
  }

  test("merge + serialize path: repartitioned input yields the identical sketch") {
    val vals = (1L to 500L).map(i => (i * 7919L) % 99991L)
    val one = sk(vals, k = 16, parts = 1)
    val many = sk(vals, k = 16, parts = 11)
    assert(one == many, "partial-aggregate merges must be order-insensitive")
    assert(one.size == 16)
  }

  test("grouped sketches and null inputs") {
    val df = Seq((1L, Some(10L)), (1L, Some(2L)), (1L, None),
      (2L, Some(7L)), (2L, Some(7L))).toDF("g", "h")
    val got = df.groupBy(col("g")).agg(kmvSketch(col("h"), 4).as("sk"))
      .orderBy(col("g")).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("sk").toSeq).toSeq
    assert(got == Seq(Seq(2L, 10L), Seq(7L)))
  }
}
