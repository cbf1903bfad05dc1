package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranks must be HASH-IDENTICAL to the single-partition window forms it
  * replaces (the oracle side keeps the plain SQL window): same rank as
  * row_number over the full sort, same buckets as ntile — including the
  * remainder placement, tie grouping, and the n < tiles degenerate. */
class RanksSpec extends SparkSpec {

  private def fixture(n: Int, dupEvery: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(42 + n)
    // heavy ties when dupEvery is small: key = value % dupEvery
    (0 until n).map(i => (i.toLong, (rnd.nextInt(1000) % dupEvery).toLong))
      .toDF("id", "k")
      .repartition(7) // physical layout must not matter
  }

  test("globalRankDesc equals single-window row_number at several sizes and tie densities") {
    for ((n, dup) <- Seq((1, 1), (9, 3), (100, 5), (1000, 13), (1000, 1))) {
      val df = fixture(n, dup)
      val (ranked, total) = Ranks.globalRankDesc(df, "k", "id", numRanges = 8)
      assert(total == n)
      val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("k").desc, col("id").asc)).cast("long"))
      val diff = ranked.as("a").join(want.as("b"), col("a.id") === col("b.id"))
        .filter(col("a.rank") =!= col("b.rank")).count()
      assert(diff == 0, s"n=$n dup=$dup: $diff rank mismatches")
    }
  }

  test("empty input: rank and ntile both yield zero rows, no quantile failure") {
    // approxQuantile over zero rows returns an empty cut-point array →
    // one range, empty offsets, empty output; ntile's n=0 takes the
    // q==0 degenerate path. Pins that the operator needs no non-empty
    // precondition (a filter upstream of q76 may legitimately drain it).
    val df = fixture(0, 1)
    val (ranked, total) = Ranks.globalRankDesc(df, "k", "id", numRanges = 8)
    assert(total == 0 && ranked.count() == 0)
    assert(Ranks.ntileByKeyDesc(df, "k", "id", 10).count() == 0)
  }

  test("NULL keys rank last, matching the single-window desc-nulls-last order") {
    import spark.implicits._
    // a `__kd < bound` range probe would silently drop null keys into
    // the TOP range (the condition is null → otherwise-0); both Spark's
    // desc default and DuckDB's default null order put them LAST, so the
    // operator must too — pinned against the single-window oracle with
    // nulls threaded through ties and both rank and ntile shapes
    val rows = (0 until 200).map { i =>
      (i.toLong, if (i % 7 == 0) None else Some((i % 13).toLong))
    }
    val df = rows.toDF("id", "k").repartition(5)
    val (ranked, total) = Ranks.globalRankDesc(df, "k", "id", numRanges = 8)
    assert(total == 200)
    val want = df.withColumn("rank",
      row_number().over(Window.orderBy(col("k").desc, col("id").asc)).cast("long"))
    assert(ranked.as("a").join(want.as("b"), col("a.id") === col("b.id"))
      .filter(col("a.rank") =!= col("b.rank")).count() == 0)
    val gotT = Ranks.ntileByKeyDesc(df, "k", "id", 10, outCol = "t", numRanges = 8)
    val wantT = df.withColumn("t",
      ntile(10).over(Window.orderBy(col("k").desc, col("id").asc)).cast("long"))
    assert(gotT.as("a").join(wantT.as("b"), col("a.id") === col("b.id"))
      .filter(col("a.t") =!= col("b.t")).count() == 0)
  }

  test("degenerate corners: all-equal keys, ALL-NULL keys, n < tiles, numRanges=1 — each vs the single-window oracle") {
    import spark.implicits._
    // the four adversarial distributions the round-7 verdict named (#6):
    //  - all-equal keys: every cut point collapses → one range holds
    //    every row (single-task fallback, still correct);
    //  - ALL-NULL keys: approxQuantile sees zero non-null values → no
    //    cuts; every row routes through the null→last-range rule;
    //  - n < tiles: rank r → bucket r (the q==0 path);
    //  - numRanges=1: no cut points at all — the explicit single-range
    //    configuration, not an emergent one.
    val cases: Seq[(String, Seq[(Long, Option[Long])], Int, Int)] = Seq(
      ("all-equal", (0 until 100).map(i => (i.toLong, Some(7L))), 8, 10),
      ("all-null", (0 until 100).map(i => (i.toLong, None: Option[Long])), 8, 10),
      ("n<tiles", (0 until 3).map(i => (i.toLong, Some(i.toLong % 2))), 8, 10),
      ("numRanges=1", (0 until 200).map(i => (i.toLong, Some(i.toLong % 13))), 1, 7),
      ("numRanges=1 all-null", (0 until 50).map(i => (i.toLong, None: Option[Long])), 1, 5))
    for ((name, rows, numRanges, tiles) <- cases) {
      val df = rows.toDF("id", "k").repartition(5)
      val (ranked, total) = Ranks.globalRankDesc(df, "k", "id", numRanges)
      assert(total == rows.length, s"$name: total")
      val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("k").desc, col("id").asc)).cast("long"))
      assert(ranked.as("a").join(want.as("b"), col("a.id") === col("b.id"))
        .filter(col("a.rank") =!= col("b.rank")).count() == 0, s"$name: rank")
      val gotT = Ranks.ntileByKeyDesc(df, "k", "id", tiles, outCol = "t", numRanges)
      val wantT = df.withColumn("t",
        ntile(tiles).over(Window.orderBy(col("k").desc, col("id").asc)).cast("long"))
      assert(gotT.as("a").join(wantT.as("b"), col("a.id") === col("b.id"))
        .filter(col("a.t") =!= col("b.t")).count() == 0, s"$name: ntile")
    }
  }

  test("ntileByKeyDesc equals single-window ntile: remainders, ties, n < tiles") {
    // 25 % 10 = 5 exercises remainder placement; 7 < 10 the degenerate;
    // 1000 % 7 = 6 a non-decile tile count; dup=1 is ALL-ties
    for ((n, dup, tiles) <- Seq((25, 4, 10), (7, 2, 10), (1000, 13, 7), (64, 1, 10))) {
      val df = fixture(n, dup)
      val got = Ranks.ntileByKeyDesc(df, "k", "id", tiles, outCol = "t", numRanges = 8)
      val want = df.withColumn("t",
        ntile(tiles).over(Window.orderBy(col("k").desc, col("id").asc)).cast("long"))
      val diff = got.as("a").join(want.as("b"), col("a.id") === col("b.id"))
        .filter(col("a.t") =!= col("b.t")).count()
      assert(diff == 0, s"n=$n dup=$dup tiles=$tiles: $diff tile mismatches")
    }
  }
}
