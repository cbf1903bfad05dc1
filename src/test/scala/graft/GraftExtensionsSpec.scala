package graft

import org.apache.spark.unsafe.types.UTF8String

/** The extension-registered SQL functions must agree with the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("poly_hash / simhash62 / minhash_sig / dot_double / lsh_bands are SQL-callable") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT poly_hash('spark graft') AS ph,
        |  simhash62(array(poly_hash('a'), poly_hash('b'))) AS sh,
        |  minhash_sig(array(poly_hash('a'), poly_hash('b'))) AS sig,
        |  dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  lsh_bands(array(1.0D, -2.0D, 0.5D), 4, 2) AS lb""".stripMargin)
      .collect()(0)
    assert(r.getAs[scala.collection.Seq[Long]]("lb").length == 2)
    assert(r.getAs[Long]("ph") ==
      graft.expressions.ArrayExprs.polyHash(UTF8String.fromString("spark graft")))
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[scala.collection.Seq[Long]]("sig").length ==
      graft.functions.TextFunctions.MinhashK)
    assert(r.getAs[Long]("sh") >= 0)
  }

  test("bigram_counts / shingle_combine / dot_long are SQL-callable") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT bigram_counts('abab') AS bc,
        |  shingle_combine(array(poly_hash('a'), poly_hash('b'), poly_hash('c')), 2, true) AS sc,
        |  dot_long(array(2L, 3L), array(5L, 7L)) AS dl""".stripMargin)
      .collect()(0)
    // 'abab' -> bigrams ab(2), ba(1)
    val bc = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("bc")
      .map(x => (x.getString(0), x.getLong(1))).toMap
    assert(bc == Map("ab" -> 2L, "ba" -> 1L))
    assert(r.getAs[scala.collection.Seq[Long]]("sc").length == 2) // 3 tokens, k=2
    assert(r.getAs[Long]("dl") == 31L)
  }

  test("round-6 kernels are SQL-callable and agree with their definitions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT l2_dist2(array(1.0D, 2.0D), array(3.0D, 5.0D)) AS d2,
        |  count_equal_long(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS ce,
        |  max_abs_double(array(-3.5D, 2.0D)) AS ma,
        |  count_in_set(array('the', 'fox', 'and'), array('the', 'and')) AS cs,
        |  window_funnel_stage(array(
        |    named_struct('t', 0L, 's', 1),
        |    named_struct('t', 10L, 's', 2),
        |    named_struct('t', 20L, 's', 3)), 3, 100L) AS wf,
        |  sequence_count_fold(array(
        |    named_struct('t', 0L, 's', 1),
        |    named_struct('t', 10L, 's', 2)), 2) AS sq""".stripMargin)
      .collect()(0)
    assert(r.getAs[Double]("d2") == 13.0)
    assert(r.getAs[Long]("ce") == 2L)
    assert(r.getAs[Double]("ma") == 3.5)
    assert(r.getAs[Long]("cs") == 2L)
    assert(r.getAs[Long]("wf") == 3L)
    assert(r.getAs[Long]("sq") == 1L)
  }

  test("kmv_sketch aggregates through SQL (grouped, bounded at k)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 30L), (1L, 10L), (1L, 20L), (1L, 10L), (2L, 5L))
      .toDF("g", "h").createOrReplaceTempView("kmv_in")
    val got = spark.sql(
      "SELECT g, kmv_sketch(h, 2) AS sk FROM kmv_in GROUP BY g ORDER BY g")
      .collect().map(_.getAs[scala.collection.Seq[Long]]("sk").toSeq).toSeq
    assert(got == Seq(Seq(10L, 20L), Seq(5L)))
  }

  test("base_domain is SQL-callable (the CT pipeline's key scalar)") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT base_domain('a.b.example.co.uk') AS bd1,
        |  base_domain('foo.github.io') AS bd2,
        |  base_domain(NULL) AS bd3""".stripMargin).collect()(0)
    assert(r.getString(0) == "example.co.uk")
    assert(r.getString(1) == "foo.github.io") // private-section PSL rule
    assert(r.isNullAt(2))
  }
}
