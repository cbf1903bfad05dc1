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
}
