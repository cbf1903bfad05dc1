package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the streaming Misra-Gries maintenance under REAL eviction — the
  * driver testdata's ~31-token vocabulary never overflows the 128-counter
  * state, so this plants a 4000+-token corpus where every micro-batch
  * compression actually decrements and drops counters, and the mergeable
  * retention guarantee (a true heavy hitter survives every fold) is what
  * makes the final recount exact. */
class StreamHeavyHittersSpec extends SparkSpec {

  test("planted skew: eviction-heavy folds still yield the exact heavy-hitter set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_spec").toString
    // 500 docs, 11 tokens each: "hot0" x3 per doc (1500/5500 = 27% > 1/64),
    // "warm0" in every 10th doc (50 < 5500/64 ≈ 86 — candidate-but-filtered),
    // 8 singleton rare tokens per doc (vocab ≈ 4000 ≫ 128 counters)
    val docs = (0 until 500).map { i =>
      val rare = (0 until 8).map(j => s"r${i}_$j").mkString(" ")
      val warm = if (i % 10 == 0) "warm0 " else ""
      (i.toLong, s"hot0 hot0 hot0 $warm$rare", "en", s"src$i")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.queries.StreamingQueries.streamHeavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // exact heavy hitters of the planted corpus: tokens with cnt*64 > N
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val expect = toks.groupBy("token").count()
      .filter(col("count") * 64 > n)
      .collect().map(r => (r.getString(0), r.getLong(1), n))
      .sortBy { case (t, c, _) => (-c, t) }
    assert(got.toSeq == expect.toSeq)
    assert(got.map(_._1).contains("hot0"))
    assert(!got.map(_._1).contains("warm0"))
  }
}
