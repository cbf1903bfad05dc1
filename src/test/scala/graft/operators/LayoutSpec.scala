package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class LayoutSpec extends SparkSpec {

  test("zValue: interleaves bits exactly") {
    import spark.implicits._
    // z(a=0b11, b=0b10) = a bits at even, b at odd: 0b1101 = 13
    val got = Seq((3L, 2L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4)).as[Long].head()
    assert(got == 13L)
    // order within a 2x2 quad follows the Z curve: (0,0)(1,0)(0,1)(1,1)
    val quad = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 2)).as[Long].collect().toSeq
    assert(quad == Seq(0L, 1L, 2L, 3L))
  }

  test("zValue: monotone per coordinate; box membership implies corner z-bounds (randomized)") {
    import spark.implicits._
    // The property underlying every z-range scan: z is monotone in each
    // coordinate, so a query box [alo,ahi]x[blo,bhi] confines its points'
    // z-values to [z(alo,blo), z(ahi,bhi)] — the bound file-level
    // statistics pruning exploits. 2000 seeded random (point, box) cases
    // evaluated through the REAL expression in one Spark job.
    val bits = 16
    val lim = 1L << bits
    val rnd = new scala.util.Random(42)
    def bounded(hi: Long) = math.abs(rnd.nextLong()) % hi
    val rows = Seq.fill(2000) {
      val (alo, blo) = (bounded(lim), bounded(lim))
      val (ahi, bhi) = (alo + bounded(lim - alo), blo + bounded(lim - blo))
      // half the cases sample the point INSIDE the box (the claim's
      // premise); the rest roam freely (no claim, just must not crash)
      val (a, b) =
        if (rnd.nextBoolean()) (alo + bounded(ahi - alo + 1), blo + bounded(bhi - blo + 1))
        else (bounded(lim), bounded(lim))
      (a, b, alo, ahi, blo, bhi)
    }
    val df = rows.toDF("a", "b", "alo", "ahi", "blo", "bhi")
      .withColumn("z", Layout.zValue(col("a"), col("b"), bits))
      .withColumn("zlo", Layout.zValue(col("alo"), col("blo"), bits))
      .withColumn("zhi", Layout.zValue(col("ahi"), col("bhi"), bits))
      .withColumn("za1", when(col("a") < lim - 1,
        Layout.zValue(col("a") + 1, col("b"), bits)))
      .withColumn("zb1", when(col("b") < lim - 1,
        Layout.zValue(col("a"), col("b") + 1, bits)))
    val inBox = col("a").between(col("alo"), col("ahi")) &&
      col("b").between(col("blo"), col("bhi"))
    assert(df.filter(inBox).count() > 500, "premise must be exercised")
    assert(df.filter(inBox && (col("z") < col("zlo") || col("z") > col("zhi")))
      .count() == 0, "a box point escaped its corner z-bounds")
    assert(df.filter(col("za1").isNotNull && col("za1") <= col("z")).count() == 0 &&
      df.filter(col("zb1").isNotNull && col("zb1") <= col("z")).count() == 0,
      "z must be strictly monotone in each coordinate")
  }

  test("z-ordered layout prunes files on BOTH dimensions; linear sort does not") {
    val events = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val nFiles = 16

    Layout.writeZOrdered(events, s"$base/z", "user_id", "event_id",
      bits = 20, nFiles = nFiles)
    events.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(s"$base/linear")

    // per-file min/max — exactly the statistics parquet footer pruning uses
    def ranges(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("event_id").as("elo"), max("event_id").as("ehi"))
      .collect()
    def overlapping(rows: Array[org.apache.spark.sql.Row],
        dim: String, lo: Long, hi: Long): Int =
      rows.count(r => r.getAs[Long](dim.take(1) + "lo") <= hi &&
        r.getAs[Long](dim.take(1) + "hi") >= lo)

    // low-cardinality user_id can leave range partitions empty — compare
    // against the ACTUAL file counts, as footer pruning would
    val zr = ranges(s"$base/z"); val lr = ranges(s"$base/linear")
    assert(zr.length >= nFiles / 2 && lr.length >= nFiles / 2)
    // a narrow USER slice (top third of the 0..14 ids): both layouts
    // must prune this dimension
    val zUser = overlapping(zr, "user", 10, 14)
    val lUser = overlapping(lr, "user", 10, 14)
    assert(lUser <= lr.length / 2, s"user-sorted layout must prune user slices ($lUser/${lr.length})")
    assert(zUser <= zr.length * 3 / 4, s"z-order must prune user slices too ($zUser/${zr.length})")
    // a narrow EVENT slice: the user-sorted layout reads EVERY file,
    // z-order keeps event ranges narrow per file as well
    val zEvent = overlapping(zr, "event", 100, 200)
    val lEvent = overlapping(lr, "event", 100, 200)
    assert(lEvent == lr.length, "single-dim sort cannot prune the other dimension")
    assert(zEvent <= zr.length / 2,
      s"z-order must keep event_id ranges file-local ($zEvent of ${zr.length} files)")
  }
}
