package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the schema-adaptive events reader: the testdata generator has
  * shipped `ts` as TIMESTAMP(NANOS) (read as raw-nanos LONG under the
  * legacy conf), TIMESTAMP(MICROS), and TIMESTAMP_NTZ(MICROS) across
  * regenerations — a reader hard-coded to any one of them either throws
  * (batch) or silently compresses event time 1000× (streaming). Every
  * encoding must load to the identical epoch-micros TimestampType rows,
  * and a unit mix-up must fail the [1950, 2100) range check loudly.
  */
class TablesSpec extends SparkSpec {

  /** Writes `$dir/events.parquet` as a single FILE — the driver's actual
    * testdata layout, which the streaming reader's pathGlobFilter relies
    * on (a directory named events.parquet would hide its part files). */
  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    val staging = s"$dir/__staging"
    Seq((1L, 1704110400000000L, 10L, "click", 1.5, "{}"),
        (2L, 1704110401500000L, 11L, "view", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(dir, "events.parquet")
    if (dst.exists) { dst.delete(); () }
    Files.move(part.toPath, dst.toPath)
    graft.operators.Dedup.rmdir(new java.io.File(staging))
  }

  private def loadedMicros(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private val expected = Seq((1L, 1704110400000000L), (2L, 1704110401500000L))

  test("raw-nanos LONG ts loads as micros-exact timestamps") {
    val dir = Files.createTempDirectory("graft_ev_long").toString
    writeEvents(dir, (col("us") * 1000L)) // LONG nanos, the legacy encoding
    assert(loadedMicros(dir) === expected)
    assert(Tables.events(spark, dir).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("TIMESTAMP(MICROS) ts loads as micros-exact timestamps") {
    val dir = Files.createTempDirectory("graft_ev_us").toString
    writeEvents(dir, timestamp_micros(col("us")))
    assert(loadedMicros(dir) === expected)
  }

  test("TIMESTAMP_NTZ(MICROS) ts loads micros-exact, independent of session TZ") {
    val dir = Files.createTempDirectory("graft_ev_ntz").toString
    writeEvents(dir, to_timestamp_ntz(timestamp_micros(col("us"))))
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType) // precondition: really NTZ on disk
    assert(loadedMicros(dir) === expected)
    // the forced-TimestampType read hands over stored micros verbatim —
    // a session in a non-UTC zone must see the SAME epoch micros (a cast
    // of the inferred NTZ would shift by the zone offset instead)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(loadedMicros(dir) === expected)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("a 1000x unit mix-up fails the range check loudly") {
    val dir = Files.createTempDirectory("graft_ev_bad").toString
    // micros MISWRITTEN as if nanos: a long column 1000x too small lands
    // in 1970 — the regression class this reader exists to catch
    writeEvents(dir, (col("us") / 1000L).cast("long"))
    val e = intercept[IllegalArgumentException](loadedMicros(dir))
    assert(e.getMessage.contains("unit misread"))
  }

  test("streaming reader agrees with the batch reader on every encoding") {
    import org.apache.spark.sql.streaming.Trigger
    for ((mk, tag) <- Seq(
        ((c: org.apache.spark.sql.Column) => c * 1000L, "long"),
        ((c: org.apache.spark.sql.Column) => timestamp_micros(c), "us"),
        ((c: org.apache.spark.sql.Column) => to_timestamp_ntz(timestamp_micros(c)), "ntz"))) {
      val dir = Files.createTempDirectory(s"graft_ev_stream_$tag").toString
      writeEvents(dir, mk(col("us")))
      val name = s"tsadapt_$tag"
      val q = graft.streaming.EventStreams.readTestdataEvents(spark, dir)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft_ev_ckpt_$tag").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(name)
        .select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got === expected, s"encoding $tag")
      spark.catalog.dropTempView(name)
    }
  }
}
