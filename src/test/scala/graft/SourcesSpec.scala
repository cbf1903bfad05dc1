package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Multi-format source coverage: the same relation read back from JSON
  * lines and CSV must answer queries identically to the Parquet original
  * (Spark's source abstraction is the engine's multi-format surface). */
class SourcesSpec extends SparkSpec {

  test("json-lines and csv roundtrips preserve query results") {
    val orig = Tables.nation(spark, sf("sf0.001"))
    val jsonDir = Files.createTempDirectory("nation-json").toString + "/out"
    val csvDir = Files.createTempDirectory("nation-csv").toString + "/out"
    orig.write.json(jsonDir)
    orig.write.option("header", "true").csv(csvDir)

    val fromJson = spark.read.schema(orig.schema).json(jsonDir)
    val fromCsv = spark.read.schema(orig.schema).option("header", "true").csv(csvDir)

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"),
        min(col("n_name")).as("first_name"))
        .orderBy(col("n_regionkey")).collect().toSeq

    assert(agg(fromJson) == agg(orig))
    assert(agg(fromCsv) == agg(orig))
  }
}
