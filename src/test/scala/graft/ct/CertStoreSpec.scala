package graft.ct

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SaveMode
import graft.SparkSpec

class CertStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(month: String, n: Int): Seq[CertDomain] =
    (0 until n).map { i =>
      val ts = Timestamp.valueOf(s"$month-10 12:00:0${i % 10}")
      CertDomain(ts, s"d$i.example.com", "example.com", f"$i%064d",
        "CN=CA", "CN=d", Seq(s"d$i.example.com"),
        Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2025-01-01 00:00:00"), "log")
    }

  test("write/read roundtrip with monthly hive partitioning") {
    val dir = Files.createTempDirectory("certstore").toString
    CertStore.write((fixture("2024-01", 5) ++ fixture("2024-02", 5)).toDF(),
      dir, SaveMode.Overwrite)
    val back = CertStore.read(spark, dir)
    assert(back.count() == 10)
    assert(back.select("ts_month").distinct().as[String].collect().sorted.toSeq
      == Seq("202401", "202402"))
    // hive layout on disk
    assert(new java.io.File(s"$dir/ts_month=202401").isDirectory)
  }

  test("month predicate prunes partitions (reads fewer files)") {
    val dir = Files.createTempDirectory("certstore").toString
    CertStore.write((fixture("2024-01", 5) ++ fixture("2024-02", 5)).toDF(),
      dir, SaveMode.Overwrite)
    import org.apache.spark.sql.functions.input_file_name
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val all = filesRead(CertStore.read(spark, dir))
    val one = filesRead(CertStore.readMonths(spark, dir, "202402", "202402"))
    assert(one < all, s"pruned read should touch fewer files ($one vs $all)")
  }

  test("time-predicate queries prune ts_month partitions at the scan (SURVEY §4)") {
    val dir = Files.createTempDirectory("certstore").toString
    CertStore.write(
      (fixture("2024-01", 5) ++ fixture("2024-02", 5) ++ fixture("2024-03", 5)).toDF(),
      dir, SaveMode.Overwrite)
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }.head
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).length
    }
    val table = CertStore.read(spark, dir)
    val total = scannedPartitions(table)
    assert(total == 3)
    val recent = CtQueries.recent(table, "example.com",
      Timestamp.valueOf("2024-03-10 18:00:00"))
    assert(scannedPartitions(recent) == 1, "24h lookback must touch one month")
    assert(recent.count() == 5) // and still see that month's rows
    val stats = CtQueries.stats(table, java.sql.Date.valueOf("2024-02-10"), approx = false)
    assert(scannedPartitions(stats) == 1, "single-day stats must touch one month")
    assert(stats.collect()(0).getAs[Long]("total") == 5)
    val tail = CtQueries.streamTail(table, Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(scannedPartitions(tail) == 2, "tail from Feb must skip January")
    assert(tail.count() == 10)
  }

  test("compact rewrites into fewer files per month, same rows") {
    val dir = Files.createTempDirectory("certstore").toString
    // three appends → several small files
    CertStore.write(fixture("2024-01", 4).toDF(), dir, SaveMode.Append)
    CertStore.write(fixture("2024-01", 4).toDF(), dir, SaveMode.Append)
    CertStore.write(fixture("2024-01", 4).toDF(), dir, SaveMode.Append)
    val dest = Files.createTempDirectory("compacted").toString
    CertStore.compact(spark, dir, dest)
    assert(CertStore.read(spark, dest).count() == CertStore.read(spark, dir).count())
    assert(CertStore.read(spark, dest).inputFiles.length
      <= CertStore.read(spark, dir).inputFiles.length)
  }

  test("compact with dedupe collapses cross-log duplicate certs (README.md:19 semantics)") {
    val dir = Files.createTempDirectory("certstore").toString
    val rows = fixture("2024-01", 3)
    CertStore.write(rows.toDF(), dir, SaveMode.Append)
    CertStore.write(rows.map(_.copy(log_name = "other_log")).toDF(), dir, SaveMode.Append)
    val dest = Files.createTempDirectory("compacted").toString
    CertStore.compact(spark, dir, dest, dedupe = true)
    val back = CertStore.read(spark, dest)
    assert(back.count() == 3) // one row per (fingerprint, domain)
    assert(back.select("log_name").distinct().as[String].collect().toSeq == Seq("log"))
  }

  test("sizeBytes sums parquet files; humanBytes formats base-1024 (S12/F19)") {
    val dir = Files.createTempDirectory("certstore").toString
    CertStore.write(fixture("2024-01", 5).toDF(), dir, SaveMode.Overwrite)
    assert(CertStore.sizeBytes(spark, dir) > 0)
    assert(CertStore.sizeBytes(spark, dir + "/nope") == 0)
    assert(CertStore.humanBytes(0) == "0B")
    assert(CertStore.humanBytes(1536) == "1.50KB")
    assert(CertStore.humanBytes(5L * 1024 * 1024 * 1024) == "5.00GB")
  }
}
