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

  test("compactDrifted rewrites only fragmented months in place; dedupe is month-scoped") {
    val dir = Files.createTempDirectory("certstore-drift").toString
    // January: five appends → five files (fragmented past the bound).
    // February: one write → one file (within bound, must not be touched).
    for (_ <- 1 to 5) CertStore.write(fixture("2024-01", 4).toDF(), dir, SaveMode.Append)
    CertStore.write(fixture("2024-02", 4).toDF(), dir, SaveMode.Append)
    def files(month: String): Seq[String] =
      new java.io.File(s"$dir/ts_month=$month").listFiles().toSeq
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.getName).sorted
    assert(files("202401").size == 5)
    val febBefore = files("202402")
    val rowsBefore = CertStore.read(spark, dir).count()
    val months = CertStore.compactDrifted(spark, dir, maxFilesPerMonth = 4)
    assert(months == Seq(202401L), s"only January drifted, got $months")
    assert(files("202401").size == 1, "drifted month must compact to filesPerMonth files")
    assert(files("202402") == febBefore, "in-bound month's files must be untouched")
    assert(CertStore.read(spark, dir).count() == rowsBefore, "in-place compaction keeps rows")
    // dedupe: January holds 5 copies of each (fingerprint, domain) from
    // the chained appends; a month-scoped ReplacingMergeTree merge
    // collapses them without touching February (ClickHouse semantics:
    // dedup within the partition's merge only)
    for (_ <- 1 to 5) CertStore.write(fixture("2024-01", 4).toDF(), dir, SaveMode.Append)
    val dedupMonths = CertStore.compactDrifted(spark, dir, maxFilesPerMonth = 4, dedupe = true)
    assert(dedupMonths == Seq(202401L))
    val back = CertStore.read(spark, dir)
    assert(back.filter($"ts_month" === "202401").count() == 4, "one row per cert after merge")
    assert(back.filter($"ts_month" === "202402").count() == 4, "February rows unchanged")
    // crash window: the archived month with live missing is restored by
    // the shared kernel's recovery sweep on the next invocation
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val live = new org.apache.hadoop.fs.Path(dir, "ts_month=202401")
    val archive = new org.apache.hadoop.fs.Path(dir, ".old_ts_month=202401")
    assert(fs.rename(live, archive))
    CertStore.compactDrifted(spark, dir, maxFilesPerMonth = 1000)
    assert(fs.exists(live) && !fs.exists(archive), "archived month must be restored")
    assert(CertStore.read(spark, dir).filter($"ts_month" === "202401").count() == 4)
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
