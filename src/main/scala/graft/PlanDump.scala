package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named declared queries to
  * files — the optimization round's before/after plan evidence
  * (`plans/r16/<query>_<tag>.txt`). Usage:
  *
  *   sbt "runMain graft.PlanDump <outDir> <tag> <query> [query ...]"
  *
  * Plans are captured PRE-execution (the same view `explain` gives a
  * user); `stream_*` queries execute through the streaming harness whose
  * batch-side plan is pinned by specs, so this tool is for the batch
  * surface. Reads the same `$SPARK_GRAFT_SF_DIR` as Bench so the plan
  * reflects the bench's data (statistics, file sizes). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query> [query ...]")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
        formatted.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
