package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: audits the physical plan of every declared query — are filters
  * pushed into the Parquet scan, are dimension joins broadcast, how much of
  * the plan runs inside WholeStageCodegen, does anything fall back to a
  * cartesian product. `sbt "runMain graft.PlanAudit [sfDir]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        def has(s: String) = plan.contains(s) || formatted.contains(s)
        val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(formatted).isDefined
        val flags = Seq(
          if (pushed) Some("pushdown") else None,
          if (has("BroadcastHashJoin")) Some("bcast-join") else None,
          if (has("SortMergeJoin")) Some("smj") else None,
          if (has("BroadcastNestedLoopJoin")) Some("bnlj") else None,
          if (has("CartesianProduct")) Some("CARTESIAN!") else None,
          if (has("TakeOrderedAndProject")) Some("topk") else None,
          if (has("WholeStageCodegen") || plan.contains("*(")) Some("codegen") else None
        ).flatten
        println(f"$name%-24s ${flags.mkString(", ")}")
      } catch { case e: Throwable =>
        println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
