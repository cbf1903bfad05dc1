package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape contracts for representative declared queries — the
  * properties that decide 100 TB viability, pinned as regression tests
  * against the REAL testdata readers (SURVEY §4):
  *
  *  - predicate pushdown reaches the parquet scan (a filter evaluated
  *    post-scan reads the whole table);
  *  - column pruning reaches the scan (ReadSchema carries only used
  *    columns — `props` is the canary, it is events' widest column);
  *  - ORDER BY..LIMIT plans as TakeOrderedAndProject (no global sort);
  *  - dimension joins broadcast (no shuffle of the fact side's keys);
  *  - candidate-pair dedup never degenerates to a cartesian/BNLJ;
  *  - scans run inside WholeStageCodegen.
  *
  * These held when the operators were written; the point of pinning them
  * is that an innocent-looking reader change (exactly round 6's
  * schema-adaptive rewrite) can silently forfeit them.
  */
class PlanContractSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val dir = sf("sf0.001")

  test("events time+type predicates push down to the parquet scan") {
    val plan = planOf(queries.CtShapeQueries.ctRecent(spark, dir))
    // the µs-file read keeps ts a plain TimestampType scan column, so the
    // range predicate must reach PushedFilters (the legacy long-nanos
    // encoding inherently blocks this behind the div-1000 projection)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(ts"), s"ts range not pushed:\n$plan")
    assert(plan.contains("EqualTo(event_type,view)"),
      s"type equality not pushed:\n$plan")
  }

  test("events scans prune unused columns (props never read)") {
    val plan = planOf(queries.CtShapeQueries.ctSubdomains(spark, dir))
    assert(!plan.contains("props"), s"props survived pruning:\n$plan")
  }

  test("ORDER BY .. LIMIT plans as TakeOrderedAndProject, not a full sort") {
    val plan = planOf(queries.CtShapeQueries.ctDomainLookup(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("dimension join broadcasts (q2), fact side never shuffles on the key") {
    val plan = planOf(SparkEntry.queries("q2_join_broadcast")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ngram candidate pairs join on shingle equality — no cartesian, no BNLJ") {
    val docs = Tables.documents(spark, dir)
    val plan = planOf(operators.Dedup.ngramJaccardPairs(docs, k = 3,
      threshold = 0.5))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("document scoring runs inside WholeStageCodegen (no HOF fallback)") {
    val df = SparkEntry.queries("doc_quality")(spark, dir)
    // under AQE the codegen spans only appear in the FINAL plan, and only
    // on the SAME QueryExecution that ran — collect() (a write would
    // build its own execution), then inspect
    df.collect()
    val plan = planOf(df)
    // the `*(n)` prefix is the WholeStageCodegen marker in the compact
    // tree string; the scoring Project must carry one
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"scoring projection not codegen'd:\n$plan")
    // the regression this pins: an interpreted higher-order function in
    // the projection (CodegenFallback) silently de-codegens the stage
    assert(!plan.contains("lambdafunction"), s"HOF back in the hot path:\n$plan")
  }

  test("q76 deciles: every window is key-partitioned, offsets join broadcasts") {
    val df = SparkEntry.queries("q76_spend_deciles")(spark, dir)
    // the regression this pins: ntile over Window.orderBy with no
    // partitionBy — one task holding every per-user row. The Ranks plan
    // must window only within __pid ranges (exact check on the logical
    // plan's Window nodes — the physical tree string doesn't distinguish
    // an empty partition spec reliably)...
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the per-range row_number window")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window in q76 plan:\n$w"))
    // ...and the ≤numRanges-row offsets table must broadcast, never
    // shuffle the user-grain side for it
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
