package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational coverage queries over the driver testdata (SURVEY §2, §7.6).
  *
  * The reference itself has no joins/windows/set-ops (SURVEY §2.3/§2.5/§2.7);
  * these queries declare the beyond-reference surface Spark gives for free,
  * exercised so the oracle gate pins their semantics.
  *
  * Determinism rules (FIXTURES.md): no wall clock (fixed literals), every
  * ORDER BY carries a full tiebreaker, money aggregates are computed on
  * DECIMAL(18,2) and cast back to double so Spark and the DuckDB oracle
  * produce bit-identical sums regardless of partial-aggregation order.
  */
object RelationalQueries {

  /** Exact decimal view of a double money column. */
  private def dec(c: String): Column = col(c).cast("decimal(18,2)")

  /** Exact decimal sum of a double column, returned as double.
    * Partial/final aggregation order then cannot perturb low bits. */
  private def dsum(c: String): Column = sum(dec(c)).cast("double")

  /** TPC-H Q1 pricing summary shape: scan → filter → hash agg (partial+final)
    * → sort. Maps reference ops P5/A1/A6 (api/app.py:184-193) onto lineitem. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1995-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Star-schema join with broadcast dims: orders ⋈ customer ⋈ nation.
    * nation/customer are small → explicit broadcast() keeps the big fact
    * side shuffle-free (100 TB rule: never shuffle the fact table to join
    * a dimension that fits in memory). */
  def q2JoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum("o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  /** Fact-to-fact equi-join (lineitem ⋈ orders) → agg. At scale this is the
    * shuffle-heavy case: both sides hash-partition on the join key and AQE
    * handles skew; here we let Catalyst pick (sort-merge or broadcast). */
  def q3JoinLarge(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-semi join (EXISTS): customers having a big order. */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(400000.0))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no high-value order.
    * (The testdata gives every customer at least one order, so the
    * no-orders-at-all form returns 0 rows and proves nothing — the
    * 450k threshold keeps the anti-join gate non-vacuous at every SF.) */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(450000.0))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Ranking window: top-3 orders per customer (row_number ≤ 3). */
  def q6WindowTopn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long")) // match DuckDB's BIGINT row_number
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running-total window: cumulative quantity per supplier over ship time.
    * Decimal accumulator → identical values under any engine's window
    * evaluation strategy. */
  def q7WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 20)
      .withColumn("running_qty", sum(dec("l_quantity")).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
  }

  /** UNION (distinct) of two key sets. */
  def q8Union(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy(col("nationkey"))

  /** INTERSECT of customer vs supplier nations. */
  def q9Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** EXCEPT: early customers (an order before 1996) who never placed a
    * high-value order. (Customer-vs-supplier nation sets are identical in
    * the testdata, so that form returned 0 rows — this one stays non-empty
    * at every SF while exercising the same EXCEPT distinct-set semantics.) */
  def q10Except(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .select(col("o_custkey").as("custkey")).distinct()
      .except(o.filter(col("o_totalprice") > lit(450000.0))
        .select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
  }

  /** ROLLUP aggregation (beyond-reference grouping sets). NULL grouping
    * cells are coalesced to 'ALL' so row identity is total-order stable. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (no full sort). */
  def q12Topk(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(10)

  /** DISTINCT enumeration. */
  def q13Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment")).distinct()
      .orderBy(col("c_mktsegment"))

  /** Generator/explode (reference G1, ct_ingestor.py:189-203): token
    * frequency via explode(split(text)) → hash agg → top-k. */
  def q14ExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= lit(""))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(100)

  /** Day-grain time rollup (reference F3 toDate, api/app.py:177). */
  def q15EventsPerDay(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
      .orderBy(col("day"))

  /** Scalar-subquery shape: parts priced above the global mean. The mean is
    * compared in exact decimal arithmetic (price*cnt > total) so both
    * engines agree on boundary rows. */
  def q16AboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val stats = part.agg(
      sum(dec("p_retailprice")).as("total"), count(lit(1)).as("cnt"))
    part.crossJoin(broadcast(stats))
      .filter(dec("p_retailprice") * col("cnt") > col("total"))
      .select(col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** JSON payload extraction (reference F15 surface generalized to the
    * query layer): parse events.props, aggregate an extracted field. */
  def q17Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Navigation window functions: previous/next order per customer. */
  def q18WindowNav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** rank/dense_rank with ties (integral quantities). */
  def q19WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").desc)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Numeric RANGE frame: peers within 5 quantity units contribute. */
  def q20RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    // asc_nulls_last: DuckDB's default null order (a NULL quantity row
    // must be the same peer group at the same end on both engines)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").asc_nulls_last)
      .rangeBetween(-5, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        sum(dec("l_quantity")).over(w).cast("double").as("range_sum"))
      .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
  }

  /** CUBE grouping sets (all four combinations). */
  def q21Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum("l_extendedprice").as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * per-returnflag, per-linestatus, and grand-total groups in one pass —
    * Spark plans a single Expand + hash aggregate, same as the oracle. */
  def q22GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** As-of join (operator Spark lacks natively, graft.operators.AsofJoin):
    * each click event picks the same user's most recent purchase at or
    * before its timestamp — one shuffle on user_id, no range join. */
  def q30Asof(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("ts").as("p_ts"), col("event_id").as("p_event_id"))
    graft.operators.AsofJoin.asofJoin(clicks, purchases,
        keys = Seq("user_id"), tsCol = "ts",
        rightPayload = Seq("p_ts", "p_event_id"),
        rightTieBreak = Some("p_event_id"))
      .orderBy(col("event_id"))
  }

  /** Distinct aggregate per group. */
  def q23DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Conditional aggregation (pivot-style CASE sums). */
  def q24CondAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("l_returnflag") === "R", dec("l_quantity")).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("qty_returned"),
        sum(when(col("l_returnflag") =!= "R", dec("l_quantity")).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("qty_kept"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
      .orderBy(col("l_linestatus"))

  /** Array element access + order-independent aggregates over embeddings. */
  def q25ArrayOps(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        min(element_at(col("embedding"), 1).cast("double")).as("min_e0"),
        max(element_at(col("embedding"), 1).cast("double")).as("max_e0"),
        max(size(col("embedding"))).cast("long").as("dims"))
      .orderBy(col("label"))

  /** Gap-based sessionization via the built-in session_window: events of a
    * user belong to one session while consecutive gaps stay under 30 min.
    * s_end is normalized back to the last event time (session_window.end
    * is last event + gap). Oracle = classic gaps-and-islands SQL; the
    * boundary is aligned (a gap of exactly 30 min starts a new session on
    * both sides). */
  def q26Sessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
      .select(col("user_id"),
        col("sw.start").as("s_start"),
        expr("sw.end - INTERVAL 30 MINUTES").as("s_end"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("s_start"))

  /** DataFrame pivot API (wide conditional aggregation). */
  def q27Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec("l_quantity")).cast("double"))
      .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
      .orderBy(col("l_returnflag"))

  /** SQL entry path: the same engine surface through spark.sql over
    * registered views (TPC-H Q4 shape with a decorrelated EXISTS). */
  def q28Sql(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders_v
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem_v
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** Scalar correlated subqueries through spark.sql: Catalyst decorrelates
    * each one into a left-outer aggregate join (the EXISTS analog of
    * [[q28Sql]] for value-producing subqueries) — at scale they are
    * ordinary shuffled aggregates, never a per-row probe. count(*) over
    * an empty group yields 0 and max yields NULL, identically on both
    * engines. */
  def q55ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_sq_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_sq_v")
    spark.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders_sq_v o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT max(o_totalprice) FROM orders_sq_v o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer_sq_v c
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Range (interval) join via graft.operators.ScaleJoins.rangeJoinBucketed:
    * orders matched to every overlapping price tier ([t·50k, t·50k+75k) —
    * overlapping on purpose so points hit 1-2 tiers). Planned as explode +
    * hash EQUI-join on the bucket id, not the BroadcastNestedLoopJoin a
    * bare inequality join gets; the oracle is the bare inequality join. */
  def q31RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val tiers = spark.range(12).select(
      col("id").as("tier"),
      (col("id") * 50000L).as("lo"),
      (col("id") * 50000L + 75000L).as("hi"))
    graft.operators.ScaleJoins.rangeJoinBucketed(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice")),
        tiers, "o_totalprice", "lo", "hi", width = 50000L)
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("sum_price"))
      .orderBy(col("tier"))
  }

  /** Bloom-filtered semi-join via graft.operators.ScaleJoins.bloomSemiJoin:
    * lineitems belonging to high-value orders. The small side's key sketch
    * is evaluated against the lineitem scan BEFORE any shuffle; false
    * positives are discharged by the exact semi-join, so the oracle is the
    * plain IN-subquery — the bloom must be result-neutral. */
  def q33BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    graft.operators.ScaleJoins.bloomSemiJoin(
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice")),
        hi, "l_orderkey", "o_orderkey",
        expectedItems = 100000L, fpp = 0.01)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), dsum("l_extendedprice").as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** Skew-safe equi-join via graft.operators.ScaleJoins.saltedEquiJoin:
    * lineitem ⋈ supplier on l_suppkey with the hot-key salt split. The
    * oracle is the plain equi-join — salting must be result-neutral. */
  def q32SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.operators.ScaleJoins.saltedEquiJoin(li, sup, "l_suppkey", nSalts = 8)
      .groupBy(col("s_name"))
      .agg(dsum("l_extendedprice").as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("s_name"))
  }

  /** Z-order (Morton) clustering key over (user_id, event_id) — the
    * multi-dimensional layout key `Layout.writeZOrdered` clusters files
    * by; declared at the key grain so the interleave arithmetic itself
    * sits under the hash gate (the file-pruning win is spec-proven in
    * LayoutSpec, where file statistics are observable). 20 bits covers
    * event_id at every shipped SF. */
  def q34Zorder(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        graft.operators.Layout.zValue(col("user_id"), col("event_id"), bits = 20).as("zval"))
      .orderBy(col("zval"), col("event_id"))

  /** The z-ordered store end to end: write events z-clustered on
    * (user_id, event_id), read it back through a 2-D box predicate —
    * the layout must be RESULT-NEUTRAL (the oracle is the same box over
    * the flat table); the pruning win itself is proven on file
    * statistics in LayoutSpec. Write is inside the query on purpose
    * (idempotent via Overwrite), mirroring emb_knn_store's store gate. */
  def q35ZorderScan(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_zorder_store_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    graft.operators.Layout.writeZOrdered(
      Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("value")),
      path, "user_id", "event_id", bits = 20, nFiles = 16)
    spark.read.parquet(path)
      .filter(col("user_id").between(4, 9) && col("event_id").between(100, 900))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
  }

  /** ClickHouse-windowFunnel analog: view → click → purchase within 6 h,
    * one groupBy + codegen'd DP fold (no join chain on the engine side;
    * the ORACLE is the join-chain formulation — two independent
    * formulations must agree). */
  def q36Funnel(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.windowFunnel(Tables.events(spark, dir),
      Seq("view", "click", "purchase"), windowMicros = 21600000000L)

  /** Non-overlapping chain completions per user (sequenceCount analog):
    * how many times each user ran the full view → click → purchase
    * sequence, disjoint matches, no time window. */
  def q46SeqCount(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.sequenceCount(Tables.events(spark, dir),
      Seq("view", "click", "purchase"))

  /** Cohort retention matrix (the ClickHouse retention-family analytic):
    * users cohorted by the ISO week of their first event; n_users active
    * at week offsets 0..3. Two bounded aggregations + one equi-join on
    * user_id — the (user, week) distinct set is the only corpus-sized
    * intermediate, and it is map-side combinable. */
  def q37Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val firstW = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
    val activeW = ev
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("w"))
      .distinct()
    activeW.join(firstW, Seq("user_id"))
      .select(col("cohort"),
        (datediff(col("w"), col("cohort")) / 7).cast("long").as("offset"))
      .filter(col("offset").between(0, 3))
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("offset"))
  }

  /** Fixed-width histogram (the width_bucket / ClickHouse-histogram
    * shape): 20 equal bins over [min, max] of events.value, per-bin
    * count and decimal-exact sum. Two passes, both map-side combinable:
    * a 1-row min/max aggregate broadcast back over the scan, then one
    * hash agg on the bin id. The bin arithmetic is single-rounded IEEE
    * subtract/divide/floor on an identical expression tree both
    * engines evaluate bit-identically (no libm); the top edge closes
    * the last bin via least(). */
  def q47Histogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("value"))
    val stats = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val nBins = 20
    val bin = least(
      floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / lit(nBins.toDouble))),
      lit(nBins - 1L)).as("bin")
    ev.crossJoin(broadcast(stats))
      .select(bin, col("value"), col("lo"), col("hi"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"),
        (min(col("lo")) + col("bin") * ((min(col("hi")) - min(col("lo"))) / lit(nBins.toDouble)))
          .as("bin_lo"))
      .orderBy(col("bin"))
  }

  /** Quantile-sketch gate, the ct_stats_approx treatment for
    * approx_percentile: the sketch VALUE is merge-order-dependent and
    * can never sit under a cross-engine hash, but its rank-error
    * GUARANTEE (|rank(a) − φN| ≤ εN for GK with ε = 1/accuracy) is a
    * deterministic fact — so the declared columns are the exact
    * interpolated median plus booleans asserting the guarantee via an
    * exact rank recount, and the oracle pins those booleans true.
    * (rank_lo: at least (φ−ε)N values ≤ a; rank_hi: fewer than (φ+ε)N
    * values strictly < a.) */
  def q38QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val eps = 0.01 // 1 / accuracy below
    val apx = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 100)").as("apx"))
    Tables.lineitem(spark, dir).as("li")
      // null-safe equality: GROUP BY keeps a NULL flag group, and its
      // sketch row must survive the re-join (plain = would drop it)
      .join(broadcast(apx).as("ax"), col("li.l_returnflag") <=> col("ax.l_returnflag"))
      .drop(col("ax.l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") <= col("apx"), 1L).otherwise(0L)).as("cnt_le"),
        sum(when(col("l_quantity") < col("apx"), 1L).otherwise(0L)).as("cnt_lt"),
        first(col("apx")).as("apx")) // group-constant; carried for the vacuous case
      .select(col("l_returnflag"), col("med_qty"), col("n"),
        // a group with NO non-null quantities has a NULL sketch value and
        // a vacuously-true accuracy guarantee — the oracle pins `true`
        when(col("apx").isNull, lit(true)).otherwise(
          col("cnt_le").cast("double") >= (lit(0.5) - lit(eps)) * col("n").cast("double"))
          .as("rank_lo"),
        when(col("apx").isNull, lit(true)).otherwise(
          col("cnt_lt").cast("double") < (lit(0.5) + lit(eps)) * col("n").cast("double"))
          .as("rank_hi"))
      .orderBy(col("l_returnflag"))
  }

  /** NTILE quantile bucketing — the remaining window shape (q6/q7/q18-q20
    * cover rank/running/nav/RANGE; NTILE's floor-division bucket split is
    * its own semantics). The ORDER BY carries event_id so the ordering is
    * total: NTILE over a tied prefix is engine-dependent otherwise. */
  def q39Ntile(spark: SparkSession, dir: String): DataFrame = {
    // asc_nulls_last: Spark's bare asc sorts NULLs FIRST, DuckDB's
    // default sorts them LAST — ntile bucket membership depends on it
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc_nulls_last, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("event_type"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy(col("event_type"), col("quartile"))
  }

  /** Skew-safe distinct aggregation under the hash gate: the two-stage
    * salted plan ([[graft.operators.SkewAgg.saltedDistinctCount]]) must be
    * bit-identical to the plain `count(DISTINCT)` the oracle runs. The
    * event_type keys each hold ~20 % of the table — exactly the
    * low-cardinality-key regime where the single-stage plan funnels every
    * row of a key through one reducer. */
  def q40SaltedDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SkewAgg
      .saltedDistinctCount(Tables.events(spark, dir), "event_type", "user_id")
      .orderBy(col("event_type"))

  /** SCD2 validity-interval construction: each user's purchase history
    * becomes versioned rows [valid_from, valid_to) with the open current
    * version pinned to Long.MaxValue — one keyed window pass (lead), no
    * self-join. Epoch-microsecond longs keep the hash comparison exact. */
  def q41Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("valid_from_us"),
        coalesce(unix_micros(col("next_ts")), lit(Long.MaxValue)).as("valid_to_us"),
        col("value"), col("next_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }

  /** Interval×interval overlap self-join (concurrent-validity pairs) via
    * the bucketed equi-join: one March-1995 week of orders, each open for
    * 3 days, paired when their windows overlap. The oracle is the naive
    * inequality join; the engine plan must never be the
    * BroadcastNestedLoopJoin that naive formulation implies. */
  def q42IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    def iv(p: String) = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between(lit("1995-03-01"), lit("1995-03-07")))
      .select(col("o_orderkey").as(s"${p}_key"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as(s"${p}_s"))
      .withColumn(s"${p}_e", col(s"${p}_s") + 3)
    graft.operators.ScaleJoins
      .intervalOverlapJoin(iv("a"), iv("b"), "a_s", "a_e", "b_s", "b_e", width = 4L)
      .filter(col("a_key") < col("b_key"))
      .select(col("a_key"), col("a_s"), col("a_e"),
        col("b_key"), col("b_s"), col("b_e"))
      .orderBy(col("a_key"), col("b_key"))
  }

  /** Warehouse MERGE under the hash gate: a deterministic change batch
    * (updates for keys ≡ 0 mod 7, tombstones for keys ≡ 0 mod 13, plus
    * two brand-new keys) applied to orders via one keyed window — the
    * oracle replays insert/update/delete resolution as SQL. */
  def q43MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + lit(10.0)).as("o_totalprice"),
        lit("U").as("o_orderstatus"))
      .withColumn("__v", lit(1L)).withColumn("__del", lit(false))
    val deletes = base.filter(col("o_orderkey") % 13 === 0)
      .withColumn("__v", lit(2L)).withColumn("__del", lit(true))
    val inserts = spark.range(2).select(
        (col("id") - 2L).as("o_orderkey"),
        lit(1.5).as("o_totalprice"), lit("N").as("o_orderstatus"))
      .withColumn("__v", lit(1L)).withColumn("__del", lit(false))
    graft.operators.Merge
      .mergeUpsert(base, updates.unionByName(deletes).unionByName(inserts),
        "o_orderkey", "__v", "__del")
      .orderBy(col("o_orderkey"))
  }

  /** percent_rank + cume_dist — the two relative-position window
    * functions q6/q19/q39 don't cover. Total ORDER BY (value, event_id)
    * makes rank = row_number, so both are exact integer ratios computed
    * identically by any engine. */
  def q44WindowDist(spark: SparkSession, dir: String): DataFrame = {
    // asc_nulls_last mirrors DuckDB's default null order (see q39)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc_nulls_last, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy(col("event_id"))
  }

  /** The bucketed co-located join under the hash gate: both sides are
    * written bucketed-by-custkey into the session catalog at query time
    * (the emb_knn_store pattern — the write IS part of the operator),
    * then joined with the sort-merge path pinned so the bucket layout —
    * not a broadcast — serves the join. ScaleJoinsSpec separately
    * asserts the plan has no Exchange; this row proves the layout
    * round-trips the data bit-exactly vs the plain-join oracle. */
  def q45BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    // per-process table names: two sessions sharing a warehouse must not
    // clobber each other's live bucketed tables mid-read
    val ordersT = graft.operators.ScaleJoins.sessionTable("q45_orders_b")
    val custT = graft.operators.ScaleJoins.sessionTable("q45_customer_b")
    graft.operators.ScaleJoins.writeBucketed(o, ordersT, "o_custkey", 8)
    graft.operators.ScaleJoins.writeBucketed(c, custT, "o_custkey", 8)
    graft.operators.ScaleJoins
      .bucketedJoin(spark, ordersT, custT, "o_custkey",
        hint = Some("merge"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** One-pass distributional statistics (Pearson correlation, sample
    * covariance, sample stddevs) computed from EXACT decimal power sums.
    * The 100 TB discipline: second moments must come from order-independent
    * exact partial aggregates (decimal sums merge associatively across any
    * partitioning), with the floating-point formula applied once to the
    * merged totals over a handful of group rows — never from incremental
    * double accumulators, whose low bits depend on partition merge order.
    * Both engines then evaluate the identical IEEE expression tree; the
    * final statistics are collapsed to float32 (the dBm25Sql idf
    * treatment) because decimal→double conversion of power sums whose
    * UNSCALED value exceeds 2^53 is double-rounding ambiguous across
    * engines (DuckDB converts int128 then divides by 10^scale; Spark
    * rounds the true value once — measured 1-ulp disagreement at
    * sf0.001), and the float collapse absorbs it. */
  def q48CorrStats(spark: SparkSession, dir: String): DataFrame = {
    val q = dec("l_quantity")
    val p = dec("l_extendedprice")
    val n = col("n").cast("double")
    // NULL on a zero denominator (single-row group, zero-variance group):
    // the shared cross-engine zero-division contract
    def safeDiv(a: Column, b: Column): Column =
      graft.functions.VectorFunctions.safeDiv(a, b)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("sq"),
        sum(p).cast("double").as("sp"),
        sum(q * p).cast("double").as("sqp"),
        sum(q * q).cast("double").as("sqq"),
        sum(p * p).cast("double").as("spp"))
      .select(
        col("l_returnflag"), col("n"),
        safeDiv(n * col("sqp") - col("sq") * col("sp"),
          sqrt(n * col("sqq") - col("sq") * col("sq")) *
            sqrt(n * col("spp") - col("sp") * col("sp")))
          .cast("float").as("corr_qty_price"),
        safeDiv(col("sqp") - col("sq") * col("sp") / n, n - lit(1.0))
          .cast("float").as("covar_qty_price"),
        sqrt(safeDiv(n * col("sqq") - col("sq") * col("sq"), n * (n - lit(1.0))))
          .cast("float").as("std_qty"),
        sqrt(safeDiv(n * col("spp") - col("sp") * col("sp"), n * (n - lit(1.0))))
          .cast("float").as("std_price"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q3 shape (shipping-priority): selective dim filter → broadcast,
    * two date-filtered fact scans, fact-fact shuffle join, grouped decimal
    * revenue, global top-10. The scale notes: the segment-filtered customer
    * side is a fifth of an already-small dim → broadcast (the orders fact
    * is never shuffled for it); both date predicates reach the parquet
    * scans as pushed filters; the final ORDER BY ... LIMIT is a
    * TakeOrderedAndProject (no global sort materialization). Full
    * tiebreaker (revenue, o_orderdate, l_orderkey) keeps the top-10
    * deterministic under the hash gate. */
  def q49TpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local-supplier volume): the 6-way star join whose
    * twist is the SECOND join path — the customer and the supplier must
    * share a nation (`c_nationkey = s_nationkey`), so the plan cannot
    * treat customer and supplier as independent dims. Shape for scale:
    * region→nation→supplier collapses to one tiny broadcast side (10k
    * rows per TPC-H SF ≪ either fact), carrying BOTH join keys
    * (s_suppkey for lineitem, s_nationkey for the customer correlation);
    * the only shuffles are the two genuinely-large ones, lineitem⋈orders
    * and ⋈customer, each on its natural key. The year predicate reaches
    * the orders parquet scan pushed; revenue is the q49 decimal contract
    * (order-free exact sum, one cast to double at the end). */
  def q57TpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val s = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val li = Tables.lineitem(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q18 shape (large-volume customers): a HAVING filter over a
    * full fact aggregation drives a semi-join back into the joins. Shape
    * for scale: the heavy-order set is the aggregate's OUTPUT after the
    * `> 300` filter — orders-of-magnitude smaller than lineitem (5 rows
    * at sf0.001, ~1.5M at TPC-H SF100k, ≈12 MB of longs) — so it
    * broadcasts into the orders join and the fact is never re-shuffled
    * for the membership test; the already-computed group sum rides along
    * instead of re-aggregating lineitem a second time as the textbook SQL
    * does. Decimal quantity sum (order-free); ORDER BY o_totalprice with
    * an o_orderkey tiebreaker keeps the top-100 hash-deterministic. */
  def q58TpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > lit(300).cast("decimal(18,2)"))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(heavy), o("o_orderkey") === heavy("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(c("c_name"), c("c_custkey"), o("o_orderkey"),
        o("o_orderdate"), o("o_totalprice"),
        col("sum_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q7 shape (volume shipping between two nations): the
    * double-dimension pattern — nation joins BOTH sides of the fact
    * chain (supplier's nation and customer's nation), each side filtered
    * to the two nations of interest BEFORE its broadcast, so the
    * fact-chain joins admit only candidate rows and the asymmetric pair
    * condition runs over an already-tiny frame. Shape for scale: the
    * only fact-sized work is the shipdate-filtered lineitem chain;
    * nation broadcasts are 2 rows each; revenue rides the DECIMAL sum
    * (order-free) and years group as exact integers. */
  def q70TpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    // the pair is a fixture-informed choice: these two nations trade at
    // every SF including sf0.001, so the gate is never vacuously 0-row
    val nations = Seq("NATION_18", "NATION_19")
    val n1 = Tables.nation(spark, dir).filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === nations(0) && col("cust_nation") === nations(1)) ||
        (col("supp_nation") === nations(1) && col("cust_nation") === nations(0)))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q10 shape (returned-item top customers): quarter-filtered
    * orders drive the lineitem join, the R-returnflag filter reaches the
    * fact scan, nation broadcasts, and the customer-grain aggregate
    * feeds a TakeOrdered top-20 — the "who should we call about
    * returns" report. Revenue on the DECIMAL sum; c_custkey tiebreaker
    * keeps the cut deterministic. */
  def q71TpchQ10(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Cohort retention matrix — the product-analytics staple: users
    * cohorted by their FIRST active day, activity counted per
    * (cohort_day, day_offset) cell. Shape for scale: the distinct
    * (user, day) grain is one map-side-combinable aggregate off the
    * scan; the per-user min is a second partial-aggregatable pass whose
    * output is user-grain (far below event grain); the join back is an
    * equi-join on user_id feeding the cell-grain count-distinct. No
    * window functions, no per-user collect — every stage is a hash
    * aggregate. */
  def q72Cohort(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Calendar gap-fill + forward fill — the time-series spine pattern
    * every feature pipeline needs: a sparse daily aggregate (high-value
    * events only, so real gaps exist at every SF) is joined onto the
    * DENSE day×type spine, missing counts become 0, and the last
    * observed daily sum carries forward via `last(_, ignoreNulls)` over
    * an ordered per-type window (leading nulls before the first
    * observation stay null — both engines agree). Scale shape: the only
    * fact-sized work is the filtered groupBy; the spine is |days|·|types|
    * rows (bounded metadata, broadcast), and the fill window partitions
    * by type over |days| rows — never fact-sized. Sum rides the
    * DECIMAL(18,2) contract; the fill only COPIES doubles, no
    * re-arithmetic, so forward-filled values stay bit-identical. */
  def q59GapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = ev.filter(col("value") > 250)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("day_sum"))
    val bounds = ev.agg(
      to_date(min(col("ts"))).as("mn"), to_date(max(col("ts"))).as("mx"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("day_sum"),
        last(col("day_sum"), ignoreNulls = true).over(w).as("filled_sum"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Pareto / ABC analysis — revenue share and running cumulative share
    * per nation with A/B/C classification at the 80/95 cuts. Shape for
    * scale: the fact-sized work is the one grouped join; the windows run
    * UNPARTITIONED but over the aggregate's OUTPUT (|nations| rows —
    * bounded dimension cardinality, the one case where a global window
    * is correct). All sums stay DECIMAL until a single double division;
    * the running frame carries a full (rev desc, n_name) tiebreak so the
    * cumulative share is order-deterministic under the hash gate. */
  def q60Pareto(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("o_totalprice")).as("rev"))
    val wTot = Window.partitionBy()
    val wCum = Window.orderBy(col("rev").desc, col("n_name"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.select(col("n_name"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") /
          sum(col("rev")).over(wTot).cast("double")).as("share"),
        (sum(col("rev")).over(wCum).cast("double") /
          sum(col("rev")).over(wTot).cast("double")).as("cum_share"))
      .withColumn("abc",
        when(col("cum_share") <= 0.8, "A")
          .when(col("cum_share") <= 0.95, "B").otherwise("C"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Median absolute deviation per group — the robust dispersion measure
    * outlier filters prefer over stddev (one wild value moves stddev, not
    * MAD). Two exact-percentile passes: per-group median, broadcast back
    * (a handful of rows), then the median of absolute deviations. Exact
    * `percentile` holds a per-group value-count map — right for grouped
    * medians over bounded-cardinality groups; an unbounded value space at
    * 100 TB takes the q38 sketch path instead, and MAD inherits whichever
    * percentile the scale demands. Doubles stay bit-identical because
    * both engines interpolate the same sorted sets (the q29 contract). */
  def q50Mad(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med_value"))
    ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        min(col("med_value")).as("med_value"),
        expr("percentile(abs(value - med_value), 0.5)").as("mad_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Incremental materialized-view maintenance (operators.AggState — the
    * aggregating-merge analog): the pre-split history's partial states are
    * materialized to parquet (the write is part of the query, idempotent
    * via Overwrite), read back, and merged with the increment's states —
    * the refresh never rescans history. The oracle is a full recompute
    * over the union: associative decimal states must make the delta-merge
    * view bit-identical to the from-scratch aggregate. */
  def q51MvIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.AggState
    val split = lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val ev = Tables.events(spark, dir)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_mv_state_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    AggState.dailyState(ev.filter(col("ts") < split))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    val stored = spark.read.parquet(path)
    val delta = AggState.dailyState(ev.filter(col("ts") >= split))
    AggState.finish(AggState.merge(stored, delta))
      .orderBy(col("day"), col("event_type"))
  }

  /** Mergeable-sketch materialized view: per-day DataSketches HLL states
    * (hll_sketch_agg) persisted to parquet as binary columns, then a
    * range query answered by UNIONING STATES (hll_union_agg) — never
    * rescanning raw history. The AggState pattern extended to the one
    * aggregate that isn't a plain monoid sum: distinct counting. At
    * 100 TB "distinct users over an arbitrary date range" from raw data
    * is a full shuffle per question; from day states it's a merge of
    * 365 × 16 KB sketches. Gate: the declared row carries the
    * oracle-computable exact count plus a within-2% boolean on the
    * sketch estimate (the ct_stats_approx treatment — lgK=14 standard
    * error ≈ 0.8%, so 2% is ~2.5σ), and the estimate itself must
    * survive the parquet round-trip and the union. */
  def q52SketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Date.valueOf("2024-01-08"))
    val hi = lit(java.sql.Date.valueOf("2024-01-22"))
    val ev = Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_hll_state_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("hll"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    val est = spark.read.parquet(path)
      .filter(col("day").between(lo, hi))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("est_users"))
    val exact = ev.filter(col("day").between(lo, hi))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.crossJoin(est).select(
      col("exact_users"),
      (abs(col("est_users") - col("exact_users")).cast("double") /
        col("exact_users") <= 0.02).as("users_within_tol"))
  }

  /** Moving median (exact percentile as a WINDOW aggregate over a 7-row
    * trailing frame) — the robust smoother for per-entity metric streams,
    * completing the window-function surface: nav (q18), rank (q19),
    * range frames (q20), distribution (q44), and now an exact
    * order-statistic frame. Per-user partitioning keeps frames small and
    * parallel at any scale; full (ts, event_id) tiebreak keeps the frame
    * contents — and therefore the interpolated median — deterministic. */
  def q54WindowMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-6, 0)
    Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), col("ts"), col("value"),
      expr("percentile(value, 0.5)").over(w).as("med7"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Wide→long melt via the native `Dataset.unpivot` operator (the
    * UNPIVOT relational shape), then a grouped decimal aggregate over the
    * long form. Unpivot is a zero-shuffle narrow map (each input row
    * emits one row per measure), so the only exchange in the plan is the
    * final 9-group aggregate — the shape long-format metric pipelines
    * rely on at any scale. */
  def q61Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), dsum("val").as("sum_val"))
      .orderBy(col("l_returnflag"), col("measure"))

  /** Min-cost supplier per part — the TPC-H Q2 argmin shape re-expressed
    * as aggregate + join-back (every supplier tied at the part's minimum
    * price survives, like Q2's correlated `= (SELECT min ...)`). The
    * grouped min and the join-back both shuffle on l_partkey, so AQE can
    * reuse the exchange; part (filtered, selective — pushdown reaches
    * the scan) and supplier broadcast. Price compares on DECIMAL(18,2)
    * so the equality is exact on both engines. */
  def q62MinCost(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), dec("l_extendedprice").as("pd"))
    val mp = li.groupBy(col("l_partkey")).agg(min(col("pd")).as("min_pd"))
    val pt = Tables.part(spark, dir).filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_name"))
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
    li.join(mp, Seq("l_partkey")).filter(col("pd") === col("min_pd"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("min_pd").cast("double").as("min_price"))
      .distinct()
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** Grouped ordered string aggregation (LISTAGG / string_agg): per
    * region, its nations joined into one comma-separated alphabetical
    * string. collect_list's arrival order is nondeterministic under
    * partial aggregation, so the sort happens INSIDE the group via
    * array_sort before the join — the only way a distributed listagg is
    * reproducible; the oracle's string_agg(... ORDER BY) pins the same
    * contract. */
  def q63Listagg(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_nations"),
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
      .orderBy(col("r_name"))

  /** Exponentially-weighted moving average per user — the classic
    * time-series smoother, in its 16-tap truncated adjusted form:
    * ewma_t = Σᵢ wᵢ·x_{t-i} / Σᵢ wᵢ over the available taps, wᵢ = 2^-(i+1)
    * (α = 0.5). Truncation at 16 taps drops < 2⁻¹⁶ of the weight and is
    * what makes the value EXACT: cents (≤ 17 bits) times dyadic weights
    * over a 2⁻¹⁶ common denominator never exceeds 53 significant bits, so
    * every intermediate is an exact binary fraction on any IEEE engine
    * and only the final normalize division rounds — once, identically.
    * The lag-chain is a single window pass (no self-joins), partitioned
    * by user so frames parallelize at any scale. */
  def q64Ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cents = (dec("value") * lit(100)).cast("long")
    val taps = 16
    val num = (0 until taps).map { i =>
      coalesce(lag(cents, i).over(w).cast("double") *
        lit(math.pow(0.5, i + 1)), lit(0.0))
    }.reduceLeft(_ + _)
    val den = (0 until taps).map { i =>
      when(lag(cents, i).over(w).isNotNull, lit(math.pow(0.5, i + 1)))
        .otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    // the smoother is a statement about VALUES: NULL-value events carry
    // no sample and are excluded on both engines (oracle WHERE mirrors)
    Tables.events(spark, dir).filter(col("value").isNotNull).select(
        col("user_id"), col("event_id"), col("ts"), col("value"),
        (num / den / lit(100.0)).as("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Recency feature: for every event, the time since the SAME user's
    * most recent prior 'purchase' (exact integer microseconds; null
    * before the first purchase) — the feature-engineering window shape
    * training pipelines derive per interaction. One window pass: a
    * conditional max over the unbounded-to-1-preceding frame, so the
    * prior-purchase scan never self-joins and partitions by user. */
  def q65EventAge(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tsUs = unix_micros(col("ts"))
    Tables.events(spark, dir).select(
        col("user_id"), col("event_id"), col("ts"), col("event_type"),
        (tsUs - max(when(col("event_type") === "purchase", tsUs)).over(w))
          .as("us_since_purchase"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Last-touch attribution: each purchase joined to the SAME user's most
    * recent prior click — argmax over the prior-events frame as a struct
    * max ((ts, id) lexicographic, so ties are total-ordered), null before
    * the first click. The marketing-attribution window shape: one pass,
    * no self-join, partitioned by user. */
  def q66Attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tsUs = unix_micros(col("ts"))
    Tables.events(spark, dir)
      .withColumn("lc", max(when(col("event_type") === "click",
        struct(tsUs.as("t"), col("event_id").as("id")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("lc.id").as("last_click_id"),
        (tsUs - col("lc.t")).as("us_since_click"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** First-touch attribution — q66's mirror: each purchase credited to
    * the user's EARLIEST preceding click (campaign-origin credit, where
    * last-touch gives conversion credit). Identical plan shape — one
    * struct-min window over the prefix frame, no self-join; the struct
    * order makes the (ts, event_id) pick total. */
  def q73FirstTouch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tsUs = unix_micros(col("ts"))
    Tables.events(spark, dir)
      .withColumn("fc", min(when(col("event_type") === "click",
        struct(tsUs.as("t"), col("event_id").as("id")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("fc.id").as("first_click_id"),
        (tsUs - col("fc.t")).as("us_since_first_click"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Robust per-type outliers via median absolute deviation — the
    * heavy-tail-safe cousin of the z-score anomaly family: an event is
    * flagged when |value − median| exceeds k · 1.4826 · MAD of its
    * event_type. Medians are EXACT percentiles (deterministic given the
    * sorted multiset, identical in both engines); the per-type model is
    * a handful of rows broadcast back over the scan. Two aggregate
    * passes (median, then MAD of residuals) + one broadcast join — the
    * exact-median passes are the gate-scale formulation; at 100 TB the
    * same shape runs on approx_percentile with a documented tolerance. */
  def q74MadOutliers(spark: SparkSession, dir: String,
      k: Double = 3.0): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    ev.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .filter(abs(col("value") - col("med")) > lit(k) * lit(1.4826) * col("mad"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("med"), col("mad"))
      .orderBy(col("event_id"))
  }

  /** Hour-of-day seasonality profile — the capacity-planning/anomaly
    * baseline: per (hour-of-day, event_type), event counts, distinct
    * actives, and the decimal-exact value sum. One map-side-combinable
    * aggregate over derived integer keys; 24×|types| bounded output. */
  def q78HourlyProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(hour(col("ts")).cast("long").as("hour_of_day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("hour_of_day"), col("event_type"))

  /** Winsorized per-type statistics — the outlier-robust cleaning step
    * (clip to [p05, p95], then aggregate) every metrics pipeline applies
    * before trusting a mean: exact interpolated percentiles per type
    * (bounded model, broadcast back over the scan), one least/greatest
    * clamp per row, and the clipped mean via the fixed-point
    * order-independent sum so partial-aggregation order cannot perturb
    * it. */
  def q77Winsorized(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quant
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.05)").as("lo"),
      expr("percentile(value, 0.95)").as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"), col("lo"), col("hi"),
        least(greatest(col("value"), col("lo")), col("hi")).as("cv"))
      .groupBy(col("event_type"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        (Quant.q9ToDouble(sum(Quant.quant9(col("cv")))) /
          count(lit(1)).cast("double")).as("winsorized_mean"))
      .select(col("event_type"), col("lo"), col("hi"), col("n"),
        col("winsorized_mean"))
      .orderBy(col("event_type"))
  }

  /** User-spend decile report: per-user purchase totals (decimal-exact)
    * cut into 10 equal-count buckets ordered by (total desc, user_id) —
    * the tiebreaker makes the SQL ntile's remainder placement identical
    * on both engines — then a bounded per-decile rollup (share of total
    * spend per decile, one IEEE division against the scalar grand
    * total). User grain, never event grain, past the first aggregate.
    *
    * The buckets come from [[graft.operators.Ranks.ntileByKeyDesc]] —
    * the distributed prefix-sum rank with exact ntile arithmetic — NOT
    * from `ntile(10).over(Window.orderBy(...))`: an unpartitioned ntile
    * window moves every per-user row through ONE task, a single-machine
    * wall at 100 TB user counts (the oracle's single-window SQL is the
    * semantic spec; Ranks reproduces it hash-exactly). */
  // q76's cached user-grain frame: one slot, released on the next build.
  // The returned DataFrame is lazy, so there is no in-function point
  // where unpersist is safe; holding exactly one cached frame bounds
  // retention at a single user-grain aggregate per session (bench's
  // per-query clearCache() also clears it), instead of leaking one per
  // invocation in a long-lived service.
  private var q76Cached: Option[DataFrame] = None

  def q76SpendDeciles(spark: SparkSession, dir: String): DataFrame = {
    // Persisted at the CALLER per the Ranks contract: the rank's three
    // passes (quantiles, range totals, output) plus the grand-total
    // scalar would otherwise re-run the event-grain scan+filter+agg
    // 4× — at 100 TB that is 4 fact-table scans to rank a user-grain
    // frame ~10^4× smaller. Caching the small side once is the same
    // economics as an AQE-materialized stage; values are unaffected.
    val perUser = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized {
      q76Cached.foreach(_.unpersist(false))
      q76Cached = Some(perUser)
    }
    val tot = perUser.agg(sum(col("total")).as("grand"))
    graft.operators.Ranks
      .ntileByKeyDesc(perUser, "total", "user_id", tiles = 10, outCol = "decile")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("total")).cast("double").as("spend"))
      .crossJoin(broadcast(tot))
      .withColumn("spend_share", col("spend") / col("grand").cast("double"))
      .select(col("decile"), col("n_users"), col("spend"), col("spend_share"))
      .orderBy(col("decile"))
  }

  /** Session-grain conversion rate — the composite of sessionization and
    * funnel analytics every growth dashboard runs: gap-based sessions
    * (30 min, q26's break rule), each session marked converted iff it
    * contains a purchase, rolled up to (session-start day) grain with
    * exact integer counts and ONE IEEE division for the rate. Plan: the
    * per-user lag + running-sum windows (one shuffle on user_id), a
    * session-grain aggregate, a day-grain aggregate — no self-joins, and
    * session rows never leave their user partition until the bounded
    * day rollup. */
  def q75SessionConversion(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // strict >: a gap of EXACTLY the threshold still belongs to the same
    // session — session_window's empirically-pinned inclusive-gap merge,
    // which every session oracle in this repo now mirrors
    val newS = when(unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(wOrd)) > 1800000000L, 1)
      .when(lag(col("ts"), 1).over(wOrd).isNull, 1)
      .otherwise(0)
    val sessions = Tables.events(spark, dir)
      .withColumn("new_s", newS)
      .withColumn("sid", sum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(to_date(min(col("ts"))).as("day"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
    sessions.groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conversion_rate",
        col("n_converted").cast("double") / col("n_sessions").cast("double"))
      .orderBy(col("day"))
  }

  /** TPC-H Q22 shape, lapsed-customer variant: customers holding an
    * above-(positive-)average balance with NO order in 1998 H1 — scalar
    * aggregate broadcast as a cross join, anti-join against the
    * date-filtered orders (the filter pushes to the scan, so the
    * anti-join's build side is the window's orders, not history), grouped
    * decimal totals. The average divides exact decimal sum by exact count
    * AS DOUBLES (one IEEE division, identical on both engines) rather
    * than trusting engine-specific decimal-division scale rules. (Every
    * customer in this testdata orders over the full span, so Q22's
    * never-ordered form is vacuous here; the windowed form is the same
    * plan shape and the one retention analyses actually run.) */
  def q67TpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec("c_acctbal")).cast("double") /
        count(lit(1)).cast("double")).as("avg_bal"))
    val h1Orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-07-01 00:00:00")))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(h1Orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum("c_acctbal").as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Rolling 7-day distinct actives (DAU/WAU + stickiness) — COUNT
    * DISTINCT over a sliding window, which no engine supports as a window
    * function directly. The scalable idiom: reduce to distinct
    * (user, day) activity first (the corpus-sized dedup, one shuffle),
    * then explode each activity to the ≤7 observation days it keeps the
    * user active for — a BOUNDED ×7 row multiplier on the already-deduped
    * set, not on raw events — and a grouped distinct per observation day.
    * A naive per-day self-join over the window would rescan events 7×;
    * this shape scans once and its multiplier rides on |user×day|, which
    * is what stays small at 100 TB. */
  def q69RollingActive(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = act.select(col("day")).distinct()
    val wau = act
      .select(explode(sequence(lit(0), lit(6))).as("i"), col("day"), col("user_id"))
      .select(date_add(col("day"), col("i")).as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    val dau = act.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    days.join(dau, Seq("day")).join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
      .orderBy(col("day"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_rolling_active" -> (q69RollingActive _),
    "q66_attribution" -> (q66Attribution _),
    "q73_first_touch" -> (q73FirstTouch _),
    "q74_mad_outliers" -> (q74MadOutliers(_, _)),
    "q75_session_conversion" -> (q75SessionConversion _),
    "q76_spend_deciles" -> (q76SpendDeciles _),
    "q77_winsorized" -> (q77Winsorized _),
    "q78_hourly_profile" -> (q78HourlyProfile _),
    "q67_tpch_q22" -> (q67TpchQ22 _),
    "q64_ewma" -> (q64Ewma _),
    "q65_event_age" -> (q65EventAge _),
    "q61_unpivot" -> (q61Unpivot _),
    "q62_min_cost" -> (q62MinCost _),
    "q63_listagg" -> (q63Listagg _),
    "q54_window_median" -> (q54WindowMedian _),
    "q52_sketch_union" -> (q52SketchUnion _),
    "q51_mv_incremental" -> (q51MvIncremental _),
    "q50_mad" -> (q50Mad _),
    "q49_tpch_q3" -> (q49TpchQ3 _),
    "q57_tpch_q5" -> (q57TpchQ5 _),
    "q70_tpch_q7" -> (q70TpchQ7 _),
    "q71_tpch_q10" -> (q71TpchQ10 _),
    "q72_cohort" -> (q72Cohort _),
    "q58_tpch_q18" -> (q58TpchQ18 _),
    "q59_gap_fill" -> (q59GapFill _),
    "q60_pareto" -> (q60Pareto _),
    "q48_corr_stats" -> (q48CorrStats _),
    "q47_histogram" -> (q47Histogram _),
    "q46_seq_count" -> (q46SeqCount _),
    "q45_bucketed_join" -> (q45BucketedJoin _),
    "q44_window_dist" -> (q44WindowDist _),
    "q43_merge_upsert" -> (q43MergeUpsert _),
    "q42_interval_join" -> (q42IntervalJoin _),
    "q39_ntile" -> (q39Ntile _),
    "q40_salted_distinct" -> (q40SaltedDistinct _),
    "q41_scd2" -> (q41Scd2 _),
    "q38_quantile_sketch" -> (q38QuantileSketch _),
    "q37_retention" -> (q37Retention _),
    "q36_funnel" -> (q36Funnel _),
    "q35_zorder_scan" -> (q35ZorderScan _),
    "q34_zorder" -> (q34Zorder _),
    "q17_json" -> (q17Json _),
    "q26_sessions" -> (q26Sessions _),
    "q27_pivot" -> (q27Pivot _),
    "q28_sql" -> (q28Sql _),
    "q55_scalar_subquery" -> (q55ScalarSubquery _),
    "q29_percentile" -> ((s: SparkSession, dir: String) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          expr("percentile(l_discount, 0.25)").as("p25_disc"))
        .orderBy(col("l_returnflag"))),
    "q18_window_nav" -> (q18WindowNav _),
    "q19_window_rank" -> (q19WindowRank _),
    "q20_range_frame" -> (q20RangeFrame _),
    "q21_cube" -> (q21Cube _),
    "q22_grouping_sets" -> (q22GroupingSets _),
    "q23_distinct_agg" -> (q23DistinctAgg _),
    "q30_asof" -> (q30Asof _),
    "q24_cond_agg" -> (q24CondAgg _),
    "q25_array_ops" -> (q25ArrayOps _),
    "q1_agg" -> (q1Agg _),
    "q2_join_broadcast" -> (q2JoinBroadcast _),
    "q3_join_large" -> (q3JoinLarge _),
    "q4_semi_join" -> (q4SemiJoin _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_window_topn" -> (q6WindowTopn _),
    "q7_window_running" -> (q7WindowRunning _),
    "q8_union" -> (q8Union _),
    "q9_intersect" -> (q9Intersect _),
    "q10_except" -> (q10Except _),
    "q11_rollup" -> (q11Rollup _),
    "q12_topk" -> (q12Topk _),
    "q13_distinct" -> (q13Distinct _),
    "q14_explode_tokens" -> (q14ExplodeTokens _),
    "q15_events_per_day" -> (q15EventsPerDay _),
    "q16_above_avg" -> (q16AboveAvg _),
    "q31_range_join" -> (q31RangeJoin _),
    "q32_salted_join" -> (q32SaltedJoin _),
    "q33_bloom_join" -> (q33BloomJoin _)
  )

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1995-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // windowed distinct via the bounded day-explode idiom over deduped
    // (user, day) activity — observation days restricted to observed days
    "q69_rolling_active" ->
      """WITH act AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM act),
        |expd AS (SELECT day + i.i::INTEGER AS day, user_id FROM act, range(7) i(i)),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM expd GROUP BY day),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM act GROUP BY day)
        |SELECT d.day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM days d JOIN dau USING (day) JOIN wau USING (day)
        |ORDER BY day""".stripMargin,

    // last-touch attribution: named-struct max is lexicographic by field
    // order on both engines, so (t, id) gives the latest prior click with
    // a total-order tiebreak
    "q66_attribution" ->
      """WITH a AS (SELECT user_id, event_id, ts, event_type,
        |    max(CASE WHEN event_type = 'click'
        |             THEN {'t': epoch_us(ts), 'id': event_id} END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
        |  FROM events)
        |SELECT user_id, event_id, ts, lc.id AS last_click_id,
        |  epoch_us(ts) - lc.t AS us_since_click
        |FROM a WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    "q73_first_touch" ->
      """WITH a AS (SELECT user_id, event_id, ts, event_type,
        |    min(CASE WHEN event_type = 'click'
        |             THEN {'t': epoch_us(ts), 'id': event_id} END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fc
        |  FROM events)
        |SELECT user_id, event_id, ts, fc.id AS first_click_id,
        |  epoch_us(ts) - fc.t AS us_since_first_click
        |FROM a WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    // exact medians (DuckDB median == percentile_cont(0.5) on doubles,
    // Spark percentile likewise interpolates the sorted multiset), one
    // IEEE compare per row
    "q74_mad_outliers" ->
      """WITH m AS (SELECT event_type, median(value) AS med
        |  FROM events GROUP BY event_type),
        |d AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad
        |  FROM events e JOIN m USING (event_type) GROUP BY e.event_type)
        |SELECT e.event_id, e.user_id, e.event_type, e.value, m.med, d.mad
        |FROM events e JOIN m USING (event_type) JOIN d USING (event_type)
        |WHERE abs(e.value - m.med) > 3.0 * 1.4826 * d.mad
        |ORDER BY e.event_id""".stripMargin,

    "q78_hourly_profile" ->
      """SELECT hour(ts)::BIGINT AS hour_of_day, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_of_day, event_type""".stripMargin,

    // quantile_cont == Spark's interpolated percentile (the q29 mapping);
    // the clipped mean rides the fixed-point order-free sum
    "q77_winsorized" ->
      """WITH b AS (SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type),
        |c AS (SELECT e.event_type, b.lo, b.hi,
        |    least(greatest(e.value, b.lo), b.hi) AS cv
        |  FROM events e JOIN b USING (event_type))
        |SELECT event_type, lo, hi, count(*) AS n,
        |  CAST(sum(CAST(floor(cv * 1000000000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
        |    / 1000000000.0 / CAST(count(*) AS DOUBLE) AS winsorized_mean
        |FROM c GROUP BY event_type, lo, hi ORDER BY event_type""".stripMargin,

    // ntile with a total order (total desc, user_id) so remainder
    // placement matches; decimal user totals, one division per decile row
    "q76_spend_deciles" ->
      """WITH pu AS (SELECT user_id,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |dk AS (SELECT user_id, total,
        |    ntile(10) OVER (ORDER BY total DESC, user_id) AS decile FROM pu),
        |g AS (SELECT decile, count(*) AS n_users,
        |    CAST(sum(total) AS DOUBLE) AS spend FROM dk GROUP BY decile),
        |t AS (SELECT CAST(sum(total) AS DOUBLE) AS grand FROM pu)
        |SELECT decile, n_users, spend, spend / grand AS spend_share
        |FROM g, t ORDER BY decile""".stripMargin,

    // q26's gaps-and-islands break rule — strict `>`: a gap of EXACTLY
    // 30 min MERGES (matches session_window's inclusive-gap semantics;
    // do not "fix" back to >=, that reintroduces the cross-engine
    // divergence the hostile gate caught) — session-grain converted
    // flag, day rollup with exact integer counts and one IEEE division
    "q75_session_conversion" ->
      """WITH d AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d),
        |g AS (
        |  SELECT user_id, sid, CAST(min(ts) AS DATE) AS day,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |      AS converted
        |  FROM s GROUP BY user_id, sid)
        |SELECT day, count(*) AS n_sessions, sum(converted)::BIGINT AS n_converted,
        |  CAST(sum(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS conversion_rate
        |FROM g GROUP BY day ORDER BY day""".stripMargin,

    // Q22 lapsed-customer shape: positive-average balance via exact
    // decimal sum / exact count (single IEEE division), anti-join against
    // the 1998-H1 order window
    "q67_tpch_q22" ->
      """WITH ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, ab
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // 16-tap dyadic-weight EWMA: every intermediate is an exact binary
    // fraction (see q64Ewma), so the lag-chain is engine-portable; the
    // weight literals are exact decimal spellings of 2^-(i+1)
    "q64_ewma" -> {
      val taps = 16
      // ::DOUBLE on every weight literal: DuckDB types a bare decimal
      // literal as DECIMAL (E-notation as DOUBLE), so without the cast
      // the lag-chain silently mixes decimal and double arithmetic and
      // the final double conversion can land one ulp away from the
      // engine's all-double fold (surfaced by the adversarial gate)
      val num = (0 until taps).map(i =>
        s"coalesce(lag(cents, $i) OVER w * ${math.pow(0.5, i + 1)}::DOUBLE, 0)")
        .mkString(" + ")
      val den = (0 until taps).map(i =>
        s"CASE WHEN lag(cents, $i) OVER w IS NOT NULL THEN ${math.pow(0.5, i + 1)}::DOUBLE ELSE 0 END")
        .mkString(" + ")
      s"""WITH c AS (SELECT user_id, event_id, ts, value,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL)
         |SELECT user_id, event_id, ts, value, ($num) / ($den) / 100.0 AS ewma
         |FROM c
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    // recency feature: conditional max over the prior-events frame,
    // exact integer microseconds (null before the first purchase)
    "q65_event_age" ->
      """SELECT user_id, event_id, ts, event_type,
        |  epoch_us(ts) - max(CASE WHEN event_type = 'purchase'
        |                          THEN epoch_us(ts) END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS us_since_purchase
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    // long-form melt: UNION ALL reproduces unpivot's row-per-measure
    // semantics exactly (measure strings = the Spark column names)
    "q61_unpivot" ->
      """WITH u AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
        |SELECT l_returnflag, measure, count(*) AS n,
        |  CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM u GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin,

    // TPC-H Q2 argmin shape: grouped min + join-back keeps every tied
    // supplier, DECIMAL equality is exact on both engines
    "q62_min_cost" ->
      """WITH mp AS (SELECT l_partkey,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_pd
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
        |  CAST(mp.min_pd AS DOUBLE) AS min_price
        |FROM lineitem l
        |JOIN mp ON l.l_partkey = mp.l_partkey
        |  AND CAST(l.l_extendedprice AS DECIMAL(18,2)) = mp.min_pd
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size <= 5
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin,

    // grouped ordered listagg — ORDER BY inside the aggregate pins the
    // same alphabetical contract as the Spark side's in-group array_sort
    "q63_listagg" ->
      """SELECT r_name, count(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // the plain join — the bucketed catalog round-trip must reproduce it
    "q45_bucketed_join" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q44_window_dist" ->
      """SELECT event_id, event_type,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY "value", event_id)
        |ORDER BY event_id""".stripMargin,

    "q43_merge_upsert" ->
      """WITH mu_all AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, 0 AS v, false AS del FROM orders
        |  UNION ALL SELECT o_orderkey, o_totalprice + 10.0, 'U', 1, false
        |    FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL SELECT o_orderkey, o_totalprice, o_orderstatus, 2, true
        |    FROM orders WHERE o_orderkey % 13 = 0
        |  UNION ALL SELECT * FROM (VALUES (-2, 1.5, 'N', 1, false), (-1, 1.5, 'N', 1, false))),
        |mu_r AS (SELECT *, row_number() OVER (
        |    PARTITION BY o_orderkey ORDER BY v DESC) AS rn FROM mu_all)
        |SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM mu_r WHERE rn = 1 AND NOT del ORDER BY o_orderkey""".stripMargin,

    // the naive inequality formulation — the bucketed plan must match it
    "q42_interval_join" ->
      """WITH iv AS (SELECT o_orderkey AS k,
        |    date_diff('day', DATE '1995-01-01', o_orderdate)::BIGINT AS s
        |  FROM orders
        |  WHERE o_orderdate BETWEEN TIMESTAMP '1995-03-01 00:00:00'
        |    AND TIMESTAMP '1995-03-07 00:00:00')
        |SELECT a.k AS a_key, a.s AS a_s, a.s + 3 AS a_e,
        |  b.k AS b_key, b.s AS b_s, b.s + 3 AS b_e
        |FROM iv a JOIN iv b
        |  ON a.k < b.k AND a.s <= b.s + 3 AND b.s <= a.s + 3
        |ORDER BY a_key, b_key""".stripMargin,

    "q39_ntile" ->
      """WITH q AS (SELECT event_type, "value",
        |    ntile(4) OVER (PARTITION BY event_type ORDER BY "value", event_id) AS quartile
        |  FROM events)
        |SELECT event_type, quartile::BIGINT AS quartile, count(*)::BIGINT AS n,
        |  min("value") AS min_v, max("value") AS max_v
        |FROM q GROUP BY event_type, quartile ORDER BY event_type, quartile""".stripMargin,

    // the oracle is the PLAIN single-stage aggregation — the salted
    // two-stage plan must reproduce it exactly
    "q40_salted_distinct" ->
      """SELECT event_type, count(*)::BIGINT AS n_rows,
        |  count(DISTINCT user_id)::BIGINT AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q41_scd2" ->
      """SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
        |  coalesce(epoch_us(lead(ts, 1) OVER w), 9223372036854775807) AS valid_to_us,
        |  "value", (lead(ts, 1) OVER w IS NULL) AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    // the sketch value never leaves the Spark side; the oracle pins the
    // exact median and the guarantee booleans
    "q38_quantile_sketch" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty,
        |  count(*)::BIGINT AS n, true AS rank_lo, true AS rank_hi
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q37_retention" ->
      """WITH rf AS (SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort
        |  FROM events GROUP BY 1),
        |ra AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS w FROM events)
        |SELECT f.cohort, (date_diff('day', f.cohort, a.w) // 7)::BIGINT AS "offset",
        |  count(*)::BIGINT AS n_users
        |FROM ra a JOIN rf f USING (user_id)
        |WHERE date_diff('day', f.cohort, a.w) // 7 BETWEEN 0 AND 3
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same sorted sets → same interpolation (the q29 quantile_cont
    // contract), deviations derived by identical IEEE subtract/abs
    "q50_mad" ->
      """WITH mmed AS (
        |  SELECT event_type, quantile_cont("value", 0.5) AS med_value
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, min(m.med_value) AS med_value,
        |  quantile_cont(abs(e."value" - m.med_value), 0.5) AS mad_value,
        |  count(*) AS n
        |FROM events e JOIN mmed m ON e.event_type = m.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // same 7-row frames (full tiebreak) → same sorted sets → same
    // interpolation (the q29 quantile_cont contract, framed)
    "q54_window_median" ->
      """SELECT user_id, event_id, ts, "value",
        |  quantile_cont("value", 0.5) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    // oracle pins the exact count and the tolerance boolean to true: if
    // the sketch union drifts past 2%, Spark's boolean flips and the
    // hash gate fails (the ct_stats_approx treatment)
    "q52_sketch_union" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  true AS users_within_tol
        |FROM events
        |WHERE ts::DATE BETWEEN DATE '2024-01-08' AND DATE '2024-01-22'""".stripMargin,

    // full recompute over the union — the delta-merged view must match it
    "q51_mv_incremental" ->
      """SELECT ts::DATE AS day, event_type, count(*) AS n,
        |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // exact decimal power sums cast to double, then the identical IEEE
    // formula tree in both engines (see q48CorrStats scaladoc)
    "q48_corr_stats" ->
      """WITH cs AS (SELECT l_returnflag,
        |  count(*)::BIGINT AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp
        |FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST((CAST(n AS DOUBLE)*sqp - sq*sp) /
        |    (sqrt(CAST(n AS DOUBLE)*sqq - sq*sq) * sqrt(CAST(n AS DOUBLE)*spp - sp*sp)) AS FLOAT) AS corr_qty_price,
        |  CAST((sqp - sq*sp/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS FLOAT) AS covar_qty_price,
        |  CAST(sqrt((CAST(n AS DOUBLE)*sqq - sq*sq) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0))) AS FLOAT) AS std_qty,
        |  CAST(sqrt((CAST(n AS DOUBLE)*spp - sp*sp) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0))) AS FLOAT) AS std_price
        |FROM cs ORDER BY l_returnflag""".stripMargin,

    "q49_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q57_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q70_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year, l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q72_cohort" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT c.cohort_day, (a.day - c.cohort_day)::BIGINT AS day_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q71_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q58_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300) h
        |  ON o_orderkey = h.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    // forward fill copies doubles (no re-arithmetic): IGNORE NULLS
    // last_value over the identical frame on both engines
    "q59_gap_fill" ->
      """WITH gb AS (SELECT CAST(min(ts) AS DATE) AS mn, CAST(max(ts) AS DATE) AS mx FROM events),
        |gt AS (SELECT DISTINCT event_type FROM events),
        |gs AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
        |       FROM gt, gb),
        |gd AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*)::BIGINT AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_sum
        |       FROM events WHERE value > 250 GROUP BY 1, 2)
        |SELECT gs.day, gs.event_type, coalesce(gd.n, 0)::BIGINT AS n, gd.day_sum,
        |  last_value(gd.day_sum IGNORE NULLS) OVER (
        |    PARTITION BY gs.event_type ORDER BY gs.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        |FROM gs LEFT JOIN gd ON gs.day = gd.day AND gs.event_type = gd.event_type
        |ORDER BY gs.day, gs.event_type""".stripMargin,

    "q60_pareto" ->
      """WITH pr AS (SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |ps AS (SELECT n_name, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE) AS share,
        |  CAST(sum(rev) OVER (ORDER BY rev DESC, n_name
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(sum(rev) OVER () AS DOUBLE) AS cum_share
        |  FROM pr)
        |SELECT n_name, revenue, share, cum_share,
        |  CASE WHEN cum_share <= 0.8 THEN 'A'
        |       WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc
        |FROM ps ORDER BY revenue DESC, n_name""".stripMargin,

    // identical IEEE expression tree for the bin id and edge (subtract/
    // divide/floor only — single-rounded, engine-portable)
    "q47_histogram" ->
      """WITH hs AS (SELECT min("value") AS lo, max("value") AS hi FROM events),
        |hb AS (SELECT least(floor(("value" - lo) / ((hi - lo) / 20.0)), 19)::BIGINT AS bin,
        |         "value", lo, hi
        |       FROM events, hs)
        |SELECT bin, count(*) AS n,
        |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(lo) + bin * ((min(hi) - min(lo)) / 20.0) AS bin_lo
        |FROM hb GROUP BY bin ORDER BY bin""".stripMargin,

    // the greedy state machine replayed as a recursive CTE: all users
    // advance one (t, s)-ordered event per iteration; cnt is monotone so
    // the terminal state is max(cnt). Deliberately NOT list_reduce:
    // DuckDB 1.0's vectorized list_reduce returned wrong folds for a
    // strict subset of groups (measured here twice — user 20 at sf0.01
    // folded to 6 vs 7 by hand over the identical list with list-typed
    // state; users 7/14 at sf0.001 got each other's counts with scalar
    // state) — an engine bug the oracle must not depend on
    "q46_seq_count" ->
      """WITH RECURSIVE sq AS (SELECT user_id, epoch_us(ts) AS t,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 END AS s
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |sqo AS (SELECT user_id, s,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t, s) AS rn FROM sq),
        |fold(user_id, rn, st, cnt) AS (
        |  SELECT user_id, 0, 0, 0::BIGINT FROM (SELECT DISTINCT user_id FROM sqo)
        |  UNION ALL
        |  SELECT f.user_id, f.rn + 1,
        |    CASE WHEN o.s = f.st + 1
        |         THEN CASE WHEN f.st + 1 = 3 THEN 0 ELSE f.st + 1 END
        |         ELSE f.st END,
        |    CASE WHEN o.s = f.st + 1 AND f.st + 1 = 3 THEN f.cnt + 1 ELSE f.cnt END
        |  FROM fold f JOIN sqo o ON o.user_id = f.user_id AND o.rn = f.rn + 1)
        |SELECT user_id, max(cnt) AS n_matches FROM fold
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // join-chain funnel: stage-2 chains keep min(click ts) per (user, t0)
    // — earliest second-stage event maximizes stage-3 feasibility, so the
    // greedy min is exact; the Spark side is an unrelated DP fold
    "q36_funnel" ->
      """WITH ff AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |f1 AS (SELECT user_id, t AS t0 FROM ff WHERE et = 'view'),
        |f2 AS (SELECT a.user_id, a.t0, min(b.t) AS t2 FROM f1 a JOIN ff b
        |  ON a.user_id = b.user_id AND b.et = 'click'
        |  AND b.t >= a.t0 AND b.t <= a.t0 + 21600000000 GROUP BY 1, 2),
        |f3 AS (SELECT DISTINCT a.user_id FROM f2 a JOIN ff c
        |  ON a.user_id = c.user_id AND c.et = 'purchase'
        |  AND c.t >= a.t2 AND c.t <= a.t0 + 21600000000),
        |fu AS (SELECT DISTINCT user_id FROM ff)
        |SELECT fu.user_id,
        |  (CASE WHEN fu.user_id IN (SELECT user_id FROM f3) THEN 3
        |        WHEN fu.user_id IN (SELECT user_id FROM f2) THEN 2
        |        WHEN fu.user_id IN (SELECT user_id FROM f1) THEN 1
        |        ELSE 0 END)::BIGINT AS funnel_stage
        |FROM fu ORDER BY fu.user_id""".stripMargin,

    "q35_zorder_scan" ->
      """SELECT event_id, user_id, "value"
        |FROM events
        |WHERE user_id BETWEEN 4 AND 9 AND event_id BETWEEN 100 AND 900
        |ORDER BY event_id""".stripMargin,

    // generated from the same bit-interleave loop as Layout.zValue
    "q34_zorder" ->
      s"""SELECT event_id, user_id,
         |  ${graft.operators.Layout.zValueSql("user_id", "event_id", 20)} AS zval
         |FROM events ORDER BY zval, event_id""".stripMargin,
    "q1_agg" -> q1AggSql,
    "q17_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN json_valid(props)
        |    THEN json_extract_string(props, '$.k') END AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(CASE WHEN json_valid(props)
        |    THEN json_extract_string(props, '$.k') END AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q27_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q28_sql" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // scalar correlated subqueries decorrelate to outer-join aggregates;
    // empty groups: count = 0, max = NULL, identical on both engines
    "q55_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,
    // Spark's exact interpolated percentile and DuckDB's quantile_cont share
    // the same linear-interpolation definition → bit-identical doubles.
    "q29_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
        |  quantile_cont(l_discount, 0.25) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q26_sessions" ->
      """WITH d AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, min(ts) AS s_start, max(ts) AS s_end, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
    "q18_window_nav" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q19_window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,
    "q20_range_frame" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_returnflag ORDER BY l_quantity
        |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,
    "q21_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q22_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q30_asof" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |amatch AS (SELECT c.event_id, c.user_id, c.ts,
        |  (SELECT max(p.ts) FROM purch p WHERE p.user_id = c.user_id AND p.ts <= c.ts) AS p_ts
        |  FROM clicks c)
        |SELECT a.event_id, a.user_id, a.ts, a.p_ts,
        |  (SELECT max(p2.event_id) FROM purch p2 WHERE p2.user_id = a.user_id AND p2.ts = a.p_ts) AS p_event_id
        |FROM amatch a ORDER BY a.event_id""".stripMargin,
    "q23_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_cond_agg" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_returned,
        |  CAST(sum(CASE WHEN l_returnflag <> 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_kept,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q25_array_ops" ->
      """SELECT label, count(*) AS n,
        |  min(embedding[1]::DOUBLE) AS min_e0, max(embedding[1]::DOUBLE) AS max_e0,
        |  CAST(max(len(embedding)) AS BIGINT) AS dims
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q2_join_broadcast" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q3_join_large" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q6_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q7_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 20
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q8_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q9_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q10_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0
        |ORDER BY custkey""".stripMargin,
    "q11_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q12_topk" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,
    "q13_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q14_explode_tokens" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin,
    "q15_events_per_day" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin,
    "q16_above_avg" ->
      """SELECT p_partkey, p_retailprice
        |FROM part CROSS JOIN (
        |  SELECT sum(CAST(p_retailprice AS DECIMAL(18,2))) AS total, count(*) AS cnt
        |  FROM part) s
        |WHERE CAST(p_retailprice AS DECIMAL(18,2)) * cnt > total
        |ORDER BY p_partkey""".stripMargin,
    // the bare inequality join — what rangeJoinBucketed must reproduce
    "q31_range_join" ->
      """SELECT tier, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN (
        |  SELECT r AS tier, r*50000 AS lo, r*50000+75000 AS hi FROM range(12) t(r)) i
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    // the plain equi-join — salting must be result-neutral
    "q32_salted_join" ->
      """SELECT s_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    // the plain IN-subquery semi-join — the bloom prefilter must be
    // result-neutral (false positives discharged by the exact join)
    "q33_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
