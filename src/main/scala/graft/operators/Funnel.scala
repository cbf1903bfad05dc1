package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — the ClickHouse `windowFunnel` analog: per user, the
  * deepest stage k such that events matching stage types 1..k occur in
  * non-decreasing time order, all within `windowMicros` of the chain's
  * first event. ("view → click → purchase within an hour".)
  *
  * Engine shape: ONE shuffle (the per-user groupBy) — events are
  * filtered to the funnel's types at the scan (the predicate reaches the
  * parquet scan, so the shuffle carries only relevant rows), collected
  * per user as (ts, stage) pairs, sorted, and folded by the native
  * WindowFunnelStage kernel (one long[N] accumulator per user; the HOF
  * fold it replaced allocated a fresh N-array per EVENT through the
  * interpreter). No self-joins: an N-stage funnel as interval joins
  * is N−1 shuffles of growing chains; the fold is O(events·N) per user
  * with an N-long accumulator.
  *
  * The DP is exact for the existence semantics: acc[s] = the maximum
  * chain-start timestamp over chains reaching stage s+1 seen so far in
  * fold order. A later start strictly dominates (larger deadline, and
  * fold order already guarantees the next stage's event is not earlier),
  * so keeping only the max is lossless — spec-checked against a
  * join-chain reference, and the DuckDB oracle IS that join-chain
  * formulation: two independent formulations, one result.
  *
  * Per-user event counts are bounded in practice (sessions, bots capped
  * upstream); a pathological user is one hot key — the salting remedy
  * applies unchanged if ever needed. */
object Funnel {

  private val NoStart = Long.MinValue

  /** Pure-Scala mirror of the HOF fold — the property-test reference
    * (checked against exhaustive chain enumeration in PropertySpec, and
    * against the Column encoding in FunnelSpec). Events are (tsMicros,
    * 1-based stage); same (ts, stage) sort, same transitions. */
  def referenceStage(events: Seq[(Long, Int)], nStages: Int, window: Long): Int = {
    val acc = Array.fill(nStages)(NoStart)
    events.sorted.foreach { case (t, s) =>
      if (s == 1) acc(0) = math.max(acc(0), t)
      else if (s >= 2 && s <= nStages && acc(s - 2) != NoStart && t <= acc(s - 2) + window)
        acc(s - 1) = math.max(acc(s - 1), acc(s - 2))
    }
    acc.count(_ != NoStart)
  }

  /** Pure-Scala mirror of the [[sequenceCount]] fold — the property-test
    * reference. Events are (tsMicros, 1-based stage); same (ts, stage)
    * sort, same greedy transitions. */
  def referenceSeqCount(events: Seq[(Long, Int)], nStages: Int): Long = {
    var st = 0; var cnt = 0L
    events.sorted.foreach { case (_, s) =>
      if (s == st + 1) { st += 1; if (st == nStages) { cnt += 1; st = 0 } }
    }
    cnt
  }

  /** The ClickHouse `sequenceCount('(?1).*(?2)…')` analog: per user, the
    * number of SEQUENTIAL completions of the ordered chain
    * types(0) → types(1) → … — a new chain may only start after the
    * previous one completes, any events may intervene, no time window
    * (the windowed existence question is [[windowFunnel]]'s). Note this
    * is NOT "max disjoint interleaved matches": on v v c c p p the
    * sequential count is 1 (the second chain's view is consumed before
    * the first completes), by design — it answers "how many times did
    * the user run the whole journey", matching the reference semantics.
    *
    * For the sequential count, greedy earliest-completion is exact (the
    * activity-selection argument: finishing the current chain as early
    * as possible leaves the longest suffix for the rest), so one
    * left-to-right fold computes it. Same engine shape as
    * [[windowFunnel]]: scan-filtered types, ONE per-user shuffle, the
    * native SequenceCountFold kernel over the sorted (ts, stage) list —
    * never N−1 self-joins. Ties at one timestamp resolve
    * lower-stage-first (the struct sort order), the rule the oracle
    * replays.
    *
    * Returns (user_id, n_matches) for every user with ≥1 chain-type
    * event; types must be distinct (each event maps to one stage). */
  def sequenceCount(events: DataFrame, types: Seq[String]): DataFrame = {
    require(types.nonEmpty, "sequence needs at least one stage")
    require(types.distinct.size == types.size, "stage types must be distinct")
    val n = types.size
    val stageOf = types.zipWithIndex
      .foldRight(lit(0): Column) { case ((t, i), els) =>
        when(col("event_type") === lit(t), lit(i + 1)).otherwise(els)
      }
    val relevant = events
      .filter(col("event_type").isin(types: _*))
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("t"), stageOf.as("s")).as("e"))
    relevant.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"),
        graft.expressions.ArrayExprs.sequence_count_fold(col("evs"), n)
          .as("n_matches"))
      .orderBy(col("user_id"))
  }

  /** (user_id, funnel_stage) for every user with at least one event of a
    * funnel type; stage 0 means present but never matched stage 1.
    * Timestamps compare at microsecond grain (unix_micros / epoch_us —
    * the native precision of the store, no truncation ambiguity). */
  def windowFunnel(events: DataFrame, types: Seq[String],
      windowMicros: Long): DataFrame = {
    require(types.nonEmpty, "funnel needs at least one stage")
    val n = types.size
    val stageOf = types.zipWithIndex
      .foldRight(lit(0): Column) { case ((t, i), els) =>
        when(col("event_type") === lit(t), lit(i + 1)).otherwise(els)
      }
    val relevant = events
      .filter(col("event_type").isin(types: _*))
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("t"), stageOf.as("s")).as("e"))
    relevant.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"),
        graft.expressions.ArrayExprs.window_funnel_stage(
          col("evs"), n, windowMicros).as("funnel_stage"))
      .orderBy(col("user_id"))
  }
}
