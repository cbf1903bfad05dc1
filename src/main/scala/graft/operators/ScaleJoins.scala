package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Join shapes for hostile data distributions at 100 TB.
  *
  *  - `saltedEquiJoin`: when one side's join key is heavily skewed (the
  *    CT analog: a CDN's base_domain holding 10% of all rows), a plain
  *    shuffle join sends the hot key to one task. Salting splits each hot
  *    key into `nSalts` subkeys: the large side gets a deterministic salt
  *    per row, the small side is exploded `nSalts`× so every subkey still
  *    matches. Result set identical to the plain join; the hot partition
  *    is `nSalts`× smaller. (AQE's skew-join handles moderate skew
  *    automatically; salting is the explicit tool for pathological keys.)
  *
  *  - `writeBucketed`/`bucketedJoin`: pre-shuffle both tables into the
  *    same bucket layout on the join key so repeated joins are
  *    co-located — no Exchange in the plan, the MergeTree-sort-key analog
  *    for join-heavy workloads.
  */
object ScaleJoins {

  /** Equi-join `left` (large, possibly skewed) with `right` (small enough
    * to replicate `nSalts`×) on `key`. Deterministic: the salt is a hash
    * of the whole left row, not rand(). No join strategy is forced here:
    * a small right side still auto-broadcasts, and in the genuinely
    * too-big-to-broadcast regime the caller should pass
    * `right.hint("shuffle_hash")` — hints propagate through the salt
    * projection to the join (verified against Spark 4.1), and a forced
    * sort-merge would pay a large-side sort that dwarfs the skew win. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(nSalts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a table bucketed+sorted by `key` into the session catalog (the
    * managed-table variant of CertStore's sort-on-write). Drops any prior
    * catalog entry AND its warehouse directory first: the catalog is
    * session-scoped but the warehouse directory is not, so a directory
    * left by a previous session would fail the CREATE with
    * LOCATION_ALREADY_EXISTS even under mode(overwrite). */
  /** Per-process token for query-time managed-table names: the catalog is
    * session-scoped but the warehouse DIRECTORY is not, so two concurrent
    * sessions writing the same fixed table name would clobber each
    * other's live data mid-read. Suffixing query-time names makes each
    * process's tables its own; re-runs within a process still overwrite
    * their own prior table (deliberate). */
  private lazy val processToken: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
  def sessionTable(base: String): String = s"${base}_$processToken"

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // the stale-location cleanup below derives <warehouse>/<table> — only
    // correct for an unqualified name in the default database (a db.tbl
    // name lives under <warehouse>/db.db/tbl and the backticked DROP
    // would quote it as one identifier); fail fast rather than delete
    // the wrong directory
    require(!table.contains(".") && table.nonEmpty,
      s"writeBucketed needs an unqualified default-database table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a directory left by a PREVIOUS process would fail the CREATE with
    // LOCATION_ALREADY_EXISTS even under mode(overwrite); resolve it via
    // the warehouse's own FileSystem so the cleanup works on any scheme
    // (file:, hdfs:, s3a:), not just the local one
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val stale = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = stale.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(stale)) fs.delete(stale, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed, under spark.sql.warehouse.dir
    // process-token scratch tables would otherwise accumulate in a shared
    // warehouse forever (each process writes fresh names); this process
    // deletes ITS OWN dirs at exit — never another session's, which is
    // what the per-process naming exists to protect
    // the RESOLVED filesystem decides local-ness (a scheme-less warehouse
    // path resolves to fs.defaultFS, which may be HDFS — a java.io.File
    // hook would then rmdir an unrelated same-named local path)
    if (table.endsWith(processToken) && fs.getUri.getScheme == "file")
      Dedup.cleanupAtExit.add {
        val dir = new java.io.File(fs.makeQualified(stale).toUri.getPath)
        () => Dedup.rmdir(dir)
      }
  }

  /** Join two identically-bucketed catalog tables on their bucket key —
    * planner sees compatible output partitioning on both sides and elides
    * the shuffle. Pass `hint = Some("merge")` to pin the sort-merge path
    * when one side is small enough that auto-broadcast would otherwise
    * win (at test scale): the bucket layout then serves both sides with
    * zero Exchange, which is the point of paying the bucketed write. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, hint: Option[String] = None): DataFrame = {
    val right = hint.foldLeft(spark.table(rightTable))((df, h) => df.hint(h))
    spark.table(leftTable).join(right, Seq(key))
  }

  /** Bloom-filtered semi-join: `big` rows whose `bigKey` appears among
    * `small`'s `smallKey`s, with a Bloom sketch of the small side's keys
    * pushed into the big side's SCAN stage before any shuffle — the
    * manual form of Spark's runtime row-level filtering, exposed as an
    * operator so a pipeline can apply it where the optimizer's heuristics
    * don't reach (e.g. the probe side arrives through a union or a
    * custom source the runtime-filter rule won't traverse).
    *
    * Mechanics: the sketch is built DISTRIBUTED (BloomFilterAggregate is
    * a partial-mergeable aggregate — each partition of `small` builds a
    * partial sketch, only sketches merge upward), and the single final
    * sketch (numBits/8 bytes, bounded by construction ≤ 16 MB here) is
    * inlined as a foldable literal in a `might_contain` predicate on the
    * big side — codegen'd, evaluated at the scan, BEFORE the shuffle.
    * At 100 TB that is the entire point: the big side's shuffle volume
    * drops to ~(match rate + fpp) of the table, for the price of one
    * small-side pass and a broadcast-sized sketch. False positives are
    * then discharged by the exact semi-join on the survivors, so the
    * OUTPUT is bit-identical to the plain semi-join (the oracle).
    *
    * The driver holds only the sketch — never keys — so this stays
    * collect-discipline-clean at any small-side cardinality that fits
    * the sketch's false-positive budget. */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1, "invalid bloom parameters")
    // standard optimal sizing: m = -n·ln(p)/(ln 2)², capped at 128 Mbit
    val numBits = math.min(
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong,
      128L * 1024 * 1024 * 8)
    val sketchAgg = column(new BloomFilterAggregate(
      expression(xxhash64(col(smallKey))), Literal(expectedItems), Literal(numBits)
    ).toAggregateExpression())
    val sketch = small.select(sketchAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = column(BloomFilterMightContain(
      Literal(sketch, BinaryType), expression(xxhash64(col(bigKey)))))
    big.filter(mightContain)
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** Range (interval) join: points joined to every interval containing
    * them — `points.pt` in `[intervals.lo, intervals.hi)` — WITHOUT the
    * BroadcastNestedLoopJoin Spark plans for a bare inequality join.
    *
    * Bucketize: each point maps to floor(pt/width); each interval explodes
    * to the buckets it overlaps; the join becomes an EQUI-join on the
    * bucket id plus the cheap containment re-check. Candidate volume is
    * |points| + Σ interval-span/width — choose `width` near the median
    * interval length so most intervals explode to O(1) buckets. This is
    * the shuffle-partitionable range join (what dedicated engines'
    * interval indexes do, expressed as explode + hash join); at 10^11
    * points a nested-loop join is unrunnable while this is one shuffle. */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val p = points.withColumn("__bucket", floor(col(ptCol) / width).cast("long"))
    // empty/inverted intervals (hi <= lo) can match nothing, but sequence()
    // DESCENDS when start > stop and would explode ~(lo-hi)/width spurious
    // candidate rows per malformed row — drop them before the explode
    val iv = intervals.filter(col(hiCol) > col(loCol)).withColumn("__bucket",
      explode(sequence(floor(col(loCol) / width).cast("long"),
        // hi is exclusive: the last reachable bucket is ceil(hi/width)-1,
        // which is exact for integer AND fractional bounds (floor(hi-1)
        // would drop the final bucket when hi is fractional — a point at
        // hi-0.5 lives in floor(hi/width) but hi-1 may not reach it)
        (ceil(col(hiCol) / width) - 1).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join (closed intervals on an integer
    * domain: a overlaps b iff aStart ≤ bEnd ∧ bStart ≤ aEnd) as a
    * shuffle-partitionable EQUI-join — the two-sided generalization of
    * [[rangeJoinBucketed]]. Both sides explode each interval to every
    * `width`-wide bucket it touches; overlapping pairs are guaranteed to
    * co-occur in at least one bucket (they share ≥ 1 domain point).
    *
    * Duplicate elimination is ARITHMETIC, not a distinct: a pair is
    * emitted only in the bucket containing max(aStart, bStart) — the
    * first bucket where both intervals are live — which each overlapping
    * pair satisfies exactly once. No post-join dedup shuffle, so output
    * volume equals answer volume.
    *
    * Column names must be disjoint across the two inputs (pre-alias on
    * the caller side); for a self-join, also filter `a.key < b.key`
    * afterwards — Catalyst pushes that predicate into the join. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def buckets(df: DataFrame, s: String, e: String) =
      df.filter(col(e) >= col(s)) // inverted intervals match nothing
        .withColumn("__bk", explode(sequence(
          expr(s"$s div $width"), expr(s"$e div $width"))))
    buckets(left, lStart, lEnd)
      .join(buckets(right, rStart, rEnd), Seq("__bk"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bk") === expr(s"greatest($lStart, $rStart) div $width"))
      .drop("__bk")
  }
}
