package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}

/** Loads the driver-generated testdata tables (see TESTDATA.md / FIXTURES.md §B).
  *
  * Every declared query receives `(spark, sfDir)` and reads only from this
  * loader so the same code runs at any scale factor. Reads are plain
  * `spark.read.parquet` → `FileSourceScanExec` with Catalyst predicate
  * pushdown + column pruning intact (SURVEY §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** If `events.parquet` stores `ts` as TIMESTAMP(NANOS), Spark's reader
    * rejects it outright — reading it requires `spark.sql.legacy.parquet.
    * nanosAsLong=true`. This is a deliberate, DOCUMENTED session-lifetime
    * mutation, not an oversight: the conf is consulted at SCAN time, when
    * the (lazy) frames built here finally execute, so "restore it after
    * building the plan" would break every frame still in flight. Set-once
    * (idempotent guard) keeps repeated table loads from churning the conf
    * map. Harmless when the file is already micros (the conf only affects
    * NANOS-annotated columns).
    */
  private[graft] def ensureNanosAsLong(s: SparkSession): Unit =
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The physical `ts` encoding of an events file, probed from its footer
    * schema (a metadata-only read — no data scan). The testdata generator
    * has shipped both TIMESTAMP(NANOS) (inferred LongType under the legacy
    * conf) and TIMESTAMP(MICROS) (inferred TimestampType/TIMESTAMP_NTZ)
    * across regenerations; the engine must not hard-code either.
    */
  private[graft] def eventsTsIsLong(s: SparkSession, d: String): Boolean = {
    ensureNanosAsLong(s)
    load(s, d, "events").schema("ts").dataType == LongType
  }

  /** Events with `ts` as epoch-micros-exact TimestampType, whatever the
    * file's physical encoding: raw-nanos LONG is floor-divided to micros;
    * a micros TIMESTAMP (UTC-adjusted or not) is read DIRECTLY as
    * TimestampType by forcing the read schema, which hands over the stored
    * micros verbatim — no session-timezone reinterpretation, exactly the
    * naive value DuckDB yields loading the same file, so oracle
    * comparisons stay bit-identical. A one-time sanity probe rejects
    * values outside [1990, 2100): every unit mix-up (ns↔µs↔ms) moves
    * event time by 1000×, so a misread fails loudly at load instead of
    * silently corrupting every downstream watermark/window decision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val tsIsLong = eventsTsIsLong(s, d)
    val inferred = load(s, d, "events").schema
    val readSchema = StructType(inferred.map { f =>
      if (f.name == "ts" && !tsIsLong) f.copy(dataType = TimestampType) else f
    })
    val raw = s.read.schema(readSchema).parquet(s"$d/events.parquet")
    val converted =
      if (tsIsLong) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    checkEventsTs(s, d, converted)
    converted.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
  }

  // one min/max scan per (JVM, path); re-probed only if the file changes.
  // The stamp is size+mtime PLUS a CRC32 of each file's first and last
  // 4 KiB: a regeneration that lands on the same byte length within the
  // mtime granularity still flips the parquet footer (row-group stats,
  // creation metadata live there), so content changes can't slip past the
  // cached validation. ~8 KiB of I/O per file per probe — negligible.
  private val tsChecked = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def contentCrc(f: java.io.File): Long = {
    if (!f.isFile) return 0L // missing path / nested dir: size+mtime only
    val crc = new java.util.zip.CRC32()
    val len = f.length()
    val buf = new Array[Byte](4096)
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val n1 = raf.read(buf); if (n1 > 0) crc.update(buf, 0, n1)
      if (len > 4096) {
        raf.seek(math.max(len - 4096, n1.toLong))
        val n2 = raf.read(buf); if (n2 > 0) crc.update(buf, 0, n2)
      }
    } finally raf.close()
    crc.getValue
  }
  private def fileStamp(p: java.io.File): String =
    if (p.isDirectory)
      p.listFiles.sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}:${contentCrc(f)}")
        .mkString("|")
    else s"${p.length}:${p.lastModified}:${contentCrc(p)}"
  private[graft] def checkEventsTs(s: SparkSession, d: String, df: DataFrame): Unit = {
    val path = s"$d/events.parquet"
    val stamp = fileStamp(new java.io.File(path))
    if (tsChecked.get(path) != stamp) {
      val r = df.agg(min(col("ts")), max(col("ts"))).head()
      if (!r.isNullAt(0)) {
        // 1990 lower bound ON PURPOSE: nanos misread as micros (or micros
        // as millis) lands in the early 1970s — inside a [1950,∞) window
        // but 1000x wrong; the bound must sit ABOVE the collapse target
        val lo = 631152000000000L  // 1990-01-01 UTC, epoch micros
        val hi = 4102444800000000L // 2100-01-01 UTC, epoch micros
        def us(t: java.sql.Timestamp): Long =
          math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
        val (mn, mx) = (us(r.getTimestamp(0)), us(r.getTimestamp(1)))
        require(mn >= lo && mx < hi,
          s"events.ts at $path lands outside [1990, 2100): min=${r.getTimestamp(0)} " +
            s"max=${r.getTimestamp(1)} — timestamp unit misread (ns/us/ms mix-up)?")
      }
      tsChecked.put(path, stamp)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  /** Embeddings with the fixed-dimension contract ENFORCED at the read
    * boundary: a NULL vector or a mixed-dimension table has no portable
    * similarity semantics (Spark's dot fold and a SQL range-index
    * formulation disagree by construction), so — like any production
    * vector index — the engine refuses it loudly instead of silently
    * computing garbage. ONE null-skipping validation scan per file
    * content-version (cached below), the once-per-corpus-snapshot
    * ingestion check a real vector store runs; query plans carry no
    * per-row guard (a wrapping projection would re-copy the array on
    * the ANN hot path — measured). */
  private val embChecked = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "embeddings")
    val path = s"$d/embeddings.parquet"
    val stamp = fileStamp(new java.io.File(path))
    if (embChecked.get(path) != stamp) {
      // one null-skipping aggregate pass: min/max dims + null count — a
      // NULL first row or a wrong-dim first row can't skew the expected
      // dim or mask the message (and it is half the cost of probe+scan)
      val r = raw.agg(
        min(size(col("embedding"))).as("mn"),
        max(size(col("embedding"))).as("mx"),
        coalesce(sum(when(col("embedding").isNull, 1L).otherwise(0L)),
          lit(0L)).as("nulls")).head() // coalesce: empty table sums to NULL
      val nulls = r.getLong(2)
      require(nulls == 0L && (r.isNullAt(0) || r.getInt(0) == r.getInt(1)),
        s"embeddings contract violation at $path: " +
          (if (nulls > 0) s"$nulls NULL vector(s); " else "") +
          (if (!r.isNullAt(0) && r.getInt(0) != r.getInt(1))
             s"mixed dims [${r.getInt(0)}, ${r.getInt(1)}]; " else "") +
          "mismatched/NULL vectors have no portable similarity semantics — " +
          "validate/quarantine at ingestion")
      embChecked.put(path, stamp)
    }
    raw
  }
}
