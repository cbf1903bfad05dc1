package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Dev tool: builds an ADVERSARIAL scale-factor directory — a verbatim
  * copy of a base testdata dir (default sf0.001) with edge-case rows
  * appended to every table — so the ENTIRE declared-query gate
  * (`Verify` + `tools/check_parity.py`) can be replayed against data
  * the generator never produces: NULLs in aggregated/grouped/joined
  * columns, empty and whitespace-only strings, quote/backslash/unicode
  * text, regex-hostile tokens, boundary timestamps (exact window edges,
  * exact session-gap ties), duplicate texts/vectors, the zero vector,
  * dangling foreign keys.
  *
  * The point is CROSS-ENGINE SEMANTIC parity, not crash-resistance
  * alone: both engines read the same files, so every divergence this
  * surfaces is a place where Spark's and DuckDB's semantics differ on
  * edge data — null propagation, division by zero, tokenization of
  * empty strings, JSON parsing of malformed input — i.e. exactly the
  * class of latent hash-gate failures a fixed uniform testdata never
  * exercises.
  *
  * Usage: sbt "runMain graft.HostileGen [baseDir] [outDir]"
  *        then: runMain graft.Verify <outDir> /tmp/vhostile
  *              python3 tools/check_parity.py /tmp/vhostile <outDir>
  *
  * Appended ids live in 900000+ (documents/events/embeddings), far
  * above the base ranges but below the 1e6 incremental-fixture bound
  * (`PipelineQueries.incrementId`).
  */
object HostileGen {

  // the TPC-H tables' timestamp columns read as TIMESTAMP_NTZ, whose
  // external row type is LocalDateTime (a j.s.Timestamp fails conversion)
  private def ts(s: String) =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))

  // events go through Tables.events (schema-adaptive: handles the
  // TIMESTAMP(NANOS) generator variant too), which yields TimestampType —
  // whose external row type is Instant (values are UTC in this repo)
  private def tsI(s: String) =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)

  /** Append `rows` (built against the table's own schema) and write —
    * as a SINGLE FILE named `<table>.parquet`, matching the driver
    * testdata layout exactly (batch and streaming sources, and the
    * DuckDB oracle, all resolve the same path shape). */
  private def copyPlus(spark: SparkSession, base: String, out: String,
      table: String)(rows: DataFrame => Seq[Row]): Unit = {
    // events go through the schema-adaptive loader: the generator has
    // shipped both TIMESTAMP(NANOS) and micros encodings, and a plain
    // read rejects the NANOS variant outright (see Tables.events); the
    // hostile copy is then always micros TimestampType, which Tables
    // handles on the way back in
    val src =
      if (table == "events") graft.Tables.events(spark, base)
      else spark.read.parquet(s"$base/$table.parquet")
    val extra = spark.createDataFrame(
      java.util.Arrays.asList(rows(src): _*), src.schema)
    val work = s"$out/.work_$table"
    src.unionByName(extra).coalesce(1)
      .write.mode("overwrite").parquet(work)
    val part = new java.io.File(work).listFiles
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(out, s"$table.parquet")
    if (dst.exists) { graft.operators.Dedup.rmdir(dst); () }
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.operators.Dedup.rmdir(new java.io.File(work))
  }

  def generate(spark: SparkSession, base: String, out: String): Unit = {
    copyPlus(spark, base, out, "documents") { _ => Seq(
      // null / empty / whitespace / single-char text
      Row(900001L, null, "en", "web", 0L),
      Row(900002L, "", "en", "web", 0L),
      Row(900003L, " \t\n  ", "en", "web", 5L),
      Row(900004L, "a", "en", "web", 1L),
      // quotes, backslashes, SQL-literal hostility
      Row(900005L, "it's a 'quoted' text with \"doubles\" and \\ backslash; DROP TABLE--", "en", "web", 64L),
      // unicode: accents, CJK, emoji, combining marks
      Row(900006L, "héllo wörld 你好世界 🚀 éé", "zh", "web", 20L),
      // exact duplicate pair (dedup family must pair them identically)
      Row(900007L, "hostile duplicate sentinel text block alpha beta gamma", "en", "web", 54L),
      Row(900008L, "hostile duplicate sentinel text block alpha beta gamma", "en", "books", 54L),
      // regex-hostile + PII-shaped tokens
      Row(900009L, "a.b@c.d 999-99-9999 256.300.1.2 $5.00 (a+b)*c [x]{2} a|b ^$", "en", "web", 60L),
      // long repetitive doc (winnowing/repetition/chunking tails)
      Row(900010L, Seq.fill(4000)("tok").mkString(" "), "en", "web", 15999L),
      // null lang and null source (null GROUP BY keys / mix strata)
      Row(900011L, "null lang sentinel words here", null, "web", 29L),
      Row(900012L, "null source sentinel words here", "en", null, 31L))
    }

    copyPlus(spark, base, out, "events") { _ => Seq(
      // NULL value: sum/avg/decimal-cast null propagation
      Row(900001L, tsI("2024-01-15 10:00:00.000001"), 3L, "purchase", null, "{}"),
      // zero / negative / large-but-safe values
      Row(900002L, tsI("2024-01-15 10:00:01"), 3L, "purchase", 0.0, "{}"),
      Row(900003L, tsI("2024-01-15 10:00:02"), 3L, "purchase", -7.25, "{}"),
      Row(900004L, tsI("2024-01-15 10:00:03"), 3L, "purchase", 1000000.5, "{}"),
      // exact (user, ts) tie — only event_id breaks it
      Row(900005L, tsI("2024-01-15 11:00:00"), 4L, "view", 1.0, "{}"),
      Row(900006L, tsI("2024-01-15 11:00:00"), 4L, "click", 2.0, "{}"),
      // exact 10-min window boundary and 1 us before it
      Row(900007L, tsI("2024-01-15 12:00:00"), 5L, "view", 1.0, "{}"),
      Row(900008L, tsI("2024-01-15 11:59:59.999999"), 5L, "view", 1.0, "{}"),
      // a gap of EXACTLY the 30-min session threshold (must break)
      Row(900009L, tsI("2024-01-15 13:00:00"), 6L, "view", 1.0, "{}"),
      Row(900010L, tsI("2024-01-15 13:30:00"), 6L, "view", 1.0, "{}"),
      // single-event user at the far end of the time range
      Row(900011L, tsI("2024-01-29 23:00:00"), 13L, "signup", 0.5, "{}"),
      // null event_type (null GROUP BY key; IN-list filters drop it)
      Row(900012L, tsI("2024-01-15 14:00:00"), 7L, null, 3.0, "{}"),
      // a user whose LATEST event has NULL type: latest-state/CDC must
      // keep the row on both engines (NULL IS DISTINCT FROM tombstone)
      Row(900017L, tsI("2024-01-30 23:59:00"), 12L, null, 2.0, "{}"),
      // malformed + quote-laden + unicode JSON props (q17_json)
      Row(900013L, tsI("2024-01-15 14:30:00"), 7L, "click", 1.0, "not json at all"),
      Row(900014L, tsI("2024-01-15 14:31:00"), 7L, "click", 1.0, """{"plan":"it's \"q\"","n":3}"""),
      Row(900015L, tsI("2024-01-15 14:32:00"), 7L, "click", 1.0, """{"plan":"你好"}"""),
      Row(900016L, tsI("2024-01-15 14:33:00"), 7L, "click", 1.0, null))
    }

    // Second pass over the COMPOSED events table (base + edge rows above,
    // read back from `out` so the rows above already count toward the
    // span): plant watermark-BOUNDARY rows for the replay split's
    // adversarial rule (StreamingQueries.eventsSplitByTime) — rows whose
    // ts is EXACTLY sliceMax(i) − 30 min, i.e. exactly the watermark
    // slice i establishes. Odd event_ids get delivered one file LATE by
    // the split; the even-id tie partner stays on time, creating a
    // cross-file (ts, event_id) tie. The buffered *_replay operators
    // must admit them (not strictly late), merge them into the per-key
    // buffer, and fold in (ts, id) order — BufferedReplaySpec pins the
    // mechanism, this data makes the full 4-slice gate exercise it.
    // All planted ts are interior (30 min below a slice max), so they
    // shift neither the global span nor any slice max.
    copyPlus(spark, out, out, "events") { src =>
      // slice/boundary values from THE shared definition the replay
      // split routes by (StreamingQueries.ReplaySlicing) — a private
      // re-derivation here could drift and silently no-op the rule
      val spec = graft.queries.StreamingQueries.ReplaySlicing.of(src)
      def boundary(i: Int): Option[java.time.Instant] =
        spec.boundaryUs(i).map(b => java.time.Instant.ofEpochSecond(
          Math.floorDiv(b, 1000000L), Math.floorMod(b, 1000000L) * 1000L))
      boundary(0).toSeq.flatMap(b0 => Seq(
        // lone boundary row, odd id → arrives one file late
        Row(900021L, b0, 3L, "click", 4.5, "{}"))) ++
      boundary(1).toSeq.flatMap(b1 => Seq(
        // ts-tie pair: odd id 900023 arrives one file LATE yet must fold
        // BEFORE the on-time even id 900024 — the hard direction of the
        // cross-file tie straddle (smaller id on the late side)
        Row(900023L, b1, 4L, "click", 3.5, "{}"),
        Row(900024L, b1, 4L, "view", 2.0, "{}"))) ++
      boundary(2).toSeq.flatMap(b2 => Seq(
        Row(900025L, b2, 6L, "view", 1.25, "{}")))
    }

    copyPlus(spark, base, out, "embeddings") { src =>
      val dim = src.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding"))).first().getInt(0)
      Seq(
        // the zero vector: cosine division by zero on both engines
        Row(900001L, Seq.fill(dim)(0.0f), 3),
        // denormal-magnitude vector (norm underflow risk)
        Row(900002L, Seq.fill(dim)(1e-30f), 4),
        // exact duplicate of a constant unit-ish vector, twice
        Row(900003L, Seq.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f), 5),
        Row(900004L, Seq.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f), 5),
        // all-negative vector and a null label
        Row(900005L, Seq.fill(dim)(-0.5f), 6),
        Row(900006L, Seq.tabulate(dim)(i => (i % 7).toFloat / 7f), null))
        // NULL / wrong-dimension vectors are NOT planted here: mismatched
        // dims have no portable dot-product semantics (Spark's fold and
        // DuckDB's range-index disagree by construction), so the engine
        // REJECTS them loudly at the read boundary instead of silently
        // diverging — Tables.embeddings' contract guard, pinned by
        // EdgeSemanticsSpec, exactly as production vector stores
        // (fixed-dim indexes) refuse them at ingestion
    }

    copyPlus(spark, base, out, "customer") { _ => Seq(
      // null balance / segment, quote+unicode name
      Row(900001L, "Cust O'Brien é", 3, null, null),
      Row(900002L, "", 4, -999.99, "BUILDING"))
    }

    copyPlus(spark, base, out, "orders") { _ => Seq(
      // dangling FK (no such customer) + null totalprice
      Row(900001L, 999999L, "O", null, ts("2024-01-10 00:00:00"), "1-URGENT"),
      Row(900002L, 1L, "", 0.0, ts("2024-01-11 00:00:00"), "5-LOW"))
    }

    copyPlus(spark, base, out, "lineitem") { _ => Seq(
      // null part key (inner joins drop it on both engines), zero qty,
      // null discount (price expressions null-propagate), null flag
      Row(900001L, null, 1L, 1, 0.0, 100.0, null, 0.05, null, "O",
        ts("2024-01-12 00:00:00")),
      // dangling order key
      Row(999999L, 1L, 1L, 1, 1.0, 50.0, 0.1, 0.02, "N", "O",
        ts("2024-01-13 00:00:00")),
      // NULL quantity: rank/range-frame windows order by it (null
      // position + peer-group semantics must agree across engines)
      Row(900002L, 2L, 2L, 2, null, 75.0, 0.0, 0.01, "A", "F",
        ts("2024-01-14 00:00:00")))
    }

    copyPlus(spark, base, out, "supplier") { _ => Seq(
      // null balance and a dangling nation key (joins drop it, aggs keep)
      Row(900001L, "Suppliér 'quote'", 999, null))
    }

    copyPlus(spark, base, out, "part") { _ => Seq(
      // null type/brand (null GROUP BY keys), zero retail price, unicode
      Row(900001L, "høstile pärt", null, null, 0, 0.0))
    }

    // region/nation copied verbatim (tiny closed-key dimensions: every
    // query joins them from the fact side on generated keys)
    for (t <- Seq("region", "nation"))
      copyPlus(spark, base, out, t)(_ => Seq.empty)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_hostile_sf")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out)
    println(s"hostile testdata written to $out")
    spark.stop()
  }
}
