package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.operators.Dedup

/** Pins the edge-data semantics the adversarial gate (HostileGen +
  * Verify parity) established in round 7 — each decision is a
  * cross-engine CONTRACT (the DuckDB oracle computes the same value),
  * so it must survive as a unit spec independent of the hostile run:
  *
  *  - zero-norm cosine is NULL (DuckDB's x/0.0), never an ANSI error;
  *  - shingle-less docs are absent from minhash signature tables (the
  *    empty-set sentinel would overflow the band packing);
  *  - session_window MERGES a gap of exactly the threshold, and the
  *    manual gaps-and-islands operators use the same strict-> rule;
  *  - NULL-text docs get a NULL language prediction (not the
  *    alphabetically-first code);
  *  - ntile/percent_rank order NULL keys LAST under asc (DuckDB's
  *    default; Spark's bare asc is NULLS FIRST).
  */
class EdgeSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: zero-norm vector yields NULL, not a DIVIDE_BY_ZERO error") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (2L, Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)), // zero-norm left side
      (3L, Seq(1.0f, 1.0f), Seq(1.0f, 1.0f))
    ).toDF("id", "a", "b")
      .select(col("id"), V.cosine(col("a"), col("b")).as("cos"))
      .orderBy("id").collect()
    assert(df(0).getDouble(1) == 0.0)
    assert(df(1).isNullAt(1), "zero-norm cosine must be NULL")
    assert(math.abs(df(2).getDouble(1) - 1.0) < 1e-15)
  }

  test("minhash signatures: docs with no k-shingles are absent; bands never overflow") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // 4 tokens -> shingles exist
      (2L, "ab"),                     // 1 token, k=3 -> no shingles
      (3L, null.asInstanceOf[String]) // null text
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, k = 3)
    assert(sig.select("doc_id").as[Long].collect().toSet == Set(1L))
    // band packing stays in-range for every surviving sig (would throw
    // ARITHMETIC_OVERFLOW on a MAX-sentinel under ANSI)
    val bands = sig.select(explode(T.minhashBands(col("sig"))).as("b")).collect()
    assert(bands.nonEmpty && bands.forall(r => r.getLong(0) >= 0L))
  }

  test("session boundary: a gap of exactly the threshold merges (session_window rule)") {
    val ev = Seq(
      (1L, java.time.LocalDateTime.parse("2024-01-15T13:00:00"), 6L),
      (2L, java.time.LocalDateTime.parse("2024-01-15T13:30:00"), 6L), // exact 30 min
      (3L, java.time.LocalDateTime.parse("2024-01-15T14:00:01"), 6L)  // 30 min + 1 s
    ).toDF("event_id", "ts", "user_id")
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().collect()
    assert(sessions.length == 2,
      s"exact-gap pair must merge, the +1s pair must split: ${sessions.length}")
    // the manual gaps-and-islands rule (q75/oracles) agrees: strict >
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tsc = col("ts").cast("timestamp") // fixture is NTZ; unix_micros wants TIMESTAMP
    val breaks = ev.withColumn("brk",
        when(unix_micros(tsc) -
          unix_micros(lag(tsc, 1).over(w)) > 1800000000L, 1)
          .when(lag(tsc, 1).over(w).isNull, 1).otherwise(0))
      .agg(sum("brk")).as[Long].head()
    assert(breaks == 2, s"manual rule must count 2 session starts, got $breaks")
  }

  test("langId: NULL text predicts NULL, non-null text always predicts a code") {
    val got = Seq((1L, "the and of to a"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), T.langId(col("text")).as("p")).orderBy("id").collect()
    assert(got(0).getString(1) == "en")
    assert(got(1).isNullAt(1), "null text must predict NULL")
  }

  test("embeddings loader: NULL or wrong-dim vector fails loudly at scan, clean table passes") {
    val dir = java.nio.file.Files.createTempDirectory("emb-contract").toString
    def write(rows: Seq[(Long, Seq[Float], Int)]): Unit = {
      val work = s"$dir/work"
      rows.toDF("vec_id", "embedding", "label").coalesce(1)
        .write.mode("overwrite").parquet(work)
      val part = new java.io.File(work).listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, "embeddings.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    // the contract is validated EAGERLY, once per file version (cached
    // by content stamp) — the loader call itself throws on a bad table
    write(Seq((1L, Seq(1f, 2f), 0), (2L, Seq(3f, 4f), 1)))
    assert(Tables.embeddings(spark, dir)
      .select("embedding").collect().length == 2) // clean: no error
    write(Seq((1L, Seq(1f, 2f), 0), (2L, Seq(3f), 1))) // dim 1 vs 2
    val e = intercept[Exception] {
      Tables.embeddings(spark, dir).select("embedding").collect()
    }
    assert(e.getMessage.contains("contract violation") ||
      Option(e.getCause).exists(_.getMessage.contains("contract violation")),
      s"want a loud contract error, got: ${e.getMessage}")
  }

  test("ntile over a nullable key: NULL rows bucket LAST (DuckDB's null order)") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, None), (4L, Some(4.0))
    ).toDF("id", "v")
    val w = Window.orderBy(col("v").asc_nulls_last, col("id").asc)
    val buckets = df.withColumn("nt", ntile(4).over(w))
      .select("id", "nt").as[(Long, Int)].collect().toMap
    assert(buckets(3L) == 4, s"NULL key must land in the last bucket: $buckets")
  }
}
