package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins the two cross-engine edge cases of doc_blocklist that the
  * testdata never exercises (it has no NULL texts and no quote-bearing
  * blocklist tokens), so a regression would otherwise stay latent until
  * a data change flipped the gate:
  *  - a NULL text row is "not blocked hence kept" — in n_docs and
  *    n_kept, never n_blocked (the n_kept = n_docs − n_blocked
  *    formulation; a second conditional sum would drop it from BOTH
  *    counters on the Spark side while DuckDB's CASE..ELSE keeps it);
  *  - a token carrying a single quote produces well-formed oracle SQL
  *    (quote doubling) and still blocks on the Spark side. */
class BlocklistSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "clean words here", "a"),
      (2L, "contains dup token", "a"),
      (3L, null.asInstanceOf[String], "a"),
      (4L, "o'brien writes prose", "b"))
      .toDF("doc_id", "text", "source")
  }

  test("NULL text is kept, counted in n_docs, absent from n_blocked") {
    val got = PipelineQueries.blocklistReport(fixture, Seq("dup"))
      .collect().map { case Row(s: String, d: Long, b: Long, k: Long) => (s, d, b, k) }
    assert(got.toSeq == Seq(("a", 3L, 1L, 2L), ("b", 1L, 0L, 1L)), got.toSeq)
  }

  test("quote-bearing token: well-formed escaped oracle SQL, Spark side blocks it") {
    val sql = PipelineQueries.blocklistOracleSql(Seq("o'brien", "dup"))
    assert(sql.contains("'o''brien'"), sql)
    assert(sql.contains("'dup'"), sql)
    // balanced string literals: an even number of single quotes overall
    assert(sql.count(_ == '\'') % 2 == 0, sql)
    val got = PipelineQueries.blocklistReport(fixture, Seq("o'brien"))
      .collect().map { case Row(s: String, d: Long, b: Long, k: Long) => (s, d, b, k) }
    assert(got.toSeq == Seq(("a", 3L, 0L, 3L), ("b", 1L, 1L, 0L)), got.toSeq)
  }
}
