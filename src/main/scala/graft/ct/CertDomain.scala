package graft.ct

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core row of the engine: one (certificate, domain) pair.
  *
  * Mirrors the reference table `ct.cert_domains`
  * (/root/reference/clickhouse/init.sql:3-18); column order matches the
  * reference's insert order (/root/reference/ingestion/ct_ingestor.py:208-221).
  * ClickHouse `FixedString(64)` becomes StringType with an ingest-time length
  * invariant, `DateTime` becomes second-truncated TimestampType (SURVEY §7.4).
  */
case class CertDomain(
    ts: Timestamp,
    domain: String,
    base_domain: String,
    fingerprint: String,
    issuer: String,
    subject: String,
    san: Seq[String],
    not_before: Timestamp,
    not_after: Timestamp,
    log_name: String)

object CertDomain {
  /** Canonical StructType (needed for streaming sources + schema enforcement). */
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("domain", StringType),
    StructField("base_domain", StringType),
    StructField("fingerprint", StringType),
    StructField("issuer", StringType),
    StructField("subject", StringType),
    StructField("san", ArrayType(StringType)),
    StructField("not_before", TimestampType),
    StructField("not_after", TimestampType),
    StructField("log_name", StringType)))

  val columns: Seq[String] = schema.fieldNames.toSeq
}

/** One raw CT log entry prior to parsing — the ingest pipeline input
  * (reference get-entries response item, ct_ingestor.py:108-111,180-184). */
case class RawEntry(log_name: String, entry_index: Long, leaf_input: String)

/** Parsed certificate payload produced by the X.509 parse UDF (reference
  * parse_cert, ct_ingestor.py:114-148). `domains` is the deduplicated
  * CN ∪ SAN-dNSName set, lowercased and sorted (the reference's Python
  * `set` order is nondeterministic; we sort for stable output). */
case class CertInfo(
    domains: Seq[String],
    fingerprint: String,
    issuer: String,
    subject: String,
    not_before: Timestamp,
    not_after: Timestamp)
