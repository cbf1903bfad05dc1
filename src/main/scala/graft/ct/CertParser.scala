package graft.ct

import java.io.ByteArrayInputStream
import java.security.MessageDigest
import java.security.cert.{CertificateFactory, X509Certificate}
import java.sql.Timestamp
import javax.naming.ldap.LdapName
import javax.security.auth.x500.X500Principal
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** CT Merkle leaf → parsed certificate info.
  *
  * Behavior-parity port of the reference's `parse_cert`
  * (/root/reference/ingestion/ct_ingestor.py:114-148):
  *  - byte 0 is the leaf type; only type 0 (timestamped X.509 entry) is
  *    admitted, everything else → null (admission filter P11),
  *  - 12-byte header skip, 3-byte big-endian cert length, DER slice,
  *  - domains = lowercase CN ∪ SAN dNSNames, deduplicated,
  *  - fingerprint = lowercase hex SHA-256 of the DER bytes,
  *  - any parse failure → null (the reference drops unparseable leaves).
  *
  * Deviations (documented, SURVEY §7.4): DN strings use JDK RFC 2253
  * formatting rather than Python's RFC 4514 (attribute order/escaping can
  * differ); `domains` is sorted (Python set order is nondeterministic);
  * validity timestamps are truncated to seconds for DateTime parity.
  */
object CertParser extends Serializable {

  /** Diagnostic: parseLeaf invocations in this JVM (per-executor under a
    * cluster). Tests assert ingest evaluates each entry exactly once —
    * i.e. the batch is not re-parsed just to count appended rows. */
  val parseInvocations = new java.util.concurrent.atomic.AtomicLong(0)

  /** Parse a decoded leaf; null on non-admitted or unparseable input. */
  def parseLeaf(leaf: Array[Byte]): CertInfo = {
    parseInvocations.incrementAndGet()
    try {
      if (leaf == null || leaf.length < 15) return null
      if (leaf(0) != 0) return null // admission: timestamped X.509 only
      val off = 12
      val certLen = ((leaf(off) & 0xff) << 16) | ((leaf(off + 1) & 0xff) << 8) | (leaf(off + 2) & 0xff)
      if (off + 3 + certLen > leaf.length) return null
      val der = java.util.Arrays.copyOfRange(leaf, off + 3, off + 3 + certLen)
      parseDer(der)
    } catch { case _: Throwable => null }
  }

  /** Parse raw DER; shared by leaf parsing and tests. */
  def parseDer(der: Array[Byte]): CertInfo = {
    try {
      val cf = CertificateFactory.getInstance("X.509")
      val cert = cf.generateCertificate(new ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate]

      val cns = commonNames(cert.getSubjectX500Principal).map(_.toLowerCase)
      val sans = Option(cert.getSubjectAlternativeNames)
        .map(_.asScala.toSeq).getOrElse(Seq.empty)
        .collect { case l if l.get(0) == Integer.valueOf(2) => // dNSName
          String.valueOf(l.get(1)).toLowerCase }
      val domains = (cns ++ sans).distinct.sorted

      CertInfo(
        domains = domains,
        fingerprint = sha256Hex(der),
        issuer = cert.getIssuerX500Principal.getName(X500Principal.RFC2253),
        subject = cert.getSubjectX500Principal.getName(X500Principal.RFC2253),
        not_before = secondTrunc(cert.getNotBefore),
        not_after = secondTrunc(cert.getNotAfter))
    } catch { case _: Throwable => null }
  }

  private def commonNames(p: X500Principal): Seq[String] =
    new LdapName(p.getName(X500Principal.RFC2253)).getRdns.asScala
      .filter(_.getType.equalsIgnoreCase("CN"))
      .map(r => String.valueOf(r.getValue))
      .toSeq

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** ClickHouse DateTime is second-precision (SURVEY §1.2). */
  private def secondTrunc(d: java.util.Date): Timestamp =
    new Timestamp(d.getTime / 1000L * 1000L)

  /** UDF form: binary leaf column → CertInfo struct column (null on drop).
    * Runs once per ingested entry, not in the query hot path (SURVEY §2.11). */
  val parseLeafUdf = udf((b: Array[Byte]) => parseLeaf(b))

  def parse_leaf(c: Column): Column = parseLeafUdf(c)
}
