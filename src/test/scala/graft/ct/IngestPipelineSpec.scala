package graft.ct

import java.sql.Timestamp
import graft.SparkSpec

class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-15 10:00:00")

  test("explode grain: one row per distinct domain, san intact on every row (G1)") {
    val raw = Seq(RawEntry("Test Log", 0L, Fixtures.leafB64())).toDS()
    val rows = IngestPipeline.certDomains(raw, t0).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("domain")).sorted.toSeq == Fixtures.certDomains)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("san").toSeq == Fixtures.certDomains)
      assert(r.getAs[String]("fingerprint") == Fixtures.certSha256)
      assert(r.getAs[String]("log_name") == "Test_Log") // F9 normalization
      assert(r.getAs[Timestamp]("ts") == t0)
    }
  }

  test("base_domain is derived per row (F14)") {
    val raw = Seq(RawEntry("l", 0L, Fixtures.leafB64())).toDS()
    val got = IngestPipeline.certDomains(raw, t0)
      .select("domain", "base_domain").as[(String, String)].collect().toMap
    assert(got("www.example.com") == "example.com")
    assert(got("api.example.org") == "example.org")
    assert(got("example.com") == "example.com")
  }

  test("precert and garbage entries are dropped (P11/P12)") {
    val raw = Seq(
      RawEntry("l", 0L, Fixtures.leafB64()),
      RawEntry("l", 1L, Fixtures.leafB64(leafType = 1)),
      RawEntry("l", 2L, java.util.Base64.getEncoder.encodeToString("junk".getBytes))
    ).toDS()
    assert(IngestPipeline.certDomains(raw, t0).count() == 3) // only the real cert
  }

  test("replay is idempotent: dedup on (fingerprint, domain) — A9/ST1") {
    val raw = Seq(
      RawEntry("l", 0L, Fixtures.leafB64()),
      RawEntry("l", 0L, Fixtures.leafB64()) // duplicate delivery
    ).toDS()
    assert(IngestPipeline.certDomains(raw, t0).count() == 3)
  }
}
