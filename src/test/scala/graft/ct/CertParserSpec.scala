package graft.ct

import org.scalatest.funsuite.AnyFunSuite

class CertParserSpec extends AnyFunSuite {

  test("parses CN + SAN domains, lowercased and deduplicated") {
    val info = CertParser.parseLeaf(Fixtures.makeLeaf(Fixtures.certDer))
    assert(info != null)
    assert(info.domains == Fixtures.certDomains) // sorted, lowercase, CN∪SAN
  }

  test("fingerprint is lowercase hex sha256 of the DER bytes") {
    val info = CertParser.parseLeaf(Fixtures.makeLeaf(Fixtures.certDer))
    assert(info.fingerprint == Fixtures.certSha256)
    assert(info.fingerprint.length == 64) // FixedString(64) invariant
  }

  test("validity window is second-truncated UTC") {
    val info = CertParser.parseLeaf(Fixtures.makeLeaf(Fixtures.certDer))
    assert(info.not_before.toInstant.toString == "2024-01-01T00:00:00Z")
    assert(info.not_after.toInstant.toString == "2033-12-29T00:00:00Z")
    assert(info.not_before.getTime % 1000 == 0)
  }

  test("subject/issuer are RFC2253 DNs containing the CN") {
    val info = CertParser.parseLeaf(Fixtures.makeLeaf(Fixtures.certDer))
    assert(info.subject.contains("CN=Example.COM"))
    assert(info.issuer == info.subject) // self-signed fixture
  }

  test("precert leaf (type != 0) is dropped — admission P11") {
    assert(CertParser.parseLeaf(Fixtures.makeLeaf(Fixtures.certDer, leafType = 1)) == null)
  }

  test("garbage and short input are dropped, not thrown") {
    assert(CertParser.parseLeaf(Array[Byte](0, 1, 2)) == null)
    assert(CertParser.parseLeaf(Fixtures.makeLeaf("not a cert".getBytes)) == null)
    assert(CertParser.parseLeaf(null) == null)
  }

  test("truncated cert body (declared length past end) is dropped") {
    val leaf = Fixtures.makeLeaf(Fixtures.certDer)
    assert(CertParser.parseLeaf(leaf.dropRight(100)) == null)
  }
}
