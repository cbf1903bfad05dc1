package graft.ct

import java.util.Base64

/** Test view over the pre-baked DER certificate fixture (see DemoFixture):
  * subject CN=Example.COM, O=Graft Test, C=RS;
  * SAN dNSNames: www.example.com, API.Example.org, example.com;
  * validity 2024-01-01T00:00:00Z .. 2033-12-29T00:00:00Z.
  * Expected parse (reference semantics, ct_ingestor.py:124-139): domains =
  * lowercase CN ∪ SAN = {api.example.org, example.com, www.example.com}.
  */
object Fixtures {
  val certDer: Array[Byte] = DemoFixture.certDer

  /** Known SHA-256 of certDer (sha256sum over the exported file). */
  val certSha256 = "9de4760c08330536f9bbedb7c3d15b12f1794ee60a807dcd3ab933800a1eb7df"

  val certDomains: Seq[String] =
    Seq("api.example.org", "example.com", "www.example.com")

  def makeLeaf(der: Array[Byte], leafType: Byte = 0): Array[Byte] =
    DemoFixture.makeLeaf(der, leafType)

  def leafB64(der: Array[Byte] = certDer, leafType: Byte = 0): String =
    Base64.getEncoder.encodeToString(makeLeaf(der, leafType))
}
