package graft.ct

import java.util.Base64

/** Self-signed demo certificate (generated once with JDK keytool):
  * subject CN=Example.COM, O=Graft Test, C=RS;
  * SAN dNSNames www.example.com, API.Example.org, example.com;
  * validity 2024-01-01T00:00:00Z .. 2033-12-29T00:00:00Z.
  * Used by CtDemo and the test suite as the zero-egress stand-in for a
  * real CT log entry.
  */
object DemoFixture {
  val certB64: String =
    "MIIDTTCCAjWgAwIBAgIIKYlNxwJa+owwDQYJKoZIhvcNAQELBQAwODELMAkGA1UEBhMCUlMxEzARBgNVBAoTCkdyYWZ0IFRlc3QxFDASBgNVBAMTC0V4YW1wbGUuQ09NMB4XDTI0MDEwMTAwMDAwMFoXDTMzMTIyOTAwMDAwMFowODELMAkGA1UEBhMCUlMxEzARBgNVBAoTCkdyYWZ0IFRlc3QxFDASBgNVBAMTC0V4YW1wbGUuQ09NMIIBIjANBgkqhkiG9w0BAQEFAAOCAQ8AMIIBCgKCAQEAwljWB+KmnHR8l/H6+qwLdv/2cX/ODzylI2gnM2uF1D16h8ZJHzLvwtJWK2vMFPMItlANvOdm85fnLv5m1IVnMEnSPC0KIPclJccRpsV9RMdswRPbztJmtWG+LiTfn264x7RnzDQLvSF1Apk0AiA7PAyaUYKclFNjpS3S8+dN5WAKqTasZxt6TNZV49NiTW4l7LuHiHC1TDAFeWUCj0CcThnsPMcvrMa/tk4G9KVNktuMtC839eW0TJLS7ZWnJ5qZj1XgO79vNsadpEDHrHRBBAM9gvAc0HhUN1PSY92XlQhaf7adkXfuHxaemEf+87ta6LkADnggwVTFsHu/uYuHnwIDAQABo1swWTAdBgNVHQ4EFgQU2jiQB16Z70CHALjmtcShLOqlm6EwOAYDVR0RBDEwL4IPd3d3LmV4YW1wbGUuY29tgg9BUEkuRXhhbXBsZS5vcmeCC2V4YW1wbGUuY29tMA0GCSqGSIb3DQEBCwUAA4IBAQAI8FouXI0kxbNrUaXcyKgUTXCPTfs1+CXIkspRV27YfbY45Ebup9fe7HxIx2VTg39xGxX8YDzsOK6Atg/dQxrhedsV8MuEUtNry50uquuBarj8U91LE60KTStEMRmUbfcNKs/VH28THUkZCqzj5JCOwNcs4G2Y6ALmuVb0ErtaCNAHhhkIfH6LmjifSCE9A+39pnSOa0DcIIxUZexMaUhExe7r4sjQXkaQRQ2L0uELi3RZk0Lh9Q3rGvXnPLkiskXt4suHQXXXE+VYP3avuVDnrbq3QUR0IfhYPMUgpMS520UQHBQuYcehnVChOMY1nwXp9w8I0Nw3e0PSLIfFWcnu"

  val certDer: Array[Byte] = Base64.getDecoder.decode(certB64)

  /** CT Merkle leaf wrapper, reference layout (ct_ingestor.py:116-123):
    * byte0 leaf type, 11 header bytes, 3-byte big-endian length, DER. */
  def makeLeaf(der: Array[Byte], leafType: Byte = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(leafType)
    out.write(new Array[Byte](11))
    out.write((der.length >> 16) & 0xff)
    out.write((der.length >> 8) & 0xff)
    out.write(der.length & 0xff)
    out.write(der)
    out.toByteArray
  }

  def leafB64: String = Base64.getEncoder.encodeToString(makeLeaf(certDer))

  /** The fixture DER with `tag` XOR-stamped into its last 8 bytes — the
    * tail of the signatureValue BIT STRING, so the result is still valid
    * DER (no length changes; `CertificateFactory.generateCertificate`
    * never verifies signatures) but carries a distinct SHA-256
    * fingerprint per tag. The zero-egress way to synthesize certificate
    * VOLUME: ingest-throughput probes and uniqueness-sensitive tests
    * get one distinct cert per (log, index) without minting and signing
    * real certificates. */
  def uniqueDer(tag: Long): Array[Byte] = {
    val der = certDer.clone()
    var v = tag
    var k = 0
    while (k < 8) {
      der(der.length - 1 - k) = (der(der.length - 1 - k) ^ (v & 0xffL)).toByte
      v >>= 8
      k += 1
    }
    der
  }
}
