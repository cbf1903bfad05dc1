package graft.ct

import org.scalatest.funsuite.AnyFunSuite

class PublicSuffixSpec extends AnyFunSuite {
  private def bd(s: String) = PublicSuffix.baseDomain(s)

  test("simple gTLD registrable domains") {
    assert(bd("example.com") == "example.com")
    assert(bd("www.example.com") == "example.com")
    assert(bd("a.b.c.example.org") == "example.org")
  }

  test("multi-label public suffixes") {
    assert(bd("a.b.example.co.uk") == "example.co.uk")
    assert(bd("foo.gov.uk") == "foo.gov.uk")
    assert(bd("x.y.com.au") == "y.com.au")
  }

  test("bare suffix returns itself (reference publicsuffix2 edge, SURVEY §7.4)") {
    assert(bd("com") == "com")
    assert(bd("co.uk") == "co.uk")
  }

  test("unknown TLD falls back to default * rule (last label)") {
    assert(bd("foo.internal") == "foo.internal")
    assert(bd("a.b.corp.internal") == "corp.internal")
  }

  test("wildcard and exception rules") {
    assert(bd("a.b.ck") == "a.b.ck")      // *.ck → suffix b.ck, registrable a.b.ck
    assert(bd("www.ck") == "www.ck")      // !www.ck → suffix ck, registrable www.ck
    assert(bd("x.www.ck") == "www.ck")
  }

  test("case/dot normalization and nulls") {
    assert(bd("WWW.Example.COM") == "example.com")
    assert(bd(".example.com.") == "example.com")
    assert(bd(null) == null)
    assert(bd("") == "")
  }
}
