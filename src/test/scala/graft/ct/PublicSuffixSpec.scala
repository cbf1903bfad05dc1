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

  test("private-section registries: hosted-platform subdomains are registrable") {
    assert(bd("myuser.github.io") == "myuser.github.io")
    assert(bd("a.b.myuser.github.io") == "myuser.github.io")
    assert(bd("mysite.blogspot.com") == "mysite.blogspot.com")
    assert(bd("app-1234.herokuapp.com") == "app-1234.herokuapp.com")
    assert(bd("ec2-1-2-3-4.us-east-1.compute.amazonaws.com")
      == "ec2-1-2-3-4.us-east-1.compute.amazonaws.com") // *.compute.amazonaws.com
    // plain subdomains of the operator's own site are NOT private suffixes
    assert(bd("www.github.com") == "github.com")
  }

  test("ccTLD families: com.sa-class second-level registries") {
    assert(bd("www.example.com.sa") == "example.com.sa")
    assert(bd("shop.example.com.br") == "example.com.br")
    assert(bd("a.example.co.ke") == "example.co.ke")
    assert(bd("x.example.ac.in") == "example.ac.in")
  }

  test("jp metro wildcards with city exceptions") {
    assert(bd("a.b.kawasaki.jp") == "a.b.kawasaki.jp")     // *.kawasaki.jp
    assert(bd("x.city.kawasaki.jp") == "city.kawasaki.jp") // !city.kawasaki.jp
    assert(bd("www.example.co.jp") == "example.co.jp")
  }

  test("IDN suffixes in Unicode form") {
    assert(bd("пример.рф") == "пример.рф")
    assert(bd("www.пример.рф") == "пример.рф")
    assert(bd("例え.中国") == "例え.中国")
    assert(bd("www.example.香港") == "example.香港")
  }

  test("IDN suffixes match the punycoded form X.509 SANs actually carry") {
    // пример.рф as a certificate would present it
    assert(bd("www.xn--e1afmkfd.xn--p1ai") == "xn--e1afmkfd.xn--p1ai")
    assert(bd("xn--fsqu00a.xn--fiqs8s") == "xn--fsqu00a.xn--fiqs8s") // 例子.中国
    assert(bd("a.b.example.xn--j6w193g") == "example.xn--j6w193g")   // .香港
  }

  test("full PSL file is a data drop-in via loadRules (dat format)") {
    val dat =
      """// ===BEGIN ICANN DOMAINS===
        |com
        |
        |// co.uk and friends
        |uk
        |co.uk
        |*.ck
        |!www.ck
        |// ===BEGIN PRIVATE DOMAINS===
        |github.io
        |""".stripMargin
    val r = PublicSuffix.loadRules(dat.split("\n").toSeq)
    assert(PublicSuffix.baseDomain("a.b.example.co.uk", r) == "example.co.uk")
    assert(PublicSuffix.baseDomain("x.user.github.io", r) == "user.github.io")
    assert(PublicSuffix.baseDomain("x.www.ck", r) == "www.ck")
  }

  test("round-3 coverage: previously-uncovered ccTLDs, registries, gTLDs, IDNs") {
    // ccTLDs that had no rule before round 3 (fell through to the default *)
    assert(bd("www.example.bt") == "example.bt")
    assert(bd("shop.example.com.bt") == "example.com.bt")
    assert(bd("a.example.gouv.ht") == "example.gouv.ht")
    assert(bd("x.example.co.tt") == "example.co.tt")
    // European second-level registries added in round 3
    assert(bd("www.example.gouv.fr") == "example.gouv.fr")
    assert(bd("a.b.example.nom.es") == "example.nom.es")
    // new-gTLD coverage
    assert(bd("www.example.pizza") == "example.pizza")
    assert(bd("a.b.example.ninja") == "example.ninja")
    // hosted-platform private registries added in round 3
    assert(bd("shop.mystore.myshopify.com") == "mystore.myshopify.com")
    assert(bd("a.b.myhost.duckdns.org") == "myhost.duckdns.org")
    assert(bd("example-com.translate.goog") == "example-com.translate.goog")
    assert(bd("docs.myproj.pantheonsite.io") == "myproj.pantheonsite.io")
    // IDN ccTLDs added in round 3 (Unicode and punycode forms)
    assert(bd("www.мысал.қаз") == "мысал.қаз")
    assert(bd("www.օրինակ.հայ") == "օրինակ.հայ")
  }

  test("round-5: full bundled PSL covers suffixes the old subset missed") {
    // co.gl: old subset had only flat "gl", which mis-grouped co.gl regs
    assert(bd("www.example.co.gl") == "example.co.gl")
    // gov.scot: .scot second-level registry, never in the subset
    assert(bd("www.example.gov.scot") == "example.gov.scot")
    // Norwegian municipality suffix (full list carries every kommune)
    assert(bd("skole.eidsvoll.no") == "skole.eidsvoll.no")
    // IDN gTLDs only in the full list (Unicode + punycode forms)
    assert(bd("www.пример.онлайн") == "пример.онлайн")
    assert(bd("www.beispiel.vermögensberatung") == "beispiel.vermögensberatung")
    assert(bd("www.xn--e1afmkfd.xn--80asehdb") == "xn--e1afmkfd.xn--80asehdb") // .онлайн
    // private-section dynamic-DNS registries only in the full list
    assert(bd("a.myhost.dyndns-ip.com") == "myhost.dyndns-ip.com")
    assert(bd("x.home.is-a-geek.com") == "home.is-a-geek.com")
    assert(bd("shop.x.barsy.menu") == "x.barsy.menu")
  }

  test("case/dot normalization and nulls") {
    assert(bd("WWW.Example.COM") == "example.com")
    assert(bd(".example.com.") == "example.com")
    assert(bd(null) == null)
    assert(bd("") == "")
  }
}
