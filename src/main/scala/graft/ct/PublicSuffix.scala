package graft.ct

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Registrable ("base") domain via the Public Suffix List algorithm —
  * the engine-side equivalent of the reference's
  * `psl.get_public_suffix(d)` (/root/reference/ingestion/ct_ingestor.py:39,146-147).
  *
  * Semantics pinned to the reference library's observable behavior
  * (SURVEY §7.4): returns the registrable domain (`a.b.example.co.uk` →
  * `example.co.uk`); for a bare public suffix or single label the input's
  * suffix itself is returned. Matching is case-insensitive; output is
  * lowercase.
  *
  * Ships an embedded subset of the PSL (zero-egress build; the full
  * `public_suffix_list.dat` can be dropped in via `loadRules`). Exact,
  * wildcard (`*.ck`) and exception (`!www.ck`) rules are all supported, so
  * swapping in the full list is a data change only.
  */
object PublicSuffix extends Serializable {

  /** Embedded PSL subset: generic TLDs + common ccTLD second-level rules +
    * wildcard/exception examples. One rule per element, PSL syntax. */
  private val embeddedRules: Seq[String] = Seq(
    // generic
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz", "name",
    "pro", "io", "ai", "app", "dev", "xyz", "online", "site", "tech",
    "store", "blog", "cloud", "me", "tv", "cc", "rs", "su",
    // ccTLDs (flat)
    "de", "fr", "it", "es", "nl", "pl", "ru", "ua", "se", "no", "fi", "dk",
    "ch", "at", "be", "cz", "sk", "hu", "ro", "bg", "gr", "pt", "ie", "lt",
    "lv", "ee", "hr", "si", "ba", "mk", "al", "is", "lu", "li", "mt", "cy",
    "tr", "il", "in", "cn", "jp", "kr", "au", "nz", "za", "br", "mx", "ar",
    "ca", "us", "uk",
    // common second-level rules
    "co.uk", "org.uk", "me.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    "co.za", "org.za", "net.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua",
    // wildcard + exception (exercises the full algorithm)
    "*.ck", "!www.ck")

  final case class Rules(
      exact: Set[String], wildcardBase: Set[String], exception: Set[String])

  val rules: Rules = loadRules(embeddedRules)

  def loadRules(lines: Seq[String]): Rules = {
    val cleaned = lines.map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
    Rules(
      exact = cleaned.filterNot(l => l.startsWith("*.") || l.startsWith("!")).toSet,
      wildcardBase = cleaned.filter(_.startsWith("*.")).map(_.drop(2)).toSet,
      exception = cleaned.filter(_.startsWith("!")).map(_.drop(1)).toSet)
  }

  /** Registrable domain of `d` per the PSL algorithm; null in → null out. */
  def baseDomain(d: String): String = baseDomain(d, rules)

  def baseDomain(domainRaw: String, r: Rules): String = {
    if (domainRaw == null) return null
    val d = domainRaw.toLowerCase.stripPrefix(".").stripSuffix(".")
    if (d.isEmpty) return d
    val labels = d.split('.')
    val n = labels.length
    // Find the longest matching public suffix, scanning longest-first.
    // suffixStart = index of the first label of the public suffix.
    var suffixStart = n - 1 // default rule "*": last label
    var i = 0
    var found = false
    while (i < n && !found) {
      val s = labels.slice(i, n).mkString(".")
      val parent = if (i + 1 <= n) labels.slice(i + 1, n).mkString(".") else ""
      if (r.exception.contains(s)) {
        // exception rule: public suffix is the rule minus its first label
        suffixStart = i + 1; found = true
      } else if (r.exact.contains(s)) {
        suffixStart = i; found = true
      } else if (parent.nonEmpty && r.wildcardBase.contains(parent)) {
        // rule *.parent matches s (= one label + parent)
        suffixStart = i; found = true
      } else i += 1
    }
    // registrable domain = public suffix plus one preceding label;
    // bare suffix → the suffix itself (reference publicsuffix2 behavior).
    val regStart = math.max(suffixStart - 1, 0)
    labels.slice(regStart, n).mkString(".")
  }

  /** Column-level form for the ingest pipeline. A plain Scala UDF is
    * deliberate (SURVEY §2.11): it runs once per ingested row, not in the
    * query hot path; upgrade to a codegen Expression only if profiling
    * demands. */
  val baseDomainUdf = udf((d: String) => baseDomain(d))

  def base_domain(c: Column): Column = baseDomainUdf(c)
}
