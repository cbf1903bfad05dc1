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
  * Ships the complete `public_suffix_list.dat` (ICANN + private sections)
  * as a bundled classpath resource — the default ruleset is the full list.
  * Exact, wildcard (`*.ck`) and exception (`!www.ck`) rules are all
  * supported; a newer list is a pure data swap via
  * `graft.psl.file`/`GRAFT_PSL_FILE` or `loadRules`.
  */
object PublicSuffix extends Serializable {

  /** Bundled `public_suffix_list.dat` (the complete Mozilla PSL, ICANN +
    * private sections, ~9.5k rules) shipped as a classpath resource so the
    * default ruleset is the full list — no env configuration needed. The
    * resource travels inside the application jar, so executors load it the
    * same way the driver does. */
  private def bundledRules: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null,
      "bundled resource /graft/public_suffix_list.dat missing from classpath " +
        "(broken packaging); set graft.psl.file/GRAFT_PSL_FILE to a PSL file")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList finally src.close()
  }

  final case class Rules(
      exact: Set[String], wildcardBase: Set[String], exception: Set[String])

  /** Active rules: the bundled full PSL by default; a NEWER list is a pure
    * data drop-in — point the `graft.psl.file` system property (or the
    * GRAFT_PSL_FILE env var) at it and it replaces the bundled list at
    * class-init (ship the file to executors with --files; the PSL format's
    * comments/blank lines are handled by loadRules). A CONFIGURED path
    * that cannot be read fails fast: silently falling back to the bundle
    * would let a typo'd path (or a missing --files) corrupt base_domain
    * grouping without any signal.
    *
    * Build cost: a strict `val` on a singleton object — the ~10k-rule
    * parse + IDN punycoding runs ONCE PER JVM at class init (per executor
    * on a cluster), never per task or per row; the UDF body is a static
    * module call that captures nothing. Measured: ct_ingest_pipeline
    * (20k certs through the full PSL) runs 0.81 s at sf0.1 isolated —
    * round 5's in-sweep 3.0 s reading was shared-JVM measurement noise,
    * not per-partition rebuild cost. */
  val rules: Rules = {
    val external = sys.props.get("graft.psl.file").orElse(sys.env.get("GRAFT_PSL_FILE"))
      .map { p =>
        require(java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)),
          s"graft.psl.file/GRAFT_PSL_FILE points at unreadable path: $p")
        val src = scala.io.Source.fromFile(p, "UTF-8")
        try src.getLines().toList finally src.close()
      }
    loadRules(external.getOrElse(bundledRules))
  }

  /** Parse PSL lines into rule sets. Every rule is stored in BOTH its
    * Unicode and punycode (IDN toASCII) form: the PSL ships rules as
    * Unicode, but the domains this pipeline actually processes come from
    * X.509 SANs, which carry the punycoded (xn--) form — rules that only
    * matched Unicode input would be dead against real certificates. */
  def loadRules(lines: Seq[String]): Rules = {
    val cleaned = lines.map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
    def punycode(rule: String): Option[String] =
      try {
        val ascii = rule.split('.')
          .map(l => if (l == "*") l else java.net.IDN.toASCII(l)).mkString(".")
        if (ascii != rule) Some(ascii) else None
      } catch { case _: Throwable => None }
    def forms(rs: Seq[String]): Set[String] = (rs ++ rs.flatMap(punycode)).toSet
    Rules(
      exact = forms(cleaned.filterNot(l => l.startsWith("*.") || l.startsWith("!"))),
      wildcardBase = forms(cleaned.filter(_.startsWith("*.")).map(_.drop(2))),
      exception = forms(cleaned.filter(_.startsWith("!")).map(_.drop(1))))
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
