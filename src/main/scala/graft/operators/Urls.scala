package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction — the layer
  * between [[HtmlExtract]]'s raw hrefs and every per-domain curation
  * decision (domain caps, blocklists, per-site quality priors: the
  * C4/RefinedWeb moves). No reference analog (SURVEY.md §2.11 crawl
  * surface).
  *
  * Everything here is PURE Column arithmetic over the repo's
  * fixed-pass canonicalization subset, so it rides codegen in the scan
  * projection and replays verbatim in DuckDB (q236's oracle CTE chain
  * mirrors [[normalize]] step for step; [[pathCleanupSql]] /
  * [[registrableDomainSql]] / [[hostSql]] emit the shared pieces).
  * The subset (documented, spec-pinned):
  *
  *   1. fragment stripped;
  *   2. scheme + authority lowercased (path/query case PRESERVED);
  *   3. default ports stripped (http :80, https :443 — only those);
  *   4. duplicate slashes in the path collapsed;
  *   5. `/./` segments removed and `seg/../` collapsed — BOUNDED
  *      dot-segment resolution (4 and 8 fixed passes): nesting deeper
  *      than the pass count stays partially collapsed on both engines
  *      alike (global regex replace rescans from after each
  *      replacement, so consecutive `/./`s need multiple passes — the
  *      bound makes that deterministic instead of data-dependent).
  *
  * Query strings are preserved byte-for-byte (param reordering changes
  * semantics on real sites); percent-decoding is out of scope.
  */
object Urls {

  private val DotPasses = 4
  private val DotDotPasses = 8

  /** `seg/../` where seg is a REAL segment — the alternation excludes
    * `.` and `..` themselves ("`..` eats `..`" would mis-collapse
    * `a/b/../../`), written without lookarounds so RE2 (DuckDB) and
    * java.util.regex agree.
    */
  private val DotDotPat = "([^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)/\\.\\./"

  /** Canonicalize a URL column per the subset above. */
  def normalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // authority = scheme://host[:port] — everything before the first
    // path-or-query character after the //
    val auth = regexp_extract(noFrag, "^([^/?]*//[^/?]*)", 1)
    val rest = noFrag.substr(length(auth) + 1, length(noFrag))
    val authLc = lower(auth)
    val authPort = when(authLc.startsWith("http://"),
        regexp_replace(authLc, ":80$", ""))
      .when(authLc.startsWith("https://"),
        regexp_replace(authLc, ":443$", ""))
      .otherwise(authLc)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = rest.substr(length(path) + 1, length(rest))
    var p = regexp_replace(path, "/{2,}", "/")
    (1 to DotPasses).foreach(_ => p = regexp_replace(p, "/\\./", "/"))
    p = regexp_replace(p, "/\\.$", "/")
    (1 to DotDotPasses).foreach(_ => p = regexp_replace(p, DotDotPat, ""))
    concat(authPort, p, query)
  }

  /** The [[normalize]] path-cleanup pass chain over a SQL expression
    * `p` — the DuckDB twin of step 4–5, pass for pass (the 'g' flag:
    * DuckDB replaces first-only by default, Spark globally).
    */
  def pathCleanupSql(p: String): String = {
    var e = s"regexp_replace($p, '/{2,}', '/', 'g')"
    (1 to DotPasses).foreach(_ => e = s"regexp_replace($e, '/\\./', '/', 'g')")
    e = s"regexp_replace($e, '/\\.$$', '/', 'g')"
    (1 to DotDotPasses).foreach(_ => e = s"regexp_replace($e, '$DotDotPat', '', 'g')")
    e
  }

  /** Default public-suffix sample for specs/queries — a literal, NOT
    * the live PSL (zero-egress build; swap in the full list in
    * deployment). Longest match wins regardless of list order.
    */
  val DefaultSuffixes: Seq[String] = Seq(
    "co.uk", "gov.uk", "ac.uk", "com.au", "co.jp",
    "com", "org", "net", "io", "uk", "edu", "gov")

  /** Registrable domain (eTLD+1) of a HOST column under a literal
    * public-suffix list: the last label before the LONGEST matching
    * suffix, plus the suffix — `''` when no suffix matches or the host
    * IS a bare suffix. Chained `when` ordered longest-suffix-first
    * (foldRight, so the tree stays linear in the list size); each arm
    * is one anchored regexp_extract — the whole dispatch is a
    * codegen'd scalar.
    */
  def registrableDomain(host: Column,
      suffixes: Seq[String] = DefaultSuffixes): Column = {
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), s))
    val chain = ordered.foldRight(lit(""): Column) { (s, elseCol) =>
      val pat = "([^.]+\\." + s.replace(".", "\\.") + ")$"
      when(host.rlike(pat), regexp_extract(host, pat, 1)).otherwise(elseCol)
    }
    // a host that IS a public suffix has no registrable domain — and
    // must not fall through to a SHORTER suffix's arm ('co.uk' ends in
    // '.uk' but names no site)
    when(host.isin(ordered: _*), lit("")).otherwise(chain)
  }

  /** DuckDB twin of [[registrableDomain]]. */
  def registrableDomainSql(host: String,
      suffixes: Seq[String] = DefaultSuffixes): String = {
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), s))
    val bare = ordered.map(s => s"'$s'").mkString(", ")
    val arms = ordered.map { s =>
      val pat = "([^.]+\\." + s.replace(".", "\\.") + ")$"
      s"WHEN regexp_matches($host, '$pat') THEN regexp_extract($host, '$pat', 1)"
    }.mkString("\n    ")
    s"(CASE\n    WHEN $host IN ($bare) THEN ''\n    $arms\n    ELSE '' END)"
  }

  /** Host of an already-[[normalize]]d URL (authority minus scheme,
    * userinfo and port).
    */
  def host(normUrl: Column): Column =
    regexp_extract(normUrl, "^[^/?]*//(?:[^/?@]*@)?([^/?:]*)", 1)

  /** DuckDB twin of [[host]]. */
  def hostSql(e: String): String =
    s"regexp_extract($e, '^[^/?]*//(?:[^/?@]*@)?([^/?:]*)', 1)"
}
