package graft

import org.apache.spark.sql.functions.col

import graft.operators.Urls

/** [[Urls]] — the documented canonicalization subset, pinned case by
  * case, plus eTLD+1 extraction under the literal suffix sample.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(us: String*): Seq[String] =
    us.toDF("u").select(Urls.normalize(col("u")).as("n")).as[String].collect().toSeq

  test("normalize: fragment, case, default ports, dup slashes, dot segments") {
    assert(norm(
      "HTTP://WWW.Example.COM:80/A//B/./Page.HTML#Sec",
      "https://Site.CO.UK:443/posts/../arch/p?q=UPPER#x",
      "http://h.org:8080/keep/port",
      "https://h.net/a/b/c/../../../d",
      "http://h.io/q?a=1&b=2",
      "http://h.com/trail/.",
      "http://h.com") == Seq(
      // authority lowercased + :80 stripped; PATH case preserved
      "http://www.example.com/A/B/Page.HTML",
      // :443 stripped, ../ collapsed, query kept byte-for-byte
      "https://site.co.uk/arch/p?q=UPPER",
      // non-default port survives
      "http://h.org:8080/keep/port",
      // three-level ../ nest fully resolves within the pass bound
      "https://h.net/d",
      "http://h.io/q?a=1&b=2",
      "http://h.com/trail/",
      "http://h.com"))
  }

  test("normalize: no-authority strings pass through the path rules only") {
    assert(norm("mailto:User@x.COM") == Seq("mailto:User@x.COM"))
  }

  test("registrableDomain: longest suffix wins, bare suffixes and unknown TLDs empty") {
    val hosts = Seq("www.site.co.uk", "a.b.gov.uk", "site.com", "x.y.z.io",
      "co.uk", "site.zz", "uk")
    val got = hosts.toDF("h")
      .select(Urls.registrableDomain(col("h")).as("d")).as[String].collect().toSeq
    assert(got == Seq("site.co.uk", "b.gov.uk", "site.com", "z.io", "", "", ""))
  }

  test("host: strips scheme, userinfo, and port from a normalized url") {
    val got = Seq("http://user@h.com:8080/p", "https://h.co.uk/x?q", "http://h.io")
      .toDF("u").select(Urls.host(col("u")).as("h")).as[String].collect().toSeq
    assert(got == Seq("h.com", "h.co.uk", "h.io"))
  }
}
