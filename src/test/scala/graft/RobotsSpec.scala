package graft

import graft.operators.Robots

/** [[Robots]] — RFC 9309 subset semantics: group attribution (shared
  * User-agent lines), exact-agent-else-star selection, longest-prefix
  * decision with Allow winning ties, and the no-file/no-match/empty-
  * disallow allow-alls.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robotsTxt =
    """# site robots
      |User-agent: crawler-x
      |User-agent: crawler-y
      |Disallow: /private/
      |Allow: /private/ok/
      |
      |User-agent: *
      |Disallow: /tmp/
      |DISALLOW: /cgi/
      |Allow: /tmp/pub
      |Disallow:
      |Junk line without colon meaning
      |""".stripMargin

  private def decide(agent: String, urls: String*): Map[String, Boolean] = {
    val r = Seq(("site.com", robotsTxt)).toDF("host", "txt")
    Robots.allowed(urls.toDF("u"), "u", r, "host", "txt", agent)
      .as[(String, Boolean)].collect().toMap
  }

  test("rules(): groups, shared UA lines, case-insensitive fields, empty disallow dropped") {
    val got = Robots.rules(Seq(("site.com", robotsTxt)).toDF("host", "txt"), "host", "txt")
      .select("agent", "rule", "prefix")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("crawler-x", "disallow", "/private/"), ("crawler-x", "allow", "/private/ok/"),
      ("crawler-y", "disallow", "/private/"), ("crawler-y", "allow", "/private/ok/"),
      ("*", "disallow", "/tmp/"), ("*", "disallow", "/cgi/"),
      ("*", "allow", "/tmp/pub")))
  }

  test("exact-agent group beats the star group; star applies to unknown agents") {
    val x = decide("Crawler-X",
      "http://site.com/private/page", "http://site.com/private/ok/page",
      "http://site.com/tmp/anything")
    // crawler-x uses ITS group only: /tmp/ rule (star group) does not apply
    assert(x == Map(
      "http://site.com/private/page" -> false,
      "http://site.com/private/ok/page" -> true, // longest match is Allow
      "http://site.com/tmp/anything" -> true))
    val other = decide("somebody-else",
      "http://site.com/tmp/secret", "http://site.com/tmp/pub/x",
      "http://site.com/cgi/a", "http://site.com/open/")
    assert(other == Map(
      "http://site.com/tmp/secret" -> false,
      "http://site.com/tmp/pub/x" -> true, // /tmp/pub longer than /tmp/
      "http://site.com/cgi/a" -> false,
      "http://site.com/open/" -> true))
  }

  test("equal-length Allow and Disallow: Allow wins") {
    val r = Seq(("h.com", "User-agent: *\nAllow: /a/\nDisallow: /a/\n"))
      .toDF("host", "txt")
    val got = Robots.allowed(Seq("http://h.com/a/x").toDF("u"), "u",
      r, "host", "txt", "bot").as[(String, Boolean)].collect().toMap
    assert(got("http://h.com/a/x"))
  }

  test("hosts without robots, paths without rules, and bare hosts are allowed") {
    val got = decide("bot",
      "http://other.com/anything", "http://site.com/unrestricted", "http://site.com")
    assert(got.values.forall(identity))
  }
}
