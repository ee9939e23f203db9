package graft

import org.apache.spark.sql.functions.col

import graft.operators.HtmlExtract

/** [[HtmlExtract]] — hand-authored fixtures pinning the extraction
  * semantics (content-element dropping, block structure, entity decode
  * order, link metrics) and the documented regex-grade limits.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.htmlText(col("h")).as("t"))
      .as[String].head()

  test("scripts, styles, and comments drop WITH their content") {
    val html = "<html><head><style>p{color:red}</style>" +
      "<script>var x = 1 < 2; document.write('<p>injected</p>');</script>" +
      "</head><body><!-- hidden <b>note</b> --><p>kept</p></body></html>"
    assert(extract(html) == "kept")
  }

  test("block tags become line structure, inline tags vanish in place") {
    val html = "<body><h1>Title</h1><p>first <b>bold</b> para</p>" +
      "<ul><li>one</li><li>two</li></ul><p>a<br>b</p></body>"
    assert(extract(html) ==
      "Title\nfirst bold para\none\ntwo\na\nb")
  }

  test("entity decode: named entities, &amp; last (no double decode)") {
    val html = "<p>fish &amp; chips, 1 &lt; 2, say &quot;hi&quot;," +
      " it&#39;s&nbsp;here, literal &amp;lt; stays</p>"
    assert(extract(html) ==
      "fish & chips, 1 < 2, say \"hi\", it's here, literal &lt; stays")
  }

  test("whitespace normalizes: space runs, break runs, edges") {
    val html = "<div>  a   b\t c </div><div></div><div></div><div></div>" +
      "<div> d </div>"
    assert(extract(html) == "a b c\nd")
  }

  test("title extraction decodes and trims; absent title is empty") {
    val df = Seq(
      "<html><head><title> Fish &amp; Chips </title></head></html>",
      "<html><body>no title</body></html>").toDF("h")
      .select(HtmlExtract.htmlTitle(col("h")).as("t")).as[String].collect()
    assert(df.toSeq == Seq("Fish & Chips", ""))
  }

  test("links in document order; anchor chars and link density") {
    val html = "<body><p>Read the long prose paragraph here.</p>" +
      "<div><a href=\"/a\">go</a> <a href=\"/b\"><b>now</b></a></div></body>"
    val row = Seq(html).toDF("h").select(
      HtmlExtract.htmlLinks(col("h")).as("links"),
      HtmlExtract.anchorChars(col("h")).as("ac"),
      HtmlExtract.linkDensity(col("h")).as("ld"))
      .head()
    assert(row.getSeq[String](0) == Seq("/a", "/b"))
    assert(row.getInt(1) == 5) // "go" + "now"
    val text = extract(html)
    assert(math.abs(row.getDouble(2) - 5.0 / text.length) < 1e-12)
  }

  test("nav-heavy block scores high link density, prose scores low") {
    val nav = "<div><a href=\"/1\">home</a> <a href=\"/2\">about</a> " +
      "<a href=\"/3\">contact</a></div>"
    val prose = "<p>A long paragraph of real prose with only one " +
      "<a href=\"/x\">link</a> buried among many ordinary words.</p>"
    val ds = Seq(nav, prose).toDF("h")
      .select(HtmlExtract.linkDensity(col("h")).as("ld")).as[Double].collect()
    assert(ds(0) > 0.7, s"nav density ${ds(0)}")
    assert(ds(1) < 0.1, s"prose density ${ds(1)}")
  }

  test("documented limits hold shape: attribute '>' splits early, CDATA is text") {
    // a '>' inside an attribute value ends the tag at that point —
    // the tail of the attribute surfaces as text (regex-grade contract)
    assert(extract("<p title=\"a>b\">x</p>").contains("x"))
    // a '>'-free CDATA section strips as one opaque tag
    assert(extract("<p>a<![CDATA[raw]]>b</p>") == "ab")
    // malformed: unclosed tags never throw
    assert(extract("<p>open <b>bold") == "open bold")
    // empty / tagless inputs pass through
    assert(extract("plain text") == "plain text")
    assert(extract("") == "")
  }
}
