package graft

import java.nio.charset.StandardCharsets

import graft.operators.Warc

/** [[Warc]] — framing semantics on hand-built containers: decoy magic
  * inside bodies, octet (not char) lengths, and loud rejection of every
  * malformed-framing shape.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, body: String,
      extraHeader: String = "", lenOverride: Option[Long] = None): String = {
    val len = lenOverride.getOrElse(
      body.getBytes(StandardCharsets.UTF_8).length.toLong)
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"${extraHeader}Content-Length: $len\r\n\r\n$body\r\n\r\n"
  }

  private def parse(s: String) =
    Warc.parseAll(7L, s.getBytes(StandardCharsets.UTF_8))

  test("two records round-trip with headers, order, and bodies intact") {
    val rows = parse(rec("http://a", "hello world") +
      rec("http://b", "<html>page two</html>",
        extraHeader = "WARC-Date: 2024-06-01T00:00:00Z\r\n"))
    assert(rows.map(r => (r.getInt(1), r.getString(3), r.getString(6))) ==
      Seq((0, "http://a", "hello world"),
        (1, "http://b", "<html>page two</html>")))
    assert(rows(1).getString(4) == "2024-06-01T00:00:00Z")
    assert(rows.forall(_.getString(2) == "response"))
  }

  test("a body containing the record magic is NOT split (Content-Length framing)") {
    val decoy = "see this archived snippet: WARC/1.0\r\nWARC-Type: fake\r\n\r\n end"
    val rows = parse(rec("http://a", decoy) + rec("http://b", "next"))
    assert(rows.size == 2)
    assert(rows.head.getString(6) == decoy)
    assert(rows(1).getString(3) == "http://b")
  }

  test("Content-Length counts octets, not characters") {
    val body = "café — résumé" // multi-byte UTF-8
    val rows = parse(rec("http://a", body))
    assert(rows.head.getString(6) == body)
    assert(rows.head.getLong(5) ==
      body.getBytes(StandardCharsets.UTF_8).length.toLong)
  }

  test("header names are case-insensitive") {
    val body = "x"
    val s = "WARC/1.0\r\nwarc-type: response\r\nCONTENT-LENGTH: 1\r\n\r\n" +
      body + "\r\n\r\n"
    assert(parse(s).head.getString(6) == "x")
  }

  test("every malformed-framing shape fails loudly with container id and offset") {
    def boom(s: String, what: String): Unit = {
      val e = intercept[IllegalArgumentException](parse(s))
      assert(e.getMessage.contains("container 7"), e.getMessage)
      assert(e.getMessage.contains(what),
        s"wanted '$what' in: ${e.getMessage}")
    }
    boom("HTTP/1.1 200 OK\r\n\r\n", "expected WARC/1.0")
    boom("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n",
      "without Content-Length")
    boom(rec("http://a", "full body", lenOverride = Some(500L)),
      "truncated")
    boom("WARC/1.0\r\nContent-Length: nope\r\n\r\n", "unparseable")
    // correct length but missing terminator
    boom("WARC/1.0\r\nContent-Length: 4\r\n\r\nbody", "terminator")
    // trailing garbage after a valid record = another (bad) record
    boom(rec("http://a", "ok") + "junk", "expected WARC/1.0")
  }

  test("records() explodes binary containers distributively") {
    import org.apache.spark.sql.functions.col
    val blob1 = (rec("http://a/1", "one") + rec("http://a/2", "two"))
      .getBytes(StandardCharsets.UTF_8)
    val blob2 = rec("http://b/1", "three").getBytes(StandardCharsets.UTF_8)
    val df = Seq((1L, blob1), (2L, blob2)).toDF("file_id", "blob")
    val got = Warc.records(df, "file_id", "blob")
      .select(col("file_id"), col("rec_idx"), col("target_uri"), col("body"))
      .as[(Long, Int, String, String)].collect().sorted.toSeq
    assert(got == Seq((1L, 0, "http://a/1", "one"),
      (1L, 1, "http://a/2", "two"), (2L, 0, "http://b/1", "three")))
  }
}
