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

  // ------------------------------------------------------------ .warc.gz

  private def gz(payload: String): Array[Byte] =
    Warc.gzipMember(payload.getBytes(StandardCharsets.UTF_8))

  private def gunzip(bytes: Array[Byte]): Array[Byte] =
    Warc.gunzipMembers(7L, bytes)

  test("gzip member chain inflates and parses identically to the uncompressed container") {
    val r1 = rec("http://a", "hello world")
    val r2 = rec("http://b", "café — résumé")
    val plain = parse(r1 + r2)
    val viaGz = Warc.parseAll(7L, gunzip(gz(r1) ++ gz(r2)))
    assert(viaGz == plain)
  }

  test("a record may straddle members and a member may carry several records") {
    val r1 = rec("http://a", "one")
    val r2 = rec("http://b", "two")
    val r3 = rec("http://c", "three")
    val all = r1 + r2 + r3
    // split mid-record-2: members and records are independent framings
    val cut = r1.length + r2.length / 2
    val blob = gz(all.substring(0, cut)) ++ gz(all.substring(cut))
    assert(Warc.parseAll(7L, gunzip(blob)) == parse(all))
  }

  test("optional header fields (FEXTRA, FNAME, FCOMMENT, FHCRC, FTEXT) all walk correctly") {
    val payload = rec("http://a", "opt fields")
    val base = gz(payload)
    // splice optional fields into the fixed header by hand:
    // FTEXT|FHCRC|FEXTRA|FNAME|FCOMMENT = 0x1f
    val extra = Array[Byte](3, 0, 'x', 'y', 'z') // XLEN=3 LE + 3 octets
    val name = "file.warc".getBytes(StandardCharsets.US_ASCII) :+ 0.toByte
    val comment = "a comment".getBytes(StandardCharsets.US_ASCII) :+ 0.toByte
    val header = base.take(10)
    header(3) = 0x1f.toByte
    val preCrc = header ++ extra ++ name ++ comment
    val crc = new java.util.zip.CRC32
    crc.update(preCrc)
    val hcrc = Array[Byte]((crc.getValue & 0xff).toByte,
      ((crc.getValue >> 8) & 0xff).toByte)
    val blob = preCrc ++ hcrc ++ base.drop(10)
    assert(new String(gunzip(blob), StandardCharsets.UTF_8) == payload)
  }

  test("hostile gzip shapes fail loudly: magic, reserved bits, CRC, ISIZE, truncation, bomb") {
    def boom(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](gunzip(bytes))
      assert(e.getMessage.contains("container 7"), e.getMessage)
      assert(e.getMessage.contains(what), s"wanted '$what' in: ${e.getMessage}")
    }
    val good = gz(rec("http://a", "body"))
    boom("not gzip at all".getBytes(StandardCharsets.US_ASCII), "bad gzip magic")
    val badCm = good.clone(); badCm(2) = 9; boom(badCm, "unsupported gzip CM")
    val resv = good.clone(); resv(3) = 0x80.toByte; boom(resv, "reserved gzip FLG")
    val badCrc = good.clone()
    badCrc(badCrc.length - 8) = (badCrc(badCrc.length - 8) ^ 0xff).toByte
    boom(badCrc, "CRC32 mismatch")
    val badIsize = good.clone()
    badIsize(badIsize.length - 1) = (badIsize(badIsize.length - 1) ^ 0x7f).toByte
    boom(badIsize, "ISIZE mismatch")
    boom(good.take(good.length - 12), "truncated")
    boom(good.take(8), "truncated gzip member header")
    val flipped = good.clone()
    flipped(12) = (flipped(12) ^ 0x55).toByte // damage the deflate stream
    val e = intercept[IllegalArgumentException](gunzip(flipped))
    assert(e.getMessage.contains("container 7"))
    // decompression bomb: a member claiming/containing >256 MiB is refused
    // before allocation runs away — build 512 MiB of zeros via deflate
    // (compresses to ~500 KiB) and expect the guard, not an OOM
    val bomb = Warc.gzipMember(new Array[Byte](300 << 20))
    boom(bomb, "bomb guard")
  }

  test("gzRecords() parses .warc.gz containers distributively, equal to records()") {
    import org.apache.spark.sql.functions.col
    val r1 = rec("http://a/1", "one")
    val r2 = rec("http://a/2", "two")
    val r3 = rec("http://b/1", "three")
    val df = Seq(
      (1L, gz(r1) ++ gz(r2)),
      (2L, gz(r3))).toDF("file_id", "blob")
    val got = Warc.gzRecords(df, "file_id", "blob")
      .select(col("file_id"), col("rec_idx"), col("target_uri"), col("body"))
      .as[(Long, Int, String, String)].collect().sorted.toSeq
    assert(got == Seq((1L, 0, "http://a/1", "one"),
      (1L, 1, "http://a/2", "two"), (2L, 0, "http://b/1", "three")))
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
