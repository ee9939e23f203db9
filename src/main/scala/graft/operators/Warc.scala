package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** WARC (ISO 28500) container reader — the on-disk shape of CommonCrawl
  * and every web-archive corpus, i.e. the file format one step UPSTREAM
  * of [[HtmlExtract]] (no reference analog; SURVEY.md §2.11 LLM-pipeline
  * surface). Together they make the real ingest chain native:
  * crawl container → records → HTML → text → quality → dedup.
  *
  * Framing parsed (uncompressed WARC):
  * {{{
  *   WARC/1.0\r\n
  *   <Header-Name>: <value>\r\n   (repeated; names case-insensitive)
  *   \r\n
  *   <exactly Content-Length octets of body>
  *   \r\n\r\n                     (record terminator)
  * }}}
  *
  * A body may itself contain "WARC/1.0\r\n" (crawled pages embed
  * archive snippets all the time), so record boundaries are NOT
  * regex-detectable — only sequential Content-Length framing is
  * correct. That makes this a per-partition imperative parse (the media
  * codecs' pattern: one tight loop over the bytes, `mapPartitions`,
  * no driver involvement), not a Column expression.
  *
  * Malformed framing fails LOUDLY with the container id and byte offset
  * (the repo's hostile-input contract): silently resynchronizing after
  * a bad Content-Length would misattribute every later body in the
  * file.
  *
  * `.warc.gz` (the shape CommonCrawl actually ships: one gzip MEMBER
  * per record, members concatenated) is native too — [[gzRecords]]
  * walks the RFC 1952 member framing by hand (magic, FLG optional
  * fields, header CRC16, reserved-bit refusal), inflates each member
  * through the JDK's raw-deflate `java.util.zip.Inflater` (the same
  * codec the PNG path uses), verifies the member trailer (CRC32 +
  * ISIZE mod 2^32) against the inflated octets, and hands the
  * concatenated payload to the SAME record parser. Record boundaries
  * and member boundaries are independent by spec — a member may carry
  * several records and a record may straddle members — so inflation
  * and framing compose, never merge.
  */
object Warc {

  val recordSchema: StructType = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("body", StringType, nullable = false)))

  private val Magic = "WARC/1.0\r\n".getBytes(StandardCharsets.US_ASCII)

  private def err(id: Long, off: Int, what: String): Nothing =
    throw new IllegalArgumentException(
      s"malformed WARC container $id at byte $off: $what")

  /** Parse one container's records. Package-visible for the spec. */
  private[graft] def parseAll(id: Long, bytes: Array[Byte]): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    var pos = 0
    var idx = 0
    while (pos < bytes.length) {
      if (pos + Magic.length > bytes.length ||
          !java.util.Arrays.equals(bytes, pos, pos + Magic.length,
            Magic, 0, Magic.length))
        err(id, pos, "expected WARC/1.0 record header")
      var p = pos + Magic.length
      // headers until the blank line
      var wType: String = null; var uri: String = null; var date: String = null
      var clen = -1L
      var headerDone = false
      while (!headerDone) {
        val eol = indexOfCrlf(bytes, p, id)
        if (eol == p) { headerDone = true; p += 2 }
        else {
          val line = new String(bytes, p, eol - p, StandardCharsets.UTF_8)
          val colon = line.indexOf(':')
          if (colon < 0) err(id, p, s"header line without ':': $line")
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "warc-type"       => wType = value
            case "warc-target-uri" => uri = value
            case "warc-date"       => date = value
            case "content-length" =>
              clen = try value.toLong
                catch { case _: NumberFormatException =>
                  err(id, p, s"unparseable Content-Length: $value") }
            case _ => // other headers pass through unexamined
          }
          p = eol + 2
        }
      }
      if (clen < 0) err(id, pos, "record without Content-Length")
      if (p + clen > bytes.length)
        err(id, p, s"body truncated: need $clen octets, " +
          s"${bytes.length - p} remain")
      val body = new String(bytes, p, clen.toInt, StandardCharsets.UTF_8)
      p += clen.toInt
      // record terminator
      if (p + 4 > bytes.length ||
          bytes(p) != '\r' || bytes(p + 1) != '\n' ||
          bytes(p + 2) != '\r' || bytes(p + 3) != '\n')
        err(id, p, "missing \\r\\n\\r\\n record terminator")
      p += 4
      out += Row(id, idx, wType, uri, date, clen, body)
      idx += 1
      pos = p
    }
    out.result()
  }

  private def indexOfCrlf(bytes: Array[Byte], from: Int, id: Long): Int = {
    var i = from
    while (i + 1 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n') return i
      i += 1
    }
    err(id, from, "header section without CRLF")
  }

  /** Explode `(idCol: long, blobCol: binary)` containers into WARC
    * records ([[recordSchema]]). One sequential pass per container on
    * the executor that holds it; downstream is ordinary DataFrame land.
    */
  def records(containers: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val idIdx = containers.schema.fieldIndex(idCol)
    val blobIdx = containers.schema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(recordSchema)
    containers.mapPartitions { it =>
      it.flatMap { r =>
        parseAll(r.getLong(idIdx), r.getAs[Array[Byte]](blobIdx))
      }
    }(enc)
  }

  // ------------------------------------------------------------ .warc.gz

  /** Per-member inflated-size ceiling. A WARC record is page-sized;
    * a member claiming to inflate past this is a decompression bomb,
    * refused loudly rather than allocated (the media codecs' guard
    * pattern — see [[Multimodal]]'s allocation guards).
    */
  private val MaxMemberInflated = 1 << 28 // 256 MiB

  /** Walk one container's concatenated RFC 1952 gzip members and return
    * the concatenated inflated payload. Verifies per member: the fixed
    * header (ID1/ID2/CM), reserved FLG bits zero, the optional FEXTRA /
    * FNAME / FCOMMENT fields' framing, the FHCRC header CRC16 when
    * present, and the trailer CRC32 + ISIZE (mod 2^32) against the
    * octets actually inflated. Package-visible for the spec.
    */
  private[graft] def gunzipMembers(id: Long, bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
    var pos = 0
    while (pos < bytes.length) {
      val memberStart = pos
      if (pos + 10 > bytes.length) err(id, pos, "truncated gzip member header")
      if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b)
        err(id, pos, f"bad gzip magic 0x${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      if ((bytes(pos + 2) & 0xff) != 8)
        err(id, pos, s"unsupported gzip CM ${bytes(pos + 2) & 0xff} (only 8 = deflate)")
      val flg = bytes(pos + 3) & 0xff
      if ((flg & 0xe0) != 0)
        err(id, pos, f"reserved gzip FLG bits set: 0x$flg%02x")
      pos += 10 // ID1 ID2 CM FLG MTIME(4) XFL OS
      if ((flg & 0x04) != 0) { // FEXTRA: XLEN little-endian + XLEN octets
        if (pos + 2 > bytes.length) err(id, pos, "truncated FEXTRA length")
        val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        pos += 2
        if (pos + xlen > bytes.length) err(id, pos, "truncated FEXTRA field")
        pos += xlen
      }
      if ((flg & 0x08) != 0) pos = zeroTerminated(id, bytes, pos, "FNAME")
      if ((flg & 0x10) != 0) pos = zeroTerminated(id, bytes, pos, "FCOMMENT")
      if ((flg & 0x02) != 0) { // FHCRC: CRC16 of all header octets so far
        if (pos + 2 > bytes.length) err(id, pos, "truncated FHCRC")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, memberStart, pos - memberStart)
        val want = (crc.getValue & 0xffffL).toInt
        val got = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        if (got != want)
          err(id, pos, f"gzip FHCRC mismatch: header crc16 0x$want%04x, stored 0x$got%04x")
        pos += 2
      }
      // raw-deflate body via the JDK codec
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, pos, bytes.length - pos)
      val crc = new java.util.zip.CRC32
      val buf = new Array[Byte](64 * 1024)
      var inflated = 0L
      try {
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case e: java.util.zip.DataFormatException =>
              err(id, pos, s"corrupt deflate stream: ${e.getMessage}") }
          if (n == 0 && !inf.finished()) {
            if (inf.needsInput())
              err(id, pos, "truncated deflate stream (member body cut mid-block)")
            err(id, pos, "deflate stream stalled without finishing")
          }
          inflated += n
          if (inflated > MaxMemberInflated)
            err(id, memberStart,
              s"gzip member inflates past $MaxMemberInflated octets — refusing (bomb guard)")
          crc.update(buf, 0, n)
          out.write(buf, 0, n)
        }
        pos += inf.getBytesRead.toInt
      } finally inf.end()
      // trailer: CRC32 then ISIZE, both little-endian
      if (pos + 8 > bytes.length) err(id, pos, "truncated gzip trailer")
      val wantCrc = leU32(bytes, pos)
      val wantIsize = leU32(bytes, pos + 4)
      if (wantCrc != crc.getValue)
        err(id, pos, f"gzip CRC32 mismatch: computed 0x${crc.getValue}%08x, stored 0x$wantCrc%08x")
      if (wantIsize != (inflated & 0xffffffffL))
        err(id, pos + 4, s"gzip ISIZE mismatch: inflated $inflated octets, stored $wantIsize")
      pos += 8
    }
    out.toByteArray
  }

  private def zeroTerminated(id: Long, bytes: Array[Byte], from: Int, what: String): Int = {
    var i = from
    while (i < bytes.length && bytes(i) != 0) i += 1
    if (i >= bytes.length) err(id, from, s"unterminated gzip $what field")
    i + 1
  }

  private def leU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** [[records]] for `.warc.gz` containers: inflate the member chain,
    * then run the identical sequential Content-Length framing over the
    * payload. Same per-partition imperative shape — compression adds a
    * pass, not a topology.
    */
  def gzRecords(containers: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val idIdx = containers.schema.fieldIndex(idCol)
    val blobIdx = containers.schema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(recordSchema)
    containers.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseAll(id, gunzipMembers(id, r.getAs[Array[Byte]](blobIdx)))
      }
    }(enc)
  }

  /** One RFC 1952 member (FLG=0, MTIME=0, OS=255) wrapping `payload` —
    * the fixture-encoder twin of [[gunzipMembers]], as every codec here
    * ships one (the spec and the q-fixtures compress with it; decode
    * correctness is pinned by round-trip + trailer verification).
    */
  def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 32)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val def_ = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    def_.setInput(payload); def_.finish()
    val buf = new Array[Byte](64 * 1024)
    try while (!def_.finished()) { val n = def_.deflate(buf); out.write(buf, 0, n) }
    finally def_.end()
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    writeLeU32(out, crc.getValue)
    writeLeU32(out, payload.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  private def writeLeU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
}
