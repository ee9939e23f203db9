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
  * file. Per-record gzip members (`.warc.gz`) are the documented
  * external-codec seam, as with inter-frame video.
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
}
