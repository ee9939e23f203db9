package graft.config

import graft.model.{OpcConfig, OpcEntry, OpcServer}

/** Parser for the reference's line-oriented config grammar.
  *
  * Grammar (behavioral spec: /root/reference/OPC2MongoDB/Program.cs:1212-1296):
  *   - lines are split on `,`; blank lines skipped; a line whose first field
  *     starts with `#` is a comment (Program.cs:1222-1228);
  *   - a single-field line containing `mongodb://` sets the sink connection
  *     string, first one wins (Program.cs:1230-1233);
  *   - a line containing `opc.tcp://` with >= 3 fields opens a new OPC UA
  *     server: url, readPeriodSec, serverName [, certFile [, certPassword]];
  *     blank serverName defaults to the url (Program.cs:1235-1255);
  *   - a line containing `opcda://` with >= 3 fields opens a new OPC DA
  *     server: url, readPeriodSec, serverName (Program.cs:1257-1272);
  *   - any other line with >= 4 fields is a tag entry under the most recent
  *     server: opcPath, dataType, subscribe ("Y"), mongoTag; blank mongoTag
  *     defaults to opcPath (Program.cs:1274-1287);
  *   - anything else is invalid and skipped with a diagnostic
  *     (Program.cs:1289-1291). A tag entry before any server line is invalid
  *     here (the reference would crash on it; we reject it instead —
  *     documented deviation).
  *
  * This is driver-side config parsing — pure Scala, no Spark. The parsed
  * topology is tiny (a few KB) and is later broadcast as a tag catalog for
  * enrichment joins.
  */
object OpcConfigParser {

  final case class Invalid(lineNo: Int, line: String)

  final case class Result(config: OpcConfig, invalid: Seq[Invalid])

  def parse(text: String): Result = {
    var connStr: Option[String] = None
    val servers = scala.collection.mutable.ArrayBuffer.empty[ServerBuilder]
    val invalid = scala.collection.mutable.ArrayBuffer.empty[Invalid]

    for (((raw, idx)) <- text.linesIterator.zipWithIndex) {
      val lineNo = idx + 1
      if (raw.trim.nonEmpty) {
        val fields = raw.split(",", -1)
        val head = fields(0)
        if (head.nonEmpty && head.trim.headOption.contains('#')) {
          // comment
        } else if (head.toLowerCase.contains("mongodb://") && fields.length == 1) {
          if (connStr.isEmpty) connStr = Some(head.trim)
        } else if (head.toLowerCase.contains("opc.tcp://") && fields.length >= 3) {
          servers += newServer(fields, isUa = true)
        } else if (head.toLowerCase.contains("opcda://") && fields.length >= 3) {
          servers += newServer(fields, isUa = false)
        } else if (fields.length >= 4) {
          if (servers.isEmpty) invalid += Invalid(lineNo, raw)
          else {
            val path = fields(0).trim
            val tag = fields(3).trim
            servers.last.entries += OpcEntry(
              opcPath = path,
              dataType = fields(1).trim,
              subscribe = fields(2).trim == "Y",
              tag = if (tag.isEmpty) path else tag)
          }
        } else {
          invalid += Invalid(lineNo, raw)
        }
      }
    }

    Result(OpcConfig(connStr, servers.map(_.build).toSeq), invalid.toSeq)
  }

  private final class ServerBuilder(
      val url: String,
      val name: String,
      val periodSec: Int,
      val isUa: Boolean,
      val certFile: String,
      val certPassword: String) {
    val entries = scala.collection.mutable.ArrayBuffer.empty[OpcEntry]
    def build: OpcServer =
      OpcServer(name, url, periodSec, isUa, certFile, certPassword, entries.toSeq)
  }

  private def newServer(fields: Array[String], isUa: Boolean): ServerBuilder = {
    val url = fields(0).trim
    val name = fields(2).trim
    new ServerBuilder(
      url = url,
      name = if (name.isEmpty) url else name,
      periodSec = fields(1).trim.toInt,
      isUa = isUa,
      certFile = if (isUa && fields.length >= 4) fields(3).trim else "",
      certPassword = if (isUa && fields.length >= 5) fields(4).trim else "")
  }
}
