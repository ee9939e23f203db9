package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.OpcConfigParser

/** Grammar spec: /root/reference/OPC2MongoDB/Program.cs:1212-1296, plus a
  * golden parse of the reference's shipped config file (read-only).
  */
class ConfigParserSpec extends AnyFunSuite {

  test("grammar: comments, conn string, servers, tag defaults, invalid lines") {
    val r = OpcConfigParser.parse(
      """# comment line
        |mongodb://localhost:27017/db
        |mongodb://other:1/db
        |opc.tcp://h1:4840, 10, S1, cert.pfx, pw
        |pathA ,Double ,Y ,TagA
        |pathB ,Int32  ,N ,
        |opcda://h2/da, 20,
        |pathC ,VT_R4  ,Y ,TagC
        |not a server or tag
        |""".stripMargin)
    assert(r.config.mongoConnStr.contains("mongodb://localhost:27017/db"),
      "first mongodb:// line wins")
    val Seq(s1, s2) = r.config.servers
    assert(s1.serverName == "S1" && s1.isUa && s1.readPeriodSec == 10
      && s1.certificateFile == "cert.pfx" && s1.certificatePassword == "pw")
    assert(s1.entries.map(_.tag) == Seq("TagA", "pathB"), "blank tag defaults to path")
    assert(s1.entries.map(_.subscribe) == Seq(true, false))
    assert(s2.serverName == "opcda://h2/da", "blank server name defaults to url")
    assert(!s2.isUa && s2.entries.map(_.tag) == Seq("TagC"))
    assert(r.invalid.map(_.lineNo) == Seq(9))
  }

  test("tag entry before any server line is rejected, not crashed on") {
    val r = OpcConfigParser.parse("pathA ,Double ,Y ,TagA\n")
    assert(r.config.servers.isEmpty && r.invalid.length == 1)
  }

  test("golden: the reference's shipped opc2mongodb.conf parses to 5 servers / 38 tags / 4 subscribed") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/OPC2MongoDB/opc2mongodb.conf")))
    val r = OpcConfigParser.parse(text)
    val servers = r.config.servers
    assert(servers.length == 5)
    assert(servers.map(_.entries.length).sum == 38)
    assert(servers.flatMap(_.entries).count(_.subscribe) == 4)
    assert(servers.count(_.isUa) == 4)
    assert(servers.map(_.readPeriodSec) == Seq(10, 30, 15, 23, 20))
  }
}
