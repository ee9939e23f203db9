package graft.sources

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The REFLECTION layer of the Milo binding, driven against scripted
  * fakes of ≥2 client API shapes (VERDICT r12 item 6): the existing
  * [[MiloTagReaderSpec]] mocks the [[UaSession]] seam, which proves the
  * reader but exercises zero reflective method lookups — this matrix
  * pins every shape [[MiloReflectionSession]] claims to tolerate
  * (future-returning vs sync `connect()`, absent `disconnect()`, null
  * timestamps/values, Bad severity) and the loud failure for the shape
  * it cannot (void-like `connect()`).
  */
class MiloReflectionShapeSpec extends AnyFunSuite {

  /** A session whose class resolution maps Milo names into the given
    * fake package — the ONLY override; every reflective lookup after
    * that runs the production code path.
    */
  private def sessionFor(pkg: String) = new MiloReflectionSession {
    override protected def loadClass(name: String): Class[_] = {
      val mapped = name match {
        case "org.eclipse.milo.opcua.sdk.client.OpcUaClient" =>
          s"graft.fakes.$pkg.OpcUaClient"
        case n if n.endsWith(".NodeId") => s"graft.fakes.$pkg.NodeId"
        case n if n.endsWith(".TimestampsToReturn") =>
          s"graft.fakes.$pkg.TimestampsToReturn"
        case n => n
      }
      Class.forName(mapped)
    }
  }

  test("shape A (0.6-style): future-returning connect, async read, disconnect") {
    graft.fakes.miloa.OpcUaClient.calls.clear()
    val s = sessionFor("miloa")
    s.connect("opc.tcp://h:4840", None, None)
    val v = s.readValue("ns=1;s=T0")
    assert(v.text === "42.5")
    assert(v.statusCode === 0L)
    // 100 ns UA ticks since 1601 → µs since Unix epoch
    assert(v.sourceTsMicros === 1000000L)
    assert(v.serverTsMicros === 2000000L)
    s.close()
    assert(graft.fakes.miloa.OpcUaClient.calls.asScala.toSeq === Seq(
      "create:opc.tcp://h:4840", "connect", "read:ns=1;s=T0:Both:0.0",
      "disconnect"))
    // the maxAge=0.0 + Both read shape is part of the wire contract —
    // asserted via the recorded call string above
  }

  test("shape B (sync 1.x-style): direct connect return, null source time, no disconnect") {
    graft.fakes.milob.OpcUaClient.calls.clear()
    val s = sessionFor("milob")
    s.connect("opc.tcp://h2:4840", None, None)
    val v = s.readValue("ns=2;s=T9")
    assert(v.text === "", "null Variant value must read as empty text, not NPE")
    assert(v.statusCode === 0x80000000L)
    assert(MiloTagReader.qualityOf(v.statusCode) === 0, "Bad severity → DA 0")
    assert(v.sourceTsMicros === 0L, "absent source DateTime must map to 0")
    assert(v.serverTsMicros === 3000000L)
    s.close() // absent disconnect(): close must be a tolerated no-op
    assert(graft.fakes.milob.OpcUaClient.calls.asScala.toSeq === Seq(
      "create:opc.tcp://h2:4840", "connect", "read:ns=2;s=T9"))
  }

  test("shape C (void-like connect) fails loudly at the version mismatch") {
    val s = sessionFor("miloc")
    val e = intercept[IllegalArgumentException](
      s.connect("opc.tcp://h3:4840", None, None))
    assert(e.getMessage.contains("unexpected connect() return shape"),
      e.getMessage)
  }

  test("readValue before connect() is refused on every shape") {
    val e = intercept[IllegalArgumentException](
      sessionFor("miloa").readValue("ns=1;s=T0"))
    assert(e.getMessage.contains("readValue before connect"), e.getMessage)
  }
}
