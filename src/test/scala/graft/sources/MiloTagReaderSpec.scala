package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.model.OpcEntry

/** The real-client OPC UA binding skeleton (VERDICT r10 carried #8):
  * full [[MiloTagReader]] lifecycle against a scripted [[UaSession]]
  * (no network, no Milo jars), provider fail-fast semantics, and the
  * UA-status→DA-quality mapping.
  */
class MiloTagReaderSpec extends AnyFunSuite {

  private val session = TagSession(
    serverName = "S1", opcUrl = "opc.tcp://host:4840", isUa = true,
    readPeriodSec = 5, baseEpochMs = 0L, certFile = None, certPassword = None)

  private def entry(path: String, sub: Boolean) =
    OpcEntry(path, "Double", sub, path.split(';').last)

  test("lifecycle: connect, subscribe-flagged registration, read mapping, close") {
    val log = ArrayBuffer.empty[String]
    val mock = new UaSession {
      override def connect(url: String, cf: Option[String], cp: Option[String]): Unit =
        log += s"connect:$url"
      override def subscribe(nodeIds: Seq[String], samplingMs: Double): Unit =
        log += s"subscribe:${nodeIds.mkString("+")}@$samplingMs"
      override def readValue(nodeId: String): UaValue = {
        log += s"read:$nodeId"
        UaValue("42.5", 0L, 1700000000000000L, 1700000000001000L)
      }
      override def close(): Unit = log += "close"
    }
    val r = new MiloTagReader(session, mock)
    r.connect()
    r.subscribe(Seq(entry("ns=1;s=A", sub = true), entry("ns=1;s=B", sub = false)))
    val tr = r.read(entry("ns=1;s=A", sub = true), tagIdx = 0, cycle = 7L)
    assert(tr.rawValue === "42.5")
    assert(tr.quality === 192, "UA Good severity maps to DA quality 192")
    assert(tr.sourceTsMicros === 1700000000000000L)
    assert(tr.serverTsMicros === 1700000000001000L)
    r.close()
    assert(log.head === "connect:opc.tcp://host:4840")
    // only the subscribe-flagged entry registers, at the poll period
    assert(log.contains("subscribe:ns=1;s=A@5000.0"), log.mkString(", "))
    assert(log.contains("read:ns=1;s=A"))
    assert(log.last === "close")
  }

  test("UA severity bits map to the reference's quality domain") {
    assert(MiloTagReader.qualityOf(0x00000000L) === 192) // Good
    assert(MiloTagReader.qualityOf(0x0000ABCDL) === 192) // Good w/ info bits
    assert(MiloTagReader.qualityOf(0x40000000L) === 64)  // Uncertain
    assert(MiloTagReader.qualityOf(0x80000000L) === 0)   // Bad
    assert(MiloTagReader.qualityOf(0xC0000000L) === 0)   // Bad (severity 11)
  }

  test("provider resolves without Milo jars; connect is the failure point") {
    // provider construction + reader open must succeed with no Milo on
    // the classpath — query-start fail-fast resolution stays green
    val r = new MiloTagReaderProvider().open(session)
    // close before connect is safe (idempotent contract)
    r.close()
    // the TEST classpath now carries real-FQN embedded fakes
    // (RealNameBindingSpec), so "Milo absent" is simulated through the
    // load seam — the assertion under test is unchanged: connect() is
    // where the missing artifact surfaces, naming it
    val bare = new MiloTagReader(session, new MiloReflectionSession {
      override protected def loadClass(name: String): Class[_] =
        throw new ClassNotFoundException(name)
    })
    val e = intercept[ClassNotFoundException](bare.connect())
    assert(e.getMessage.contains("Milo"), e.getMessage)
  }

  test("cert-configured session refuses an insecure connect explicitly") {
    val certSession = session.copy(
      certFile = Some("/secrets/client.pfx"), certPassword = Some("pw"))
    val r = new MiloTagReaderProvider().open(certSession)
    val e = intercept[IllegalArgumentException](r.connect())
    assert(e.getMessage.contains("SecurityPolicy"), e.getMessage)
  }
}
