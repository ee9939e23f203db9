package graft

import java.sql.Timestamp

import graft.model.OpcValue
import graft.streaming.{DocumentSink, KeyValueSink, MongoKvStore, MongoReflectionSink}
import org.scalatest.funsuite.AnyFunSuite

/** The MongoDB sink binding skeleton: document shape, lifecycle and
  * resolution semantics — driven against a scripted [[DocumentSink]]
  * (the sandbox has no Mongo driver jars and no network, exactly the
  * regime the reflection binding is designed for).
  */
class MongoKvProviderSpec extends AnyFunSuite {

  private def value(tag: String, d: Double) = OpcValue(
    serverName = "srv1", tag = tag, dataType = "Double",
    doubleValue = d, boolValue = d != 0.0, stringValue = d.toString,
    sourceTimestamp = Timestamp.valueOf("2024-01-01 00:00:01"),
    serverTimestamp = Timestamp.valueOf("2024-01-01 00:00:02"),
    quality = 192)

  private class ScriptedSink extends DocumentSink {
    var connects = 0
    var closes = 0
    val calls = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, Seq[(String, Any)])]
    override def connect(): Unit = connects += 1
    override def replaceOne(collection: String, keyField: String, key: String,
        doc: Seq[(String, Any)]): Unit = {
      require(connects > 0, "replaceOne before connect")
      calls += ((collection, keyField, key, doc)); ()
    }
    override def close(): Unit = closes += 1
  }

  test("document shape mirrors the reference BSON (Program.cs:1162-1172)") {
    val sink = new ScriptedSink
    val store = new MongoKvStore(sink)
    store.connect()
    store.upsert("srv1", "tagA", value("tagA", 4.5))
    store.close()
    assert(sink.connects === 1 && sink.closes === 1)
    val (coll, keyField, key, doc) = sink.calls.head
    assert(coll === "srv1" && keyField === "tag" && key === "tagA")
    assert(doc.map(_._1) === Seq("tag", "dataType", "doubleValue", "boolValue",
      "stringValue", "sourceTimestamp", "serverTimestamp", "quality"),
      "field ORDER is part of the contract")
    val m = doc.toMap
    assert(m("tag") === "tagA" && m("dataType") === "Double")
    assert(m("doubleValue") === 4.5 && m("boolValue") === true)
    assert(m("quality") === 192)
    // timestamps travel as java.util.Date (BSON-codec native), exact ms
    assert(m("sourceTimestamp").asInstanceOf[java.util.Date].getTime
      === Timestamp.valueOf("2024-01-01 00:00:01").getTime)
  }

  test("replace semantics: re-upserting a key is a second replaceOne on the same key") {
    val sink = new ScriptedSink
    val store = new MongoKvStore(sink)
    store.connect()
    store.upsert("srv1", "t", value("t", 1.0))
    store.upsert("srv1", "t", value("t", 2.0))
    store.close()
    assert(sink.calls.map(_._3) === Seq("t", "t"),
      "last-write-wins rides the store's replace, not sink-side state")
    assert(sink.calls.last._4.toMap.apply("doubleValue") === 2.0)
  }

  test("provider resolves without Mongo jars; connect is the failure point") {
    // resolution (what kvUpsertSink does fail-fast at construction) must
    // succeed with zero driver jars...
    val provider = KeyValueSink.resolveProvider("graft.streaming.MongoKvProvider")
    provider.open() // instantiation demands nothing
    // ...and the missing artifact surfaces at connect(), by name. The
    // TEST classpath now carries real-FQN embedded fakes
    // (RealNameBindingSpec), so absence is simulated through the load
    // seam — the fail-point and message under test are unchanged
    val bare = new MongoKvStore(new MongoReflectionSink("mongodb://h:1", "db") {
      override protected def loadClass(name: String): Class[_] =
        throw new ClassNotFoundException(name)
    })
    val e = intercept[ClassNotFoundException](bare.connect())
    assert(e.getMessage.contains("mongodb-driver-sync"))
  }

  test("a scripted sink that fails connect does not leak a close-less store") {
    val sink = new ScriptedSink {
      override def connect(): Unit = throw new RuntimeException("unreachable")
    }
    val store = new MongoKvStore(sink)
    intercept[RuntimeException](store.connect())
    store.close() // idempotent close after failed connect must not throw
    assert(sink.closes === 1)
  }
}
