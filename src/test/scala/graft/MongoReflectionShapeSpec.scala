package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MongoReflectionSink

/** The REFLECTION layer of the MongoDB sink binding, driven against
  * scripted fakes of 2 driver API shapes (VERDICT r12 item 6):
  * [[MongoKvProviderSpec]] mocks the [[graft.streaming.DocumentSink]]
  * seam, which proves the document algebra but exercises zero
  * reflective lookups — this matrix runs the real
  * [[MongoReflectionSink]] against (A) the 4.x-style layout with
  * public interfaces over PACKAGE-PRIVATE impls (interface-class method
  * lookup is load-bearing: getClass-based lookup throws
  * IllegalAccessException on the real driver), fluent ReplaceOptions
  * and an UpdateResult-like return, and (B) a variant with
  * void-returning replaceOne, void upsert and NO client close().
  */
class MongoReflectionShapeSpec extends AnyFunSuite {

  private def sinkFor(pkg: String) =
    new MongoReflectionSink("mongodb://h:27017", "opc_values") {
      override protected def loadClass(name: String): Class[_] = {
        val mapped = name match {
          case "com.mongodb.client.MongoClients" => s"graft.fakes.$pkg.MongoClients"
          case "com.mongodb.client.MongoClient" => s"graft.fakes.$pkg.MongoClient"
          case "com.mongodb.client.MongoDatabase" => s"graft.fakes.$pkg.MongoDatabase"
          case "com.mongodb.client.MongoCollection" => s"graft.fakes.$pkg.MongoCollection"
          case "org.bson.Document" => s"graft.fakes.$pkg.Document"
          case "org.bson.conversions.Bson" => s"graft.fakes.$pkg.Bson"
          case "com.mongodb.client.model.Filters" => s"graft.fakes.$pkg.Filters"
          case "com.mongodb.client.model.ReplaceOptions" => s"graft.fakes.$pkg.ReplaceOptions"
          case n => n
        }
        Class.forName(mapped)
      }
    }

  test("shape A (4.x-style): interface lookup over package-private impls, fluent upsert") {
    import graft.fakes.mongoa.Recorder
    Recorder.reset()
    val sink = sinkFor("mongoa")
    sink.connect()
    sink.replaceOne("srv1", "tag", "T1",
      Seq("tag" -> "T1", "doubleValue" -> 4.5, "quality" -> 192))
    sink.close()
    assert(Recorder.calls.asScala.toSeq === Seq(
      "create:mongodb://h:27017", "getDatabase:opc_values",
      "getCollection:srv1", "replaceOne", "close"))
    assert(Recorder.lastFilter.field === "tag" && Recorder.lastFilter.value === "T1")
    assert(Recorder.lastOpts.upserted, "replace must be an UPSERT")
    // emission order is part of the document contract
    assert(Recorder.lastDoc.fields.keySet.asScala.toSeq ===
      Seq("tag", "doubleValue", "quality"))
    assert(Recorder.lastDoc.fields.get("doubleValue") === 4.5)
  }

  test("shape B (variant): void replaceOne, void upsert, absent close() tolerated") {
    import graft.fakes.mongob.Recorder
    Recorder.reset()
    val sink = sinkFor("mongob")
    sink.connect()
    sink.replaceOne("srv2", "tag", "T2", Seq("tag" -> "T2"))
    sink.close() // no close() on the client interface: tolerated no-op
    assert(Recorder.calls.asScala.toSeq === Seq(
      "create:mongodb://h:27017", "getDatabase:opc_values",
      "getCollection:srv2", "replaceOne"))
    assert(Recorder.lastFilter.field === "tag" && Recorder.lastFilter.value === "T2")
    assert(Recorder.lastOpts.upserted, "void upsert(boolean) still records the flag")
  }

  test("replaceOne before connect() is refused") {
    val e = intercept[IllegalArgumentException](
      sinkFor("mongoa").replaceOne("c", "tag", "k", Seq("tag" -> "k")))
    assert(e.getMessage.contains("replaceOne before connect"), e.getMessage)
  }
}
