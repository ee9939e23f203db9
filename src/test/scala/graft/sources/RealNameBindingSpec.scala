package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import com.mongodb.client.EmbeddedMongo
import org.eclipse.milo.opcua.sdk.client.OpcUaClient

import graft.SparkSpec
import graft.streaming.{KeyValueSink, MongoKvProvider, StreamingPipeline}

/** REAL-NAME integration arms for the two reflection bindings (VERDICT
  * r16 task #5). The prescribed form — an opt-in `it:test` config
  * pulling `milo-sdk-client` and `mongodb-driver-sync` — is INFEASIBLE
  * in this environment: zero egress, COURSIER_MODE=offline, and neither
  * artifact exists in any local cache (verified r17). This is the
  * closest offline analogue, and it closes the gap the shape matrices
  * leave: those override `loadClass` to map names into `graft.fakes.*`,
  * so the PRODUCTION resolution path — `Class.forName` against the
  * vendor FQNs, static-method lookup, interface-over-package-private
  * dispatch, future unwrapping — never runs. Here embedded fakes carry
  * the REAL public FQNs on the test classpath (`org.eclipse.milo…`,
  * `com.mongodb.client…`, `org.bson…`), and both bindings run
  * END-TO-END through their unmodified production code: a streaming
  * query reads tags through `MiloTagReaderProvider` named in the
  * source's `tagReader` option, and `kvUpsertSink` writes through
  * `MongoKvProvider` into the embedded document store. What this still
  * cannot prove: vendor BYTECODE behavior (session handshakes, codec
  * edge cases) — that residue genuinely requires the jars and a server.
  */
class RealNameBindingSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("Milo binding end-to-end: opcsim stream reads through the real-FQN client via production Class.forName") {
    OpcUaClient.reset()
    // Good (severity 00), Good, Uncertain (severity 01) — the embedded
    // server answers exactly what the binding asks for per node id
    OpcUaClient.serve("ns=1;s=P.Temp", "42.5", 0L, 1000000L, 2000000L)
    OpcUaClient.serve("ns=1;s=P.Count", "7", 0L, 1000000L, 2000000L)
    OpcUaClient.serve("ns=1;s=P.Flag", "true", 0x40000000L, 1000000L, 2000000L)
    val conf =
      """opc.tcp://embedded:4840, 10, Server1
        |ns=1;s=P.Temp ,Double ,N ,Temp
        |ns=1;s=P.Count,Int32  ,N ,Count
        |ns=1;s=P.Flag ,Boolean,S ,Flag
        |""".stripMargin
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val q = StreamingPipeline.normalizeStream(
        spark.readStream.format("opcsim")
          .option("config", conf).option("server", "Server1")
          .option("tagReader", classOf[MiloTagReaderProvider].getName)
          .option("cyclesPerTrigger", 1).option("maxCycles", 2)
          .option("numPartitions", 2).load())
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val collected = b.collect()
        rows.synchronized { rows ++= collected }; ()
      }
      .option("checkpointLocation", tmp("graft-milo-it"))
      .start()
    q.awaitTermination()
    assert(rows.size == 6, s"3 tags x 2 cycles, got ${rows.size}") // 3 tags × 2 cycles
    val byTag = rows.groupBy(_.getAs[String]("tag"))
    assert(byTag.keySet == Set("Temp", "Count", "Flag"))
    byTag("Temp").foreach { r =>
      assert(r.getAs[Double]("doubleValue") == 42.5)
      assert(r.getAs[Int]("quality") == 192) // Good severity -> DA 192
      // UA 1601-tick DateTimes round-tripped to ms-precision timestamps
      assert(r.getAs[java.sql.Timestamp]("sourceTimestamp").getTime == 1000L)
      assert(r.getAs[java.sql.Timestamp]("serverTimestamp").getTime == 2000L)
    }
    byTag("Count").foreach(r => assert(r.getAs[Double]("doubleValue") == 7.0))
    byTag("Flag").foreach { r =>
      assert(r.getAs[Boolean]("boolValue"))
      assert(r.getAs[Int]("quality") == 64) // Uncertain severity -> DA 64
    }
    // the embedded server really served this query: sessions were created
    // against the configured endpoint, read per (tag, cycle), disconnected
    val calls = OpcUaClient.CALLS.asScala.toSeq
    assert(calls.exists(_ == "create:opc.tcp://embedded:4840"), calls.take(10))
    assert(calls.count(_ == "read:ns=1;s=P.Temp") == 2)
    assert(calls.exists(_.startsWith("disconnect:")), "sessions must close")
  }

  test("Milo binding: unknown node answers Bad with null payload; severity maps to DA quality 0") {
    OpcUaClient.reset()
    val s = new MiloReflectionSession
    s.connect("opc.tcp://embedded:4840", None, None)
    val v = s.readValue("ns=1;s=Missing")
    assert(v.statusCode == OpcUaClient.BAD_NODE_ID_UNKNOWN)
    assert(MiloTagReader.qualityOf(v.statusCode) == 0)
    // null DateTime / null Variant from the server: text empty, ts 0 —
    // never an NPE inside the reflective unwrap
    assert(v.text == "" && v.sourceTsMicros == 0L && v.serverTsMicros == 0L)
    s.close()
    s.close() // idempotent
  }

  test("Mongo binding end-to-end: kvUpsertSink writes through the real-FQN driver into the embedded store") {
    EmbeddedMongo.reset()
    System.setProperty("graft.mongo.uri", "mongodb://embedded:27017")
    System.setProperty("graft.mongo.database", "graft_it")
    try {
      val conf =
        """opc.tcp://host1:4840, 10, Server1
          |ns=1;s=P.Temp ,Double ,N ,Temp
          |ns=1;s=P.Count,Int32  ,N ,Count
          |""".stripMargin
      val q = KeyValueSink.kvUpsertSink(
        StreamingPipeline.normalizeStream(
          spark.readStream.format("opcsim")
            .option("config", conf).option("server", "Server1")
            .option("cyclesPerTrigger", 1).option("maxCycles", 3)
            .option("numPartitions", 2).load()),
        classOf[MongoKvProvider].getName, tmp("graft-mongo-it"),
        Trigger.AvailableNow()).start()
      q.awaitTermination()
      // collection-per-server, one document per tag, FINAL cycle's value
      val coll = EmbeddedMongo.collection("graft_it", "Server1")
      assert(coll.keySet.asScala == Set[Object]("Temp", "Count"))
      val count = coll.get("Count")
      assert(count.get("doubleValue") ==
        OpcSimSource.rawValue("Int32", 1, 3).toDouble)
      // the reference BSON field ORDER (Program.cs:1162-1172)
      assert(count.fields.keySet.asScala.toSeq == Seq("tag", "dataType",
        "doubleValue", "boolValue", "stringValue", "sourceTimestamp",
        "serverTimestamp", "quality"))
      assert(count.get("quality") == 192)
      assert(count.get("serverTimestamp").isInstanceOf[java.util.Date])
      // every write was an UPSERT-flagged replaceOne, per-batch REDUCED:
      // 3 micro-batches × 2 tags, never per input row
      assert(EmbeddedMongo.nonUpsertCalls.get() == 0)
      assert(EmbeddedMongo.replaceCalls.get() == 6)
    } finally {
      System.clearProperty("graft.mongo.uri")
      System.clearProperty("graft.mongo.database")
    }
  }

  // ---- negative arms (VERDICT r17 task #8): the fakes must FALSIFY ----
  // Each binding is resolved against a DRIFTED fake whose static factory
  // was renamed (create -> newClient) — the smallest realistic vendor
  // signature change. The production reflective lookup must fail loudly
  // at exactly that method; if these arms ever stop throwing, the
  // real-FQN fakes have stopped pinning the vendor contract and the
  // positive arms above prove nothing.

  test("Milo binding negative arm: a renamed create(String) fails the production lookup loudly") {
    val s = new MiloReflectionSession {
      override protected def loadClass(name: String): Class[_] =
        Class.forName(name match {
          case "org.eclipse.milo.opcua.sdk.client.OpcUaClient" =>
            "graft.fakes.milodrift.OpcUaClient"
          case n => n
        })
    }
    val e = intercept[NoSuchMethodException] {
      s.connect("opc.tcp://drifted:4840", None, None)
    }
    assert(e.getMessage.contains("create"),
      s"the failure must name the drifted method: ${e.getMessage}")
  }

  test("Mongo binding negative arm: a renamed create(String) fails the production lookup loudly") {
    val sink = new graft.streaming.MongoReflectionSink(
        "mongodb://drifted:27017", "graft_it") {
      override protected def loadClass(name: String): Class[_] =
        Class.forName(name match {
          case "com.mongodb.client.MongoClients" =>
            "graft.fakes.mongodrift.MongoClients"
          case n => n
        })
    }
    val e = intercept[NoSuchMethodException] { sink.connect() }
    assert(e.getMessage.contains("create"),
      s"the failure must name the drifted method: ${e.getMessage}")
  }
}
