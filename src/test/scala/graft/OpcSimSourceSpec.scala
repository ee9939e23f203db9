package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.sources.OpcSimSource
import graft.streaming.StreamingPipeline

/** End-to-end slice of SURVEY.md §7: config text → custom DSv2 micro-batch
  * source (simulated OPC poll) → normalization → last-value current table.
  */
class OpcSimSourceSpec extends SparkSpec {
  import spark.implicits._

  private val conf =
    """mongodb://localhost:27017/graft
      |opc.tcp://host1:4840, 10, Server1
      |ns=1;s=Plant.Temp   ,Double  ,Y ,Temp
      |ns=1;s=Plant.Count  ,Int32   ,N ,Count
      |ns=1;s=Plant.Alive  ,Boolean ,N ,Alive
      |ns=1;s=Plant.Label  ,String  ,N ,Label
      |""".stripMargin

  test("sessionAuth: option overrides config, missing cert fails at query start") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val certPath = Files.createTempFile("graft-cert", ".pfx")
    val confWithCert =
      s"""opc.tcp://host1:4840, 10, Server1, $certPath, hunter2
         |ns=1;s=Plant.Temp,Double,Y,Temp
         |""".stripMargin
    val server = OpcSimSource.selectServer(confWithCert, "Server1")
    assert(server.certificateFile == certPath.toString && server.certificatePassword == "hunter2")

    // config-provided material resolves
    val noOpts = new CaseInsensitiveStringMap(java.util.Map.of[String, String]())
    val a1 = OpcSimSource.sessionAuth(server, noOpts)
    assert(a1 == OpcSimSource.SessionAuth(Some(certPath.toString), Some("hunter2")))

    // source options override the config line
    val cert2 = Files.createTempFile("graft-cert2", ".pfx")
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("certFile", cert2.toString, "certPassword", "override"))
    assert(OpcSimSource.sessionAuth(server, opts) ==
      OpcSimSource.SessionAuth(Some(cert2.toString), Some("override")))

    // a configured-but-absent cert file fails the STREAM START, not a
    // later micro-batch: the stream init resolves sessionAuth eagerly
    val badConf =
      """opc.tcp://host1:4840, 10, Server1, /nonexistent/cert.pfx, pw
        |ns=1;s=Plant.Temp,Double,Y,Temp
        |""".stripMargin
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("opcsim")
        .option("config", badConf).option("server", "Server1")
        .option("cyclesPerTrigger", 1).option("maxCycles", 1)
        .load()
        .writeStream.format("memory").queryName("opcsim_badcert")
        .option("checkpointLocation", Files.createTempDirectory("sim-ckpt-bad").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("does not exist") ||
      Option(ex.getCause).exists(_.getMessage.contains("does not exist")))
  }

  test("source emits every tag per cycle with deterministic values and timestamps") {
    val stream = spark.readStream.format("opcsim")
      .option("config", conf).option("server", "Server1")
      .option("cyclesPerTrigger", 3).option("maxCycles", 3)
      .load()
    val q = stream.writeStream
      .format("memory").queryName("opcsim_raw")
      .option("checkpointLocation", Files.createTempDirectory("sim-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.sql("SELECT * FROM opcsim_raw")
    assert(rows.count() == 12) // 3 cycles × 4 tags (poll reads ALL tags)
    val temps = rows.filter($"tag" === "Temp")
      .select("rawValue", "dataType").as[(String, String)].collect()
    assert(temps.length == 3 && temps.forall(_._2 == "Double"))
    // cycle timestamps stride by read_period (10 s)
    val tsSeq = rows.filter($"tag" === "Temp")
      .select("sourceTimestamp").as[java.sql.Timestamp].collect()
      .map(_.getTime).sorted
    assert(tsSeq.zip(tsSeq.tail).forall { case (a, b) => b - a == 10000L })
  }

  test("e2e: source → normalize → last-value current table") {
    val stream = spark.readStream.format("opcsim")
      .option("config", conf).option("server", "Server1")
      .option("cyclesPerTrigger", 2).option("maxCycles", 4)
      .load()
    val table = Files.createTempDirectory("sim-cur").toString + "/current"
    val q = StreamingPipeline.currentValueSink(
      StreamingPipeline.normalizeStream(stream),
      table, Files.createTempDirectory("sim-ckpt2").toString,
      Trigger.AvailableNow()).start()
    q.awaitTermination()

    val cur = spark.read.parquet(table)
    assert(cur.count() == 4, "exactly one current row per tag")
    val byTag = cur.select("tag", "doubleValue", "stringValue")
      .as[(String, Double, String)].collect().map(r => r._1 -> r).toMap
    // cycle 4 values (latest): deterministic from OpcSimSource.rawValue
    assert(byTag("Temp")._2 ==
      OpcSimSource.rawValue("Double", 0, 4).toDouble)
    assert(byTag("Count")._3 == OpcSimSource.rawValue("Int32", 1, 4))
    assert(byTag("Alive")._3 == "true") // (4 + 2) % 2 == 0
    // every tag's current row is from the last cycle
    val tsAll = cur.select("sourceTimestamp").as[java.sql.Timestamp].collect()
    assert(tsAll.map(_.getTime).distinct.toSeq == Seq(1704067200000L + 4 * 10000L))
  }

  test("history table appends every reading, partitioned by server") {
    val stream = spark.readStream.format("opcsim")
      .option("config", conf).option("server", "Server1")
      .option("cyclesPerTrigger", 1).option("maxCycles", 3)
      .load()
    val base = Files.createTempDirectory("sim-hist").toString
    val q = StreamingPipeline.currentValueSink(
      StreamingPipeline.normalizeStream(stream),
      s"$base/current", Files.createTempDirectory("sim-ckpt4").toString,
      Trigger.AvailableNow(), historyPath = Some(s"$base/history")).start()
    q.awaitTermination()

    assert(spark.read.parquet(s"$base/current").count() == 4)
    val hist = spark.read.parquet(s"$base/history")
    assert(hist.count() == 12) // 3 cycles × 4 tags, all retained
    assert(new java.io.File(s"$base/history/serverName=Server1").isDirectory,
      "history is partitioned by serverName")
  }

  test("restart replays deterministically (exactly-once current table)") {
    def run(ckpt: String, table: String, max: Int): Unit = {
      val stream = spark.readStream.format("opcsim")
        .option("config", conf).option("server", "Server1")
        .option("cyclesPerTrigger", 1).option("maxCycles", max)
        .load()
      val q = StreamingPipeline.currentValueSink(
        StreamingPipeline.normalizeStream(stream), table, ckpt,
        Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val ckpt = Files.createTempDirectory("sim-ckpt3").toString
    val table = Files.createTempDirectory("sim-cur3").toString + "/current"
    run(ckpt, table, 2)
    val after2 = spark.read.parquet(table)
      .select("tag", "stringValue").as[(String, String)].collect().toMap
    run(ckpt, table, 5) // resume from checkpoint, cycles 3..5
    val after5 = spark.read.parquet(table)
      .select("tag", "stringValue").as[(String, String)].collect().toMap
    assert(after2("Count") == OpcSimSource.rawValue("Int32", 1, 2))
    assert(after5("Count") == OpcSimSource.rawValue("Int32", 1, 5))
  }
}
