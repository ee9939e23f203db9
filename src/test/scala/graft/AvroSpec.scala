package graft

import java.nio.charset.StandardCharsets

import graft.operators.Avro

/** [[Avro]] — round-trips over the full supported type subset under
  * both codecs, wire-level zigzag pinning, and loud rejection of every
  * malformed-framing / out-of-subset shape.
  */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    """{"type":"record","name":"r","fields":[
      |{"name":"k","type":"long"},
      |{"name":"n","type":"int"},
      |{"name":"d","type":"double"},
      |{"name":"f","type":"float"},
      |{"name":"s","type":"string"},
      |{"name":"b","type":"boolean"},
      |{"name":"raw","type":"bytes"},
      |{"name":"opt","type":["null","string"]}]}""".stripMargin.replace("\n", "")

  private val sync = (0 until 16).map(_.toByte).toArray

  private val rows: Seq[Seq[Any]] = Seq(
    Seq(1L, 42, 3.25, 1.5f, "hello", true, Array[Byte](1, 2, 3), "here"),
    Seq(-9007199254740993L, -7, -0.0, Float.MinPositiveValue, "café — résumé",
      false, Array.emptyByteArray, null),
    Seq(0L, Int.MaxValue, Double.MaxValue, -2f, "", true, Array[Byte](-1), "x"))

  test("round-trip: all subset types, all three codecs, multiple blocks") {
    for (codec <- Seq("null", "deflate", "snappy")) {
      val blob = Avro.writeContainer(schema, rows, sync, codec, recordsPerBlock = 2)
      val (gotSchema, gotRows) = Avro.parseContainer(7L, blob)
      assert(Avro.parseSchema(gotSchema) == Avro.parseSchema(schema))
      assert(gotRows.size == 3, codec)
      for ((want, got) <- rows.zip(gotRows); i <- want.indices) {
        (want(i), got.get(i)) match {
          case (w: Array[Byte], g: Array[Byte]) => assert(w.toSeq == g.toSeq)
          case (w, g) => assert(w == g, s"codec=$codec field $i")
        }
      }
    }
  }

  test("zigzag wire form matches the avro spec examples") {
    // spec: 0→00, -1→01, 1→02, -2→03, 2→04
    def enc(v: Long): Seq[Int] = {
      val blob = Avro.writeContainer(
        """{"type":"record","name":"x","fields":[{"name":"v","type":"long"}]}""",
        Seq(Seq(v)), sync)
      // one small-valued record = the single payload octet just before
      // the trailing sync marker
      blob.slice(blob.length - 16 - 1, blob.length - 16).map(_ & 0xff).toSeq
    }
    assert(enc(0L) == Seq(0x00))
    assert(enc(-1L) == Seq(0x01))
    assert(enc(1L) == Seq(0x02))
    assert(enc(-2L) == Seq(0x03))
    assert(enc(2L) == Seq(0x04))
  }

  test("hostile shapes fail loudly: magic, sync drift, truncation, codec, schema subset") {
    val good = Avro.writeContainer(schema, rows, sync, "null")
    def boom(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](Avro.parseContainer(7L, bytes))
      assert(e.getMessage.contains(what), s"wanted '$what' in: ${e.getMessage}")
    }
    boom("Not avro".getBytes(StandardCharsets.US_ASCII), "bad avro magic")
    boom(good.take(good.length - 4), "truncated")
    // flip one octet of the trailing sync marker
    val badSync = good.clone()
    badSync(badSync.length - 1) = (badSync(badSync.length - 1) ^ 0x7f).toByte
    boom(badSync, "sync marker differs")
    // unsupported codec is refused by the ENCODER too
    val e1 = intercept[IllegalArgumentException](
      Avro.writeContainer(schema, rows, sync, "zstandard"))
    assert(e1.getMessage.contains("unsupported codec"))
    // snappy codec: round-trips, and its per-block CRC32 catches damage
    val sn = Avro.writeContainer(schema, rows, sync, "snappy")
    assert(Avro.parseContainer(7L, sn)._2.size == rows.size)
    val badCrc = sn.clone()
    badCrc(badCrc.length - 17) = (badCrc(badCrc.length - 17) ^ 0x5a).toByte
    val e2 = intercept[IllegalArgumentException](Avro.parseContainer(7L, badCrc))
    assert(e2.getMessage.contains("CRC32 mismatch") ||
      e2.getMessage.contains("malformed"), e2.getMessage)
    // out-of-subset schemas are refused at parse time
    intercept[IllegalArgumentException](Avro.parseSchema(
      """{"type":"record","name":"r","fields":[{"name":"a","type":{"type":"array","items":"long"}}]}"""))
    intercept[IllegalArgumentException](Avro.parseSchema("""{"type":"enum","name":"e"}"""))
  }

  test("records(): typed distributed read; schema drift across containers is refused") {
    val blob1 = Avro.writeContainer(schema, rows.take(2), sync)
    val blob2 = Avro.writeContainer(schema, rows.drop(2), sync, "deflate")
    val df = Seq((1L, blob1), (2L, blob2)).toDF("file_id", "blob")
    val got = Avro.records(df, "file_id", "blob", schema)
    assert(got.schema.fieldNames.toSeq ==
      Seq("file_id", "k", "n", "d", "f", "s", "b", "raw", "opt"))
    val collected = got.orderBy("file_id", "k").collect()
    assert(collected.length == 3)
    assert(collected.map(_.getAs[Any]("opt")).toSeq == Seq(null, "here", "x"))
    // drifted producer: same arity, different field type
    val otherSchema = schema.replace("\"type\":\"long\"", "\"type\":\"int\"")
    val bad = Seq((3L, Avro.writeContainer(otherSchema,
      Seq(Seq(5, 1, 1.0, 1f, "a", true, Array[Byte](0), null)), sync)))
      .toDF("file_id", "blob")
    val e = intercept[org.apache.spark.SparkException](
      Avro.records(bad, "file_id", "blob", schema).collect())
    assert(e.getCause.getMessage.contains("reader expects"), e.getCause.getMessage)
  }
}
