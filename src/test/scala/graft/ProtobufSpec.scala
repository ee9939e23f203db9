package graft

import graft.operators.Protobuf
import graft.operators.Protobuf.PbField

/** [[Protobuf]] — wire-level vectors from the encoding spec, packed vs
  * expanded repeated parity, unknown-field skipping, last-one-wins,
  * NULL-for-absent, and loud wire-type contradictions.
  */
class ProtobufSpec extends SparkSpec {
  import spark.implicits._

  private val schema = Seq(
    PbField(1, "k", "int64"),
    PbField(2, "z", "sint64"),
    PbField(3, "s", "string"),
    PbField(4, "ok", "bool"),
    PbField(5, "d", "double"),
    PbField(6, "xs", "int64", repeated = true),
    PbField(7, "tags", "string", repeated = true))

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("hand vector from the encoding spec: field 1 varint 150 is 08 96 01") {
    val one = Seq(PbField(1, "k", "int64"))
    val msg = bytes(3, 0x08, 0x96, 0x01) // len-prefix 3, then the spec's example
    val rows = Protobuf.parseContainer(7L, msg, one)
    assert(rows.size == 1 && rows.head.getLong(0) == 150L)
    // and the encoder produces exactly those octets
    assert(Protobuf.writeStream(one, Seq(Map("k" -> 150L))).toSeq == msg.toSeq)
  }

  test("round-trip: all types, zigzag negatives, repeated packed + strings, absent → null") {
    val msgs = Seq(
      Map[String, Any]("k" -> 42L, "z" -> -3L, "s" -> "café", "ok" -> true,
        "d" -> 2.5, "xs" -> Seq(1L, -2L, 300L), "tags" -> Seq("a", "b")),
      Map[String, Any]("k" -> -1L, "xs" -> Seq.empty[Long], "tags" -> Seq.empty[Any]))
    val blob = Protobuf.writeStream(schema, msgs)
    val rows = Protobuf.parseContainer(7L, blob, schema)
    assert(rows.size == 2)
    val r0 = rows.head
    assert(r0.getLong(0) == 42L && r0.getLong(1) == -3L && r0.getString(2) == "café")
    assert(r0.getBoolean(3) && r0.getDouble(4) == 2.5)
    assert(r0.getSeq[Long](5) == Seq(1L, -2L, 300L))
    assert(r0.getSeq[String](6) == Seq("a", "b"))
    val r1 = rows(1)
    assert(r1.getLong(0) == -1L) // int64 -1 rides 10 varint octets
    assert(r1.isNullAt(1) && r1.isNullAt(2) && r1.isNullAt(3) && r1.isNullAt(4))
    assert(r1.getSeq[Long](5).isEmpty && r1.getSeq[String](6).isEmpty)
  }

  test("expanded (tag-per-element) repeated numerics equal the packed form") {
    val one = Seq(PbField(6, "xs", "int64", repeated = true))
    // expanded: (6<<3|0) v ... per element
    val expanded = bytes(7, 0x30, 5, 0x30, 0x96, 0x01, 0x30, 7)
    val got = Protobuf.parseContainer(7L, expanded, one).head.getSeq[Long](0)
    assert(got == Seq(5L, 150L, 7L))
  }

  test("unknown fields skip by wire type; duplicate scalars take the last value") {
    val one = Seq(PbField(1, "k", "int64"))
    // unknown field 9 as varint, unknown 10 len-delimited, unknown 11
    // fixed32, then k twice (last wins)
    val body = bytes(0x48, 0x7f) ++ // 9<<3|0
      bytes(0x52, 3, 'x', 'y', 'z') ++ // 10<<3|2
      bytes(0x5d, 1, 2, 3, 4) ++ // 11<<3|5
      bytes(0x08, 5) ++ bytes(0x08, 9)
    val blob = bytes(body.length) ++ body
    val rows = Protobuf.parseContainer(7L, blob, one)
    assert(rows.head.getLong(0) == 9L)
  }

  test("hostile shapes fail loudly: wire contradiction, truncation, packed overrun") {
    val one = Seq(PbField(1, "k", "int64"))
    def boom(bs: Array[Byte], what: String, sch: Seq[PbField] = one): Unit = {
      val e = intercept[IllegalArgumentException](Protobuf.parseContainer(7L, bs, sch))
      assert(e.getMessage.contains(what), s"wanted '$what' in: ${e.getMessage}")
    }
    // declared int64 arrives len-delimited (and not packable: not repeated)
    boom(bytes(3, 0x0a, 1, 'x'), "wire type 2")
    boom(bytes(2, 0x08, 0x96), "truncated varint")
    boom(bytes(9, 0x08, 1), "truncated")
    // packed run overruns the message
    val packed = Seq(PbField(6, "xs", "int64", repeated = true))
    boom(bytes(3, 0x32, 9, 1), "overruns the message", packed)
    // schema validation
    intercept[IllegalArgumentException](
      Protobuf.sparkSchema(Seq(PbField(1, "a", "int32"))))
    intercept[IllegalArgumentException](
      Protobuf.sparkSchema(Seq(PbField(1, "a", "int64"), PbField(1, "b", "int64"))))
  }

  test("records(): typed distributed read with arrays") {
    val blob1 = Protobuf.writeStream(schema, Seq(
      Map[String, Any]("k" -> 1L, "s" -> "one", "xs" -> Seq(10L, 20L))))
    val blob2 = Protobuf.writeStream(schema, Seq(
      Map[String, Any]("k" -> 2L, "tags" -> Seq("t"))))
    val df = Seq((1L, blob1), (2L, blob2)).toDF("file_id", "blob")
    val got = Protobuf.records(df, "file_id", "blob", schema)
      .orderBy("file_id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(got(0).getSeq[Long](6) == Seq(10L, 20L))
    assert(got(1).getSeq[String](7) == Seq("t"))
    assert(got(1).isNullAt(3)) // absent string is null
  }
}
