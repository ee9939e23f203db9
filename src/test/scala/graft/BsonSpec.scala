package graft

import graft.operators.Bson
import graft.operators.Bson.BsonField

/** BSON reader/writer against the published bsonspec.org grammar —
  * the pinned spec example byte-for-byte both directions, round trips
  * over every supported type, unknown-field skips (the forward-compat
  * contract), and the loud-failure arms for corrupt framing.
  */
class BsonSpec extends SparkSpec {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // -------------------------------------------------------- spec example
  // bsonspec.org's own worked example: {"hello": "world"} =
  // \x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00
  private val helloWorld = b(0x16, 0, 0, 0, 0x02) ++
    "hello".getBytes ++ b(0) ++ b(0x06, 0, 0, 0) ++
    "world".getBytes ++ b(0) ++ b(0)

  test("pinned spec example decodes") {
    val rows = Bson.parseStream(1L, helloWorld, Seq(BsonField("hello", "string")))
    assert(rows.map(_.toSeq) == Seq(Seq("world")))
  }

  test("pinned spec example encodes byte-for-byte") {
    val enc = Bson.writeStream(Seq(BsonField("hello", "string")),
      Seq(Map("hello" -> "world")))
    assert(enc.toSeq == helloWorld.toSeq)
  }

  // ---------------------------------------------------------- round trip
  private val allFields = Seq(
    BsonField("d", "double"), BsonField("s", "string"),
    BsonField("bl", "bool"), BsonField("ts", "datetime"),
    BsonField("i", "int32"), BsonField("l", "int64"),
    BsonField("bin", "binary"), BsonField("arr", "array", "int64"),
    BsonField("sarr", "array", "string"))

  test("round trip over every supported type") {
    val doc = Map[String, Any](
      "d" -> 2.5, "s" -> "héllo ☃", "bl" -> true,
      "ts" -> 123456789L, "i" -> -42, "l" -> (Long.MinValue + 1),
      "bin" -> Array[Byte](1, 2, 0, -1), "arr" -> Seq(1L, -2L, 3L),
      "sarr" -> Seq("a", "", "c"))
    val enc = Bson.writeStream(allFields, Seq(doc))
    val Seq(row) = Bson.parseStream(9L, enc, allFields)
    assert(row.getDouble(0) == 2.5)
    assert(row.getString(1) == "héllo ☃")
    assert(row.getBoolean(2))
    assert(row.getAs[java.sql.Timestamp](3).getTime == 123456789L)
    assert(row.getInt(4) == -42)
    assert(row.getLong(5) == Long.MinValue + 1)
    assert(row.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 0, -1))
    assert(row.getAs[Seq[Long]](7) == Seq(1L, -2L, 3L))
    assert(row.getAs[Seq[String]](8) == Seq("a", "", "c"))
  }

  test("explicit null and absent name both decode to SQL NULL; empty array stays empty") {
    val fields = Seq(BsonField("a", "string"), BsonField("bb", "int64"),
      BsonField("arr", "array", "int64"))
    // a explicitly null; bb absent; arr present but empty
    val enc = Bson.writeStream(fields,
      Seq(Map("a" -> null, "arr" -> Seq.empty[Long])))
    val Seq(row) = Bson.parseStream(2L, enc, fields)
    assert(row.isNullAt(0) && row.isNullAt(1))
    assert(row.getAs[Seq[Long]](2).isEmpty)
  }

  test("duplicate names are last-one-wins") {
    val f = Seq(BsonField("x", "int32"))
    // hand-build: two int32 'x' elements in one document
    val body = b(0x10) ++ "x".getBytes ++ b(0) ++ b(7, 0, 0, 0) ++
      b(0x10) ++ "x".getBytes ++ b(0) ++ b(9, 0, 0, 0)
    val doc = b(body.length + 5, 0, 0, 0) ++ body ++ b(0)
    assert(Bson.parseStream(3L, doc, f).head.getInt(0) == 9)
  }

  // ------------------------------------------------- unknown-field skips
  test("undeclared names of every skippable type are skipped") {
    // writer declares a superset; reader declares only `keep`
    val writer = Seq(BsonField("junk_d", "double"), BsonField("junk_s", "string"),
      BsonField("junk_arr", "array", "double"), BsonField("junk_bin", "binary"),
      BsonField("junk_b", "bool"), BsonField("junk_ts", "datetime"),
      BsonField("junk_i", "int32"), BsonField("junk_l", "int64"),
      BsonField("keep", "int64"))
    val enc = Bson.writeStream(writer, Seq(Map(
      "junk_d" -> 1.5, "junk_s" -> "zzz", "junk_arr" -> Seq(1.0, 2.0),
      "junk_bin" -> Array[Byte](9, 9), "junk_b" -> false, "junk_ts" -> 5L,
      "junk_i" -> 3, "junk_l" -> 4L, "keep" -> 77L)))
    val rows = Bson.parseStream(4L, enc, Seq(BsonField("keep", "int64")))
    assert(rows.map(_.toSeq) == Seq(Seq(77L)))
  }

  test("ObjectId, decimal128, regex, nested doc, DBPointer, symbol, code-with-scope and explicit null all skip") {
    def el(t: Int, name: String, payload: Array[Byte]) =
      b(t) ++ name.getBytes ++ b(0) ++ payload
    val nested = { // {"k": int32 1}
      val nb = el(0x10, "k", b(1, 0, 0, 0))
      b(nb.length + 5, 0, 0, 0) ++ nb ++ b(0)
    }
    // code-with-scope: total-length int32 + string + scope doc
    val cws = {
      val codeStr = b(3, 0, 0, 0) ++ "fn".getBytes ++ b(0)
      val scope = b(5, 0, 0, 0, 0) // empty doc
      val total = 4 + codeStr.length + scope.length
      b(total, 0, 0, 0) ++ codeStr ++ scope
    }
    val body =
      el(0x07, "oid", Array.fill[Byte](12)(7)) ++
        el(0x13, "dec", Array.fill[Byte](16)(1)) ++
        el(0x0B, "re", "pat".getBytes ++ b(0) ++ "i".getBytes ++ b(0)) ++
        el(0x03, "sub", nested) ++
        el(0x0C, "dbp", b(2, 0, 0, 0) ++ "c".getBytes ++ b(0) ++
          Array.fill[Byte](12)(3)) ++
        el(0x0E, "sym", b(2, 0, 0, 0) ++ "s".getBytes ++ b(0)) ++
        el(0x0F, "cws", cws) ++
        el(0x0A, "nul", Array.emptyByteArray) ++
        el(0x12, "keep", b(5, 0, 0, 0, 0, 0, 0, 0))
    val doc = b(body.length + 5, 0, 0, 0) ++ body ++ b(0)
    val rows = Bson.parseStream(5L, doc, Seq(BsonField("keep", "int64")))
    assert(rows.map(_.toSeq) == Seq(Seq(5L)))
  }

  // ------------------------------------------------------- loud failures
  private def boom(bytes: Array[Byte], fields: Seq[BsonField] = Seq(BsonField("x", "int32"))) =
    intercept[IllegalArgumentException](Bson.parseStream(8L, bytes, fields))

  test("corrupt framing fails loudly, never silently") {
    // truncated document body
    assert(boom(b(0x10, 0, 0, 0, 0x10) ++ "x".getBytes ++ b(0))
      .getMessage.contains("truncated"))
    // declared length disagrees with the terminator position
    val body = b(0x10) ++ "x".getBytes ++ b(0) ++ b(1, 0, 0, 0)
    assert(boom(b(body.length + 9, 0, 0, 0) ++ body ++ b(0, 0, 0, 0, 0))
      .getMessage.contains("terminator"))
    // declared type mismatch: int32 declared, string arrives
    val sBody = b(0x02) ++ "x".getBytes ++ b(0) ++ b(2, 0, 0, 0) ++ "a".getBytes ++ b(0)
    assert(boom(b(sBody.length + 5, 0, 0, 0) ++ sBody ++ b(0))
      .getMessage.contains("arrived as"))
    // genuinely unknown type byte (0x20 — no BSON assignment)
    val uBody = b(0x20) ++ "z".getBytes ++ b(0) ++ b(1, 2, 3)
    assert(boom(b(uBody.length + 5, 0, 0, 0) ++ uBody ++ b(0))
      .getMessage.contains("unknown element type"))
    // string payload missing its NUL
    val nBody = b(0x02) ++ "x".getBytes ++ b(0) ++ b(1, 0, 0, 0) ++ "a".getBytes
    assert(boom(b(nBody.length + 5, 0, 0, 0) ++ nBody ++ b(0),
      Seq(BsonField("x", "string"))).getMessage.contains("NUL"))
  }

  test("array with non-consecutive keys fails loudly") {
    val inner = b(0x12) ++ "1".getBytes ++ b(0) ++ b(5, 0, 0, 0, 0, 0, 0, 0)
    val arrDoc = b(inner.length + 5, 0, 0, 0) ++ inner ++ b(0)
    val body = b(0x04) ++ "a".getBytes ++ b(0) ++ arrDoc
    val doc = b(body.length + 5, 0, 0, 0) ++ body ++ b(0)
    val e = intercept[IllegalArgumentException](
      Bson.parseStream(6L, doc, Seq(BsonField("a", "array", "int64"))))
    assert(e.getMessage.contains("consecutive"))
  }

  // ------------------------------------------------------- records() API
  test("records explodes containers into typed rows") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val fields = Seq(BsonField("k", "int64"), BsonField("v", "string"))
    val blob1 = Bson.writeStream(fields,
      Seq(Map("k" -> 1L, "v" -> "a"), Map("k" -> 2L, "v" -> null)))
    val blob2 = Bson.writeStream(fields, Seq(Map("k" -> 3L)))
    val df = Seq((10L, blob1), (20L, blob2)).toDF("fid", "blob")
    val out = Bson.records(df, "fid", "blob", fields)
      .orderBy("k").collect().map(_.toSeq)
    assert(out.toSeq == Seq(Seq(10L, 1L, "a"), Seq(10L, 2L, null), Seq(20L, 3L, null)))
    assert(Bson.records(df, "fid", "blob", fields).schema.fieldNames.toSeq ==
      Seq("file_id", "k", "v"))
  }
}
