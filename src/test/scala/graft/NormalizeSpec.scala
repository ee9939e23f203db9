package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.functions.{GFormat, Normalize}
import graft.model.RawReading

/** The §1.3 coercion matrix (SURVEY.md), row by row — behavioral spec from
  * /root/reference/OPC2MongoDB/Program.cs:137-443 et al.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = ts("2024-06-01 00:00:00")

  private def normOne(dataType: String, raw: String): Row = {
    val df = Seq(RawReading("srv", "t1", "p", dataType, raw, t0, t0, 192)).toDF
    val out = Normalize.normalize(df)
      .select("doubleValue", "boolValue", "stringValue").collect()
    assert(out.length == 1, s"normalize dropped ($dataType, $raw)")
    out.head
  }

  private def check(dt: String, raw: String, d: Double, b: Boolean, s: String): Unit = {
    val r = normOne(dt, raw)
    assert(r.getDouble(0) == d, s"doubleValue for ($dt, $raw)")
    assert(r.getBoolean(1) == b, s"boolValue for ($dt, $raw)")
    assert(r.getString(2) == s, s"stringValue for ($dt, $raw)")
  }

  test("bool: 1.0/0.0, identity, lowercase string (Program.cs:146-150)") {
    check("Boolean", "true", 1.0, true, "true")
    check("Boolean", "false", 0.0, false, "false")
    check("bool", "True", 1.0, true, "true")
    check("VT_BOOL", "1", 1.0, true, "true")
  }

  test("float/single: widen, !=0, G format (Program.cs:172-173)") {
    check("Float", "-2.5", -2.5, true, "-2.5")
    check("single", "0", 0.0, false, "0")
    check("VT_R4", "1.5", 1.5, true, "1.5")
    // G format drops trailing zeros, uses no thousands separator
    check("Float", "1234.25", 1234.25, true, "1234.25")
  }

  test("double/decimal: identity, !=0, G format (Program.cs:183-223)") {
    check("Double", "3.14", 3.14, true, "3.14")
    check("double", "0.0", 0.0, false, "0")
    check("VT_R8", "-0.001", -0.001, true, "-0.001")
    check("Decimal", "2.75", 2.75, true, "2.75")
  }

  test("integers: widen (lossy >2^53 for 64-bit), !=0, decimal string (Program.cs:346-385)") {
    check("Int32", "42", 42.0, true, "42")
    check("byte", "0", 0.0, false, "0")
    check("Int16", "-7", -7.0, true, "-7")
    check("state", "3", 3.0, true, "3")
    check("statuscode", "2147483650", 2147483650.0, true, "2147483650")
    // 2^53+1 is not representable as a double — doubleValue rounds,
    // stringValue keeps every digit (the reference's lossy Convert.ToDouble)
    check("Int64", "9007199254740993", 9007199254740992.0, true, "9007199254740993")
    check("UInt64", "18446744073709551615", 1.8446744073709552e19, true,
      "18446744073709551615")
  }

  test("string-likes: parse-or-0.0, parsed!=0, identity (Program.cs:397-410)") {
    check("String", "hello", 0.0, false, "hello")
    check("String", "12.5", 12.5, true, "12.5")
    check("String", "0", 0.0, false, "0")
    check("Guid", "not-a-number", 0.0, false, "not-a-number")
    check("LocalizedText", "-3", -3.0, true, "-3")
  }

  test("datetime: .NET ticks as double, always false (Program.cs:431-432)") {
    // 2024-01-01 UTC = 638396640000000000 ticks
    val r = normOne("DateTime", "2024-01-01 00:00:00")
    assert(r.getDouble(0) == 6.3839664e17)
    assert(!r.getBoolean(1))
    assert(r.getString(2) == "2024-01-01 00:00:00")
  }

  test("unsupported types are dropped (Program.cs:718-720)") {
    val df = Seq(
      RawReading("srv", "t1", "p", "ByteString", "zz", t0, t0, 192),
      RawReading("srv", "t2", "p", "Int32", "1", t0, t0, 192)).toDF
    val out = Normalize.normalize(df).select("tag").as[String].collect()
    assert(out.toSeq == Seq("t2"))
  }

  test("property: integer strings of any magnitude normalize consistently") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // scalacheck-sampled inputs, verified in one batch pass
    val ns = (0 until 200).flatMap(i =>
      Gen.chooseNum(Long.MinValue, Long.MaxValue).apply(
        Gen.Parameters.default, Seed(i.toLong))) ++
      Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, (1L << 53) + 1)
    val df = ns.map(n => RawReading("srv", s"t$n", "p", "Int64", n.toString, t0, t0, 192)).toDF
    val rows = Normalize.normalize(df)
      .select("tag", "doubleValue", "boolValue", "stringValue")
      .as[(String, Double, Boolean, String)].collect()
    assert(rows.length == ns.length)
    rows.foreach { case (tag, d, b, s) =>
      val n = tag.drop(1).toLong
      // doubleValue is the (possibly lossy) widening; stringValue keeps
      // every digit; boolValue is !=0 on the parsed double
      assert(d == n.toDouble, s"double for $n")
      assert(s == n.toString, s"string for $n")
      assert(b == (n.toDouble != 0.0), s"bool for $n")
    }
  }

  test("property: doubles round-trip through the G-format string within 15 digits") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ds = (0 until 200).flatMap(i =>
      Gen.chooseNum(-1e12, 1e12).apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq(0.0, -0.0, 1e-6, -1e-7, 123456.789, 1e15, 1e16, -2.5e-9)
    ds.foreach { d =>
      val back = GFormat.gDouble(d).toDouble
      assert(d == 0.0 ||
        math.abs(back - d) / math.max(math.abs(d), 1e-300) < 1e-14,
        s"round-trip for $d -> ${GFormat.gDouble(d)} -> $back")
    }
  }

  test("G-format matches .NET en-US for representative doubles") {
    // GFormat is the engine's port of value.ToString("G", en-US)
    assert(GFormat.gDouble(1.0) == "1")
    assert(GFormat.gDouble(0.5) == "0.5")
    assert(GFormat.gDouble(-12345.678) == "-12345.678")
    assert(GFormat.gSingle(2.5f) == "2.5")
  }
}
