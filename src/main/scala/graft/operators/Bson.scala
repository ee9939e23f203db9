package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** BSON reader (the published bsonspec.org grammar) — the fifth
  * interchange format beside WARC(.gz), Avro, protobuf and the stock
  * CSV/JSON. The reference's entire egress is BSON documents upserted
  * into MongoDB (/root/reference/OPC2MongoDB/Program.cs:1146-1198), so
  * a mongodump-style `.bson` stream — concatenated documents, no outer
  * framing — is the natural at-rest twin of that sink; this operator
  * decodes such streams against a DECLARED flat schema, like
  * [[Protobuf.records]].
  *
  * Subset (spec-pinned in BsonSpec, loud beyond it): element types
  * `double` (0x01, LE IEEE754), `string` (0x02, int32 length INCLUDING
  * the trailing NUL), `bool` (0x08), `datetime` (0x09, int64 epoch
  * millis → TimestampType), explicit `null` (0x0A), `int32` (0x10),
  * `int64` (0x12), `binary` (0x05 — payload returned raw, subtype
  * preserved-but-unexposed), and homogeneous `array`s of the numeric /
  * string scalars (0x04 — a nested document whose keys MUST be the
  * consecutive decimal strings "0","1",…, as the spec requires).
  * Undeclared names are SKIPPED by their type-determined length
  * (including ObjectId, decimal128, regex, nested documents and the
  * deprecated DBPointer/symbol/code-with-scope — every assigned type
  * byte IS length-determinable, so forward compatibility is total;
  * only an unassigned type byte refuses); a declared name arriving with a different
  * type byte fails loudly; both an explicitly-null element and an
  * absent name surface as SQL NULL; duplicate names are last-one-wins
  * (MongoDB's own read behavior). Every document's int32 length
  * prefix and 0x00 terminator are verified exactly — a document that
  * decodes past (or short of) its declared length is corrupt, not
  * "close enough".
  *
  * Spark shape: [[Warc]]/[[Avro]]/[[Protobuf]]'s — one sequential pass
  * per container blob via `mapPartitions`, typed DataFrame out. The
  * writer twin ([[writeStream]]) exists so fixtures can assemble real
  * byte streams whose decoded values have CLOSED FORMS the oracle
  * predicts without ever parsing (the q219/q239/q244 recipe).
  */
object Bson {

  /** One declared field. `typ` ∈ double string bool datetime int32
    * int64 binary array; for `array`, `elem` ∈ double string int32
    * int64.
    */
  final case class BsonField(name: String, typ: String, elem: String = "")

  private val TypeByte = Map(
    "double" -> 0x01, "string" -> 0x02, "binary" -> 0x05, "bool" -> 0x08,
    "datetime" -> 0x09, "int32" -> 0x10, "int64" -> 0x12, "array" -> 0x04)

  private val ArrayElems = Set("double", "string", "int32", "int64")

  private def scalarType(typ: String): DataType = typ match {
    case "double" => DoubleType
    case "string" => StringType
    case "bool" => BooleanType
    case "datetime" => TimestampType
    case "int32" => IntegerType
    case "int64" => LongType
    case "binary" => BinaryType
  }

  def sparkSchema(fields: Seq[BsonField]): StructType = {
    require(fields.nonEmpty, "empty schema")
    require(fields.map(_.name).distinct.size == fields.size, "duplicate field names")
    fields.foreach { f =>
      require(TypeByte.contains(f.typ), s"unsupported type '${f.typ}' (${f.name})")
      if (f.typ == "array")
        require(ArrayElems.contains(f.elem),
          s"unsupported array element '${f.elem}' (${f.name})")
      else require(f.elem.isEmpty, s"elem set on non-array field ${f.name}")
    }
    StructType(fields.map { f =>
      if (f.typ == "array")
        StructField(f.name, ArrayType(scalarType(f.elem), containsNull = false))
      else StructField(f.name, scalarType(f.typ))
    })
  }

  private final class Reader(val bytes: Array[Byte], val id: Long) {
    var pos = 0
    def err(what: String): Nothing = throw new IllegalArgumentException(
      s"malformed BSON container $id at byte $pos: $what")
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length) err(s"truncated: need $n octets")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; out
    }
    def int32(): Int =
      ByteBuffer.wrap(take(4)).order(ByteOrder.LITTLE_ENDIAN).getInt
    def int64(): Long =
      ByteBuffer.wrap(take(8)).order(ByteOrder.LITTLE_ENDIAN).getLong
    def byte(): Int = { if (pos >= bytes.length) err("truncated"); val b = bytes(pos) & 0xff; pos += 1; b }
    def cstring(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != 0) pos += 1
      if (pos >= bytes.length) err("unterminated cstring")
      val s = new String(bytes, start, pos - start, StandardCharsets.UTF_8)
      pos += 1 // the NUL
      s
    }
    /** 0x02 string payload: int32 length INCLUDES the trailing NUL. */
    def bsonString(): String = {
      val n = int32()
      if (n < 1) err(s"string length $n < 1")
      val b = take(n)
      if (b(n - 1) != 0) err("string payload not NUL-terminated")
      new String(b, 0, n - 1, StandardCharsets.UTF_8)
    }
  }

  /** Skip one element VALUE of the given type byte (name already
    * consumed). Only length-determinable types are skippable; anything
    * else is a loud refusal, because BSON has no wire-level escape
    * hatch for unknown lengths.
    */
  private def skipValue(r: Reader, t: Int): Unit = t match {
    case 0x01 | 0x09 | 0x11 | 0x12 => r.take(8) // double, datetime, ts, int64
    case 0x02 | 0x0D | 0x0E => // string, js code, symbol (deprecated)
      val n = r.int32(); r.take(n)
    case 0x03 | 0x04 => // embedded document / array: length includes itself
      val n = r.int32(); if (n < 5) r.err(s"embedded doc length $n < 5"); r.take(n - 4)
    case 0x05 => val n = r.int32(); r.byte(); r.take(n) // binary
    case 0x07 => r.take(12) // ObjectId
    case 0x08 => r.byte() // bool
    case 0x0A | 0x06 | 0xFF | 0x7F => () // null, undefined, minkey, maxkey
    case 0x0B => r.cstring(); r.cstring(); () // regex: pattern + options
    case 0x0C => val n = r.int32(); r.take(n); r.take(12) // DBPointer (deprecated)
    case 0x0F => // code-with-scope: leading int32 is the TOTAL length
      val n = r.int32(); if (n < 4) r.err(s"code-with-scope length $n < 4"); r.take(n - 4)
    case 0x10 => r.take(4) // int32
    case 0x13 => r.take(16) // decimal128
    case other => r.err(f"cannot skip unknown element type 0x$other%02x")
  }

  private def readScalar(r: Reader, typ: String, t: Int, name: String): Any = {
    val expect = TypeByte(typ)
    if (t != expect)
      r.err(f"field '$name' declared $typ (0x$expect%02x) arrived as 0x$t%02x")
    typ match {
      case "double" => java.lang.Double.longBitsToDouble(r.int64())
      case "string" => r.bsonString()
      case "bool" => r.byte() match {
        case 0 => false
        case 1 => true
        case b => r.err(s"bool byte $b")
      }
      case "datetime" =>
        val ms = r.int64()
        // TimestampType carries micros; ms → µs is exact. Timestamp.from
        // (not the ms constructor) so the instant survives verbatim.
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))
      case "int32" => r.int32()
      case "int64" => r.int64()
      case "binary" =>
        val n = r.int32(); r.byte(); r.take(n)
    }
  }

  /** Decode one array element (a nested document with consecutive
    * decimal-string keys, per the spec).
    */
  private def readArray(r: Reader, elem: String, name: String): Seq[Any] = {
    val len = r.int32()
    if (len < 5) r.err(s"array '$name' length $len < 5")
    val end = r.pos + len - 4
    val out = Seq.newBuilder[Any]
    var idx = 0
    var t = r.byte()
    while (t != 0) {
      val key = r.cstring()
      if (key != idx.toString)
        r.err(s"array '$name' key '$key' at position $idx (spec: consecutive decimal strings)")
      out += readScalar(r, elem, t, s"$name[$idx]")
      idx += 1
      t = r.byte()
    }
    if (r.pos != end) r.err(s"array '$name' decoded past its declared length")
    out.result()
  }

  /** Parse one container (a concatenated-documents stream) into rows.
    * Package-visible for the spec.
    */
  private[graft] def parseStream(id: Long, bytes: Array[Byte],
      fields: Seq[BsonField]): Seq[Row] = {
    sparkSchema(fields) // validates
    val byName = fields.map(f => f.name -> f).toMap
    val r = new Reader(bytes, id)
    val out = Seq.newBuilder[Row]
    while (r.pos < bytes.length) {
      val start = r.pos
      val len = r.int32()
      if (len < 5) r.err(s"document length $len < 5")
      val end = start + len
      if (end > bytes.length) r.err(s"document body truncated: need ${len} octets")
      val vals = scala.collection.mutable.Map.empty[String, Any]
      var t = r.byte()
      while (t != 0) {
        val name = r.cstring()
        byName.get(name) match {
          case None => skipValue(r, t)
          case Some(f) =>
            if (t == 0x0A) vals(name) = null // explicit null, any declared type
            else if (f.typ == "array") {
              if (t != 0x04)
                r.err(f"field '$name' declared array (0x04) arrived as 0x$t%02x")
              vals(name) = readArray(r, f.elem, name)
            } else vals(name) = readScalar(r, f.typ, t, name)
        }
        if (r.pos >= end) r.err("document ran past its declared length")
        t = r.byte()
      }
      if (r.pos != end) r.err(
        s"document declared $len octets but terminator landed at ${r.pos - start}")
      out += Row(fields.map(f => vals.get(f.name).orNull): _*)
    }
    out.result()
  }

  /** Explode `(idCol: long, blobCol: binary)` containers of concatenated
    * BSON documents into typed rows under the declared schema.
    */
  def records(containers: DataFrame, idCol: String, blobCol: String,
      fields: Seq[BsonField]): DataFrame = {
    val idIdx = containers.schema.fieldIndex(idCol)
    val blobIdx = containers.schema.fieldIndex(blobCol)
    val outSchema = StructType(
      StructField("file_id", LongType, nullable = false) +: sparkSchema(fields).fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    containers.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(idIdx)
        parseStream(id, row.getAs[Array[Byte]](blobIdx), fields)
          .map(r => Row.fromSeq(id +: r.toSeq))
      }
    }(enc)
  }

  // ------------------------------------------------------------ encode

  /** Fixture-encoder twin: one BSON document per value map, concatenated
    * (the mongodump stream shape). A name present with value `null`
    * writes an explicit 0x0A element; an absent name writes nothing —
    * both decode to SQL NULL, and fixtures exercise both arrival
    * shapes. `fields` here is the WRITER's inventory and may be a
    * superset of what a reader later declares (that is how fixtures
    * plant unknown-field skips).
    */
  def writeStream(fields: Seq[BsonField], docs: Seq[Map[String, Any]]): Array[Byte] = {
    sparkSchema(fields)
    val out = new java.io.ByteArrayOutputStream()
    docs.foreach { m =>
      val body = new java.io.ByteArrayOutputStream()
      fields.foreach { f =>
        m.get(f.name).foreach {
          case null => writeHeader(body, 0x0A, f.name)
          case v if f.typ == "array" =>
            writeHeader(body, 0x04, f.name)
            val xs = v.asInstanceOf[Seq[Any]]
            val inner = new java.io.ByteArrayOutputStream()
            xs.zipWithIndex.foreach { case (x, i) =>
              writeHeader(inner, TypeByte(f.elem), i.toString)
              writeScalarPayload(inner, f.elem, x)
            }
            writeDoc(body, inner)
          case v =>
            writeHeader(body, TypeByte(f.typ), f.name)
            writeScalarPayload(body, f.typ, v)
        }
      }
      writeDoc(out, body)
    }
    out.toByteArray
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream, t: Int, name: String): Unit = {
    out.write(t)
    val b = name.getBytes(StandardCharsets.UTF_8)
    require(!b.contains(0.toByte), s"element name '$name' contains NUL")
    out.write(b); out.write(0)
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream,
      body: java.io.ByteArrayOutputStream): Unit = {
    writeInt32(out, body.size + 5) // int32 + body + terminator
    body.writeTo(out)
    out.write(0)
  }

  private def writeScalarPayload(out: java.io.ByteArrayOutputStream, typ: String, v: Any): Unit =
    typ match {
      case "double" => writeInt64(out,
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue()))
      case "string" =>
        val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
        writeInt32(out, b.length + 1); out.write(b); out.write(0)
      case "bool" => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case "datetime" => writeInt64(out, v match {
        case i: java.time.Instant => i.toEpochMilli
        case t: java.sql.Timestamp => t.getTime
        case n: Number => n.longValue()
      })
      case "int32" => writeInt32(out, v.asInstanceOf[Number].intValue())
      case "int64" => writeInt64(out, v.asInstanceOf[Number].longValue())
      case "binary" =>
        val b = v.asInstanceOf[Array[Byte]]
        writeInt32(out, b.length); out.write(0 /* generic subtype */); out.write(b)
    }

  private def writeInt32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def writeInt64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt32(out, v.toInt); writeInt32(out, (v >>> 32).toInt)
  }
}
