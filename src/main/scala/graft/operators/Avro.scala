package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Avro object-container reader (the Apache Avro 1.x spec, implemented
  * from the published format like the repo's other codecs — ITU T.81
  * JPEG, GIF89a, RFC 1952) — the third row-major interchange format
  * beside CSV/JSON lines and the binary containers (WARC): header
  * magic `Obj\x01`, a metadata map carrying `avro.schema` (JSON) and
  * `avro.codec`, a 16-octet sync marker, then blocks of
  * `(count, byteLen, payload)` each closed by the SAME sync marker —
  * verified per block; a mismatch means lost framing and fails loudly
  * rather than misattributing every later record.
  *
  * Schema subset (spec-pinned, refused loudly beyond it): one top-level
  * `record` whose fields are primitives — `long`/`int` (zigzag varint),
  * `double`/`float` (little-endian IEEE), `string`/`bytes`
  * (length-prefixed), `boolean`, `null` — or the nullable union
  * `["null", <prim>]` (branch index picks). Codecs: `null` and
  * `deflate` (raw RFC 1951 via the JDK codec, as PNG/WARC-gz).
  * Nested records/arrays/maps/enums are out of the subset.
  *
  * Spark shape: like [[Warc]] — one sequential pass per container on
  * the executor holding it (`mapPartitions`), schema resolved ONCE on
  * the driver from the first container's header (all containers of one
  * read must agree — verified per container, loud on drift), downstream
  * is ordinary typed DataFrame land.
  */
object Avro {

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  // ------------------------------------------------------------ schema

  /** One supported field: name + avro primitive + nullability. */
  final case class AvroField(name: String, typ: String, nullable: Boolean)

  private val SparkTypes: Map[String, DataType] = Map(
    "long" -> LongType, "int" -> IntegerType, "double" -> DoubleType,
    "float" -> FloatType, "string" -> StringType, "boolean" -> BooleanType,
    "bytes" -> BinaryType)

  /** Parse the subset schema out of the header's `avro.schema` JSON. */
  private[graft] def parseSchema(json: String): Seq[AvroField] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    require(root.path("type").asText() == "record",
      s"unsupported top-level avro type '${root.path("type").asText()}' (subset: record)")
    val fields = root.path("fields")
    require(fields.isArray && fields.size() > 0, "record without fields")
    (0 until fields.size()).map { i =>
      val f = fields.get(i)
      val name = f.path("name").asText()
      require(name.nonEmpty, s"field $i without a name")
      val t = f.path("type")
      if (t.isTextual) {
        val typ = t.asText()
        require(SparkTypes.contains(typ),
          s"field '$name': unsupported avro type '$typ'")
        AvroField(name, typ, nullable = false)
      } else if (t.isArray && t.size() == 2 && t.get(0).asText() == "null" &&
          t.get(1).isTextual && SparkTypes.contains(t.get(1).asText())) {
        AvroField(name, t.get(1).asText(), nullable = true)
      } else throw new IllegalArgumentException(
        s"field '$name': unsupported avro type ${t.toString} " +
          "(subset: primitive or [\"null\", primitive])")
    }
  }

  def sparkSchema(fields: Seq[AvroField]): StructType =
    StructType(fields.map(f => StructField(f.name, SparkTypes(f.typ), f.nullable)))

  // ------------------------------------------------------------ decode

  private final class Reader(val bytes: Array[Byte], val id: Long) {
    var pos = 0
    def err(what: String): Nothing = throw new IllegalArgumentException(
      s"malformed avro container $id at byte $pos: $what")
    def u8(): Int = {
      if (pos >= bytes.length) err("truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length) err(s"truncated: need $n octets")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; out
    }
    /** zigzag varint long (the avro int/long wire form). */
    def zlong(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        val b = u8()
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return (acc >>> 1) ^ -(acc & 1)
        shift += 7
        if (shift > 63) err("varint overruns 64 bits")
      }
      0L // unreachable
    }
  }

  private def decodeValue(r: Reader, typ: String): Any = typ match {
    case "long" => r.zlong()
    case "int" =>
      val v = r.zlong()
      if (v < Int.MinValue || v > Int.MaxValue) r.err(s"int field holds $v")
      v.toInt
    case "boolean" => r.u8() match {
      case 0 => false
      case 1 => true
      case b => r.err(s"boolean octet $b")
    }
    case "double" =>
      java.lang.Double.longBitsToDouble(
        java.nio.ByteBuffer.wrap(r.take(8))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
    case "float" =>
      java.lang.Float.intBitsToFloat(
        java.nio.ByteBuffer.wrap(r.take(4))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
    case "string" =>
      val n = r.zlong()
      if (n < 0 || n > Int.MaxValue) r.err(s"string length $n")
      new String(r.take(n.toInt), StandardCharsets.UTF_8)
    case "bytes" =>
      val n = r.zlong()
      if (n < 0 || n > Int.MaxValue) r.err(s"bytes length $n")
      r.take(n.toInt)
  }

  private def decodeField(r: Reader, f: AvroField): Any =
    if (!f.nullable) decodeValue(r, f.typ)
    else r.zlong() match {
      case 0 => null // union branch 0 = "null"
      case 1 => decodeValue(r, f.typ)
      case b => r.err(s"union branch $b for nullable '${f.name}'")
    }

  /** Parse one container: returns (schemaJson, rows). Package-visible
    * for the spec.
    */
  private[graft] def parseContainer(id: Long, bytes: Array[Byte]): (String, Seq[Row]) = {
    val r = new Reader(bytes, id)
    if (!java.util.Arrays.equals(r.take(4), Magic)) r.err("bad avro magic")
    // metadata map: series of (count, k/v pairs) blocks, 0-terminated;
    // a NEGATIVE count carries a byte size after it (spec's array form)
    val meta = scala.collection.mutable.Map.empty[String, Array[Byte]]
    var n = r.zlong()
    while (n != 0) {
      val pairs = if (n < 0) { r.zlong(); -n } else n
      (1L to pairs).foreach { _ =>
        val k = decodeValue(r, "string").asInstanceOf[String]
        val v = decodeValue(r, "bytes").asInstanceOf[Array[Byte]]
        meta(k) = v
      }
      n = r.zlong()
    }
    val schemaJson = new String(
      meta.getOrElse("avro.schema", r.err("header without avro.schema")),
      StandardCharsets.UTF_8)
    val codec = new String(meta.getOrElse("avro.codec", "null".getBytes),
      StandardCharsets.UTF_8)
    require(codec == "null" || codec == "deflate" || codec == "snappy",
      s"avro container $id: unsupported codec '$codec' (subset: null, deflate, snappy)")
    val fields = parseSchema(schemaJson)
    val sync = r.take(16)
    val out = Seq.newBuilder[Row]
    while (r.pos < bytes.length) {
      val count = r.zlong()
      val byteLen = r.zlong()
      if (count < 0 || byteLen < 0) r.err(s"negative block framing ($count, $byteLen)")
      val payload0 = r.take(byteLen.toInt)
      val payload = codec match {
        case "null" => payload0
        case "deflate" => inflateRaw(r, payload0)
        case "snappy" =>
          // avro's snappy codec: block + 4-octet BIG-endian CRC32 of
          // the UNCOMPRESSED data
          if (payload0.length < 4) r.err("snappy block shorter than its checksum")
          val body = try Snappy.decompress(payload0.dropRight(4))
            catch { case e: IllegalArgumentException => r.err(e.getMessage) }
          val crc = new java.util.zip.CRC32
          crc.update(body)
          val want = java.nio.ByteBuffer.wrap(payload0.takeRight(4)).getInt & 0xffffffffL
          if (want != crc.getValue)
            r.err(f"snappy CRC32 mismatch: computed 0x${crc.getValue}%08x, stored 0x$want%08x")
          body
      }
      val br = new Reader(payload, id)
      (1L to count).foreach { _ =>
        out += Row(fields.map(f => decodeField(br, f)): _*)
      }
      if (br.pos != payload.length)
        r.err(s"block decoded ${br.pos} of ${payload.length} payload octets")
      if (!java.util.Arrays.equals(r.take(16), sync))
        r.err("block sync marker differs from header sync")
    }
    (schemaJson, out.result())
  }

  private def inflateRaw(r: Reader, payload: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(payload)
    val out = new java.io.ByteArrayOutputStream(payload.length * 2 + 64)
    val buf = new Array[Byte](64 * 1024)
    try {
      while (!inf.finished()) {
        val k =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            r.err(s"corrupt deflate block: ${e.getMessage}") }
        if (k == 0 && !inf.finished()) r.err("truncated deflate block")
        out.write(buf, 0, k)
        if (out.size > (1 << 28)) r.err("block inflates past 256 MiB — refusing (bomb guard)")
      }
    } finally inf.end()
    out.toByteArray
  }

  /** Explode `(idCol: long, blobCol: binary)` avro containers into typed
    * rows. The schema comes from `schemaJson` (declare what you expect —
    * the reader VERIFIES every container's header matches it, so a
    * drifted producer fails loudly instead of mis-typing columns).
    */
  def records(containers: DataFrame, idCol: String, blobCol: String,
      schemaJson: String): DataFrame = {
    val fields = parseSchema(schemaJson)
    val idIdx = containers.schema.fieldIndex(idCol)
    val blobIdx = containers.schema.fieldIndex(blobCol)
    val outSchema = StructType(
      StructField("file_id", LongType, nullable = false) +:
        sparkSchema(fields).fields.toSeq)
    val canonical = canonicalSchema(schemaJson)
    val enc = RowEncoder.encoderFor(outSchema)
    containers.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(idIdx)
        val (got, rows) = parseContainer(id, row.getAs[Array[Byte]](blobIdx))
        if (canonicalSchema(got) != canonical)
          throw new IllegalArgumentException(
            s"avro container $id declares schema $got, reader expects $schemaJson")
        rows.map(r => Row.fromSeq(id +: r.toSeq))
      }
    }(enc)
  }

  /** Field-structural schema identity (name/type/nullability), so
    * formatting or doc attributes never fail the cross-check.
    */
  private def canonicalSchema(json: String): Seq[AvroField] = parseSchema(json)

  // ------------------------------------------------------------ encode

  /** Fixture-encoder twin (every codec here ships one): write rows of
    * the subset schema into one container. `sync` must be 16 octets —
    * pass a deterministic marker; fixtures must not read entropy.
    */
  def writeContainer(schemaJson: String, rows: Seq[Seq[Any]],
      sync: Array[Byte], codec: String = "null",
      recordsPerBlock: Int = 1000): Array[Byte] = {
    require(sync.length == 16, "sync marker must be 16 octets")
    require(codec == "null" || codec == "deflate" || codec == "snappy",
      s"unsupported codec '$codec'")
    val fields = parseSchema(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    writeZlong(out, 2) // metadata map: one block of two pairs
    writeStr(out, "avro.schema"); writeBytes(out, schemaJson.getBytes(StandardCharsets.UTF_8))
    writeStr(out, "avro.codec"); writeBytes(out, codec.getBytes(StandardCharsets.UTF_8))
    writeZlong(out, 0)
    out.write(sync)
    rows.grouped(recordsPerBlock).foreach { block =>
      val body = new java.io.ByteArrayOutputStream()
      block.foreach { vals =>
        require(vals.length == fields.length,
          s"row arity ${vals.length} != schema arity ${fields.length}")
        fields.zip(vals).foreach { case (f, v) => encodeField(body, f, v) }
      }
      val payload = codec match {
        case "null" => body.toByteArray
        case "deflate" =>
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(body.toByteArray); d.finish()
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          try while (!d.finished()) { val k = d.deflate(buf); o.write(buf, 0, k) }
          finally d.end()
          o.toByteArray
        case "snappy" =>
          val raw = body.toByteArray
          val crc = new java.util.zip.CRC32
          crc.update(raw)
          Snappy.compress(raw) ++
            java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
      }
      writeZlong(out, block.size.toLong)
      writeZlong(out, payload.length.toLong)
      out.write(payload)
      out.write(sync)
    }
    out.toByteArray
  }

  private def encodeField(out: java.io.ByteArrayOutputStream, f: AvroField, v: Any): Unit = {
    if (f.nullable) {
      if (v == null) { writeZlong(out, 0); return }
      writeZlong(out, 1)
    } else require(v != null, s"null in non-nullable field '${f.name}'")
    f.typ match {
      case "long" => writeZlong(out, v.asInstanceOf[Number].longValue())
      case "int" => writeZlong(out, v.asInstanceOf[Number].intValue().toLong)
      case "boolean" => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case "double" =>
        val b = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putDouble(v.asInstanceOf[Number].doubleValue())
        out.write(b.array())
      case "float" =>
        val b = java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putFloat(v.asInstanceOf[Number].floatValue())
        out.write(b.array())
      case "string" => writeStr(out, v.asInstanceOf[String])
      case "bytes" => writeBytes(out, v.asInstanceOf[Array[Byte]])
    }
  }

  private def writeZlong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    out.write(z.toInt)
  }
  private def writeStr(out: java.io.ByteArrayOutputStream, s: String): Unit =
    writeBytes(out, s.getBytes(StandardCharsets.UTF_8))
  private def writeBytes(out: java.io.ByteArrayOutputStream, b: Array[Byte]): Unit = {
    writeZlong(out, b.length.toLong); out.write(b)
  }
}
