package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Protocol-buffers wire-format reader (the published encoding spec:
  * varint/fixed64/len-delimited/fixed32 wire types) — the fourth
  * interchange format beside CSV/JSON, WARC(.gz) and Avro, implemented
  * from the wire spec like the other codecs. Containers hold
  * length-prefixed messages (the standard streaming convention); each
  * message decodes against a DECLARED flat schema.
  *
  * Subset (spec-pinned, loud beyond it): scalar fields `int64`
  * (plain varint, two's-complement), `sint64` (zigzag), `bool`,
  * `string`, `bytes`, `double` (fixed64 LE), `float` (fixed32 LE);
  * `repeated` numerics decode BOTH expanded (repeated tags) and
  * PACKED (one len-delimited run) forms, as the spec requires;
  * repeated strings/bytes are repeated tags. Unknown field numbers
  * are SKIPPED by their wire type (forward compatibility is the
  * format's point); a wire type that contradicts the declared schema
  * fails loudly. Absent scalars surface as NULL — a data engine wants
  * "not present", not proto3's invisible zero-defaults (documented
  * divergence); last-one-wins for duplicate non-repeated fields, per
  * the spec.
  *
  * Spark shape: [[Warc]]/[[Avro]]'s — one sequential pass per
  * container via `mapPartitions`, typed DataFrame out.
  */
object Protobuf {

  /** One declared field. `typ` ∈ int64 sint64 bool string bytes double
    * float.
    */
  final case class PbField(number: Int, name: String, typ: String,
      repeated: Boolean = false)

  private val WireOf = Map(
    "int64" -> 0, "sint64" -> 0, "bool" -> 0,
    "double" -> 1, "string" -> 2, "bytes" -> 2, "float" -> 5)

  private def elemType(typ: String): DataType = typ match {
    case "int64" | "sint64" => LongType
    case "bool" => BooleanType
    case "double" => DoubleType
    case "float" => FloatType
    case "string" => StringType
    case "bytes" => BinaryType
  }

  def sparkSchema(fields: Seq[PbField]): StructType = {
    require(fields.nonEmpty, "empty schema")
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    require(fields.forall(f => WireOf.contains(f.typ)),
      s"unsupported type in ${fields.filterNot(f => WireOf.contains(f.typ))}")
    require(fields.forall(_.number > 0), "field numbers must be positive")
    StructType(fields.map { f =>
      if (f.repeated) StructField(f.name, ArrayType(elemType(f.typ), containsNull = false))
      else StructField(f.name, elemType(f.typ))
    })
  }

  private final class Reader(val bytes: Array[Byte], val id: Long) {
    var pos = 0
    def err(what: String): Nothing = throw new IllegalArgumentException(
      s"malformed protobuf container $id at byte $pos: $what")
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        if (pos >= bytes.length) err("truncated varint")
        val b = bytes(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
        if (shift > 63) err("varint overruns 64 bits")
      }
      0L
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length) err(s"truncated: need $n octets")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; out
    }
    def fixed64(): Long = java.nio.ByteBuffer.wrap(take(8))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    def fixed32(): Int = java.nio.ByteBuffer.wrap(take(4))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def scalarFromVarint(typ: String, raw: Long, r: Reader): Any = typ match {
    case "int64" => raw
    case "sint64" => zigzag(raw)
    case "bool" => raw match {
      case 0L => false
      case 1L => true
      case b => r.err(s"bool varint $b")
    }
    case t => r.err(s"declared '$t' arrived as varint")
  }

  /** Decode one message body against the schema. */
  private def decodeMessage(r: Reader, end: Int, fields: Seq[PbField]): Row = {
    val byNum = fields.map(f => f.number -> f).toMap
    val scalars = scala.collection.mutable.Map.empty[Int, Any]
    val reps = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Any]]
    def addRep(n: Int, v: Any): Unit =
      reps.getOrElseUpdate(n, scala.collection.mutable.ArrayBuffer.empty) += v
    while (r.pos < end) {
      val tag = r.varint()
      val num = (tag >>> 3).toInt
      val wire = (tag & 0x7).toInt
      byNum.get(num) match {
        case None => wire match { // unknown field: skip by wire type
          case 0 => r.varint()
          case 1 => r.take(8)
          case 2 => val n = r.varint(); r.take(n.toInt)
          case 5 => r.take(4)
          case w => r.err(s"unknown field $num with unsupported wire type $w")
        }
        case Some(f) =>
          val declaredWire = WireOf(f.typ)
          val packed = f.repeated && wire == 2 && declaredWire != 2
          if (wire != declaredWire && !packed)
            r.err(s"field '${f.name}' ($f) arrived with wire type $wire")
          def one(): Any = declaredWire match {
            case 0 => scalarFromVarint(f.typ, r.varint(), r)
            case 1 => java.lang.Double.longBitsToDouble(r.fixed64())
            case 5 => java.lang.Float.intBitsToFloat(r.fixed32())
            case _ =>
              val n = r.varint()
              val b = r.take(n.toInt)
              if (f.typ == "string") new String(b, StandardCharsets.UTF_8) else b
          }
          if (packed) {
            val n = r.varint()
            val stop = r.pos + n.toInt
            if (stop > end) r.err(s"packed run of '${f.name}' overruns the message")
            while (r.pos < stop) addRep(num, declaredWire match {
              case 0 => scalarFromVarint(f.typ, r.varint(), r)
              case 1 => java.lang.Double.longBitsToDouble(r.fixed64())
              case 5 => java.lang.Float.intBitsToFloat(r.fixed32())
              case _ => r.err("unreachable: strings cannot pack")
            })
            if (r.pos != stop) r.err(s"packed run of '${f.name}' misaligned")
          } else if (f.repeated) addRep(num, one())
          else scalars(num) = one() // last one wins, per spec
      }
    }
    if (r.pos != end) r.err("message decoded past its declared length")
    Row(fields.map { f =>
      if (f.repeated) reps.get(f.number).map(_.toSeq).getOrElse(Seq.empty)
      else scalars.get(f.number).orNull
    }: _*)
  }

  /** Parse one container of length-prefixed messages. Package-visible
    * for the spec.
    */
  private[graft] def parseContainer(id: Long, bytes: Array[Byte],
      fields: Seq[PbField]): Seq[Row] = {
    sparkSchema(fields) // validates
    val r = new Reader(bytes, id)
    val out = Seq.newBuilder[Row]
    while (r.pos < bytes.length) {
      val len = r.varint()
      if (r.pos + len > bytes.length) r.err(s"message body truncated: need $len octets")
      val end = r.pos + len.toInt
      out += decodeMessage(r, end, fields)
    }
    out.result()
  }

  /** Explode `(idCol: long, blobCol: binary)` containers into typed
    * rows under the declared schema.
    */
  def records(containers: DataFrame, idCol: String, blobCol: String,
      fields: Seq[PbField]): DataFrame = {
    val idIdx = containers.schema.fieldIndex(idCol)
    val blobIdx = containers.schema.fieldIndex(blobCol)
    val outSchema = StructType(
      StructField("file_id", LongType, nullable = false) +: sparkSchema(fields).fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    containers.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(idIdx)
        parseContainer(id, row.getAs[Array[Byte]](blobIdx), fields)
          .map(r => Row.fromSeq(id +: r.toSeq))
      }
    }(enc)
  }

  // ------------------------------------------------------------ encode

  /** Fixture-encoder twin: one length-prefixed message per value map
    * (field name → value; Seq for repeated — numerics emit PACKED,
    * strings/bytes repeated tags; absent / null names are omitted).
    */
  def writeStream(fields: Seq[PbField], messages: Seq[Map[String, Any]]): Array[Byte] = {
    sparkSchema(fields)
    val out = new java.io.ByteArrayOutputStream()
    messages.foreach { m =>
      val body = new java.io.ByteArrayOutputStream()
      fields.foreach { f =>
        m.get(f.name).filter(_ != null).foreach { v =>
          if (f.repeated) {
            val xs = v.asInstanceOf[Seq[Any]]
            if (WireOf(f.typ) == 2) xs.foreach(x => writeOne(body, f, x))
            else if (xs.nonEmpty) { // packed
              val run = new java.io.ByteArrayOutputStream()
              xs.foreach(x => writePayload(run, f.typ, x))
              writeVarint(body, (f.number.toLong << 3) | 2)
              writeVarint(body, run.size.toLong)
              run.writeTo(body)
            }
          } else writeOne(body, f, v)
        }
      }
      writeVarint(out, body.size.toLong)
      body.writeTo(out)
    }
    out.toByteArray
  }

  private def writeOne(out: java.io.ByteArrayOutputStream, f: PbField, v: Any): Unit = {
    writeVarint(out, (f.number.toLong << 3) | WireOf(f.typ))
    if (WireOf(f.typ) == 2) {
      val b = v match {
        case s: String => s.getBytes(StandardCharsets.UTF_8)
        case b: Array[Byte] => b
      }
      writeVarint(out, b.length.toLong); out.write(b)
    } else writePayload(out, f.typ, v)
  }

  private def writePayload(out: java.io.ByteArrayOutputStream, typ: String, v: Any): Unit =
    typ match {
      case "int64" => writeVarint(out, v.asInstanceOf[Number].longValue())
      case "sint64" =>
        val x = v.asInstanceOf[Number].longValue()
        writeVarint(out, (x << 1) ^ (x >> 63))
      case "bool" => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
      case "double" =>
        val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putDouble(v.asInstanceOf[Number].doubleValue())
        out.write(b.array())
      case "float" =>
        val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putFloat(v.asInstanceOf[Number].floatValue())
        out.write(b.array())
    }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
}
