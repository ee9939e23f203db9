package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta + VByte posting-list compression — the storage format of every
  * serious inverted index (Manning/Raghavan/Schütze IR ch. 5): sorted
  * doc ids become gaps, gaps become 7-bit variable-byte groups with a
  * continuation bit. Pairs with [[Ranking]]'s inverted index / BM25:
  * at 100 TB the postings ARE the index cost, and gap+VByte turns
  * 8-byte ids into ~1 byte for dense terms. No reference analog
  * (SURVEY.md §2.11 surface).
  *
  * Wire form (spec-pinned): first value is the ABSOLUTE first doc id,
  * every later value the gap to its predecessor (strictly positive —
  * duplicates and disorder are encode-time errors, loudly). Each value
  * little-7-bit-group first, high bit = "more groups follow" — the
  * classic VByte, so `vbyteLen(v)` is a closed form an oracle replays
  * as a CASE ladder (q241).
  *
  * Spark shape: encode/decode are scalar byte-array transforms riding
  * a UDF over the already-aggregated (term → sorted ids) rows — the
  * shuffle is the index build's own groupBy, compression adds no
  * topology.
  */
object Postings {

  /** Octets VByte spends on one non-negative value. */
  def vbyteLen(v: Long): Int = {
    require(v >= 0, s"negative value $v")
    var n = 1; var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  /** Encode a STRICTLY increasing posting list. */
  def encode(postings: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(postings.size + 8)
    var prev = -1L
    postings.foreach { p =>
      require(p >= 0, s"negative doc id $p")
      require(p > prev, s"postings must be strictly increasing: $p after $prev")
      var v = if (prev < 0) p else p - prev
      prev = p
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    out.toByteArray
  }

  /** Decode [[encode]]'s wire form. Truncated streams fail loudly. */
  def decode(bytes: Array[Byte]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var pos = 0
    var prev = -1L
    while (pos < bytes.length) {
      var shift = 0; var acc = 0L
      var more = true
      while (more) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException(
            s"truncated VByte stream at octet $pos")
        val b = bytes(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 63) throw new IllegalArgumentException(
          s"VByte value overruns 64 bits at octet $pos")
        more = (b & 0x80) != 0
      }
      prev = if (prev < 0) acc else prev + acc
      out += prev
    }
    out.result()
  }

  /** Compress `(termCol, postingsCol: array<long> — sorted, distinct)`
    * into `(term, df, blob, byte_len)`.
    */
  def compress(index: DataFrame, termCol: String, postingsCol: String): DataFrame = {
    val enc = udf { ps: Seq[Long] => encode(ps) }
    index.select(col(termCol).as("term"),
        size(col(postingsCol)).cast("long").as("df"),
        enc(col(postingsCol)).as("blob"))
      .withColumn("byte_len", octet_length(col("blob")).cast("long"))
  }
}
