package graft.operators

/** Snappy block-format codec (the published format_description.txt,
  * implemented from the spec like the repo's other codecs): a
  * little-endian varint uncompressed length, then tagged elements —
  * literals (tag 00, 6-bit length with 1–4 escape length bytes) and
  * back-references with 1/2/4-byte offsets (tags 01/10/11), where
  * offset < length legally overlaps forward (run repetition). The
  * decoder is the load-bearing half (Avro's most common codec); the
  * compressor is the greedy 4-byte-hash matcher every real encoder
  * uses, here so fixtures exercise REAL copies, not literal-only
  * streams.
  */
object Snappy {

  private def err(pos: Int, what: String): Nothing =
    throw new IllegalArgumentException(s"malformed snappy stream at octet $pos: $what")

  /** Decompress one snappy block. Fails loudly on truncation, zero or
    * out-of-window offsets, length overruns, and preamble mismatch.
    */
  def decompress(in: Array[Byte]): Array[Byte] = {
    var pos = 0
    // varint uncompressed length
    var expected = 0L; var shift = 0
    var more = true
    while (more) {
      if (pos >= in.length) err(pos, "truncated length preamble")
      val b = in(pos) & 0xff; pos += 1
      expected |= (b & 0x7fL) << shift
      shift += 7
      if (shift > 35) err(pos, "length varint overruns 32 bits")
      more = (b & 0x80) != 0
    }
    if (expected > (1L << 30)) err(pos, s"declared length $expected past 1 GiB — refusing")
    val out = new Array[Byte](expected.toInt)
    var opos = 0
    while (pos < in.length) {
      val tag = in(pos) & 0xff; pos += 1
      (tag & 0x3) match {
        case 0 => // literal
          var len = (tag >> 2) + 1
          if (len > 60) {
            val extra = len - 60
            if (pos + extra > in.length) err(pos, "truncated literal length")
            var v = 0L
            (0 until extra).foreach(i => v |= (in(pos + i) & 0xffL) << (8 * i))
            pos += extra
            if (v + 1 > Int.MaxValue) err(pos, "literal length overruns")
            len = v.toInt + 1
          }
          if (pos + len > in.length) err(pos, "literal runs past input")
          if (opos + len > out.length) err(pos, "literal runs past declared length")
          System.arraycopy(in, pos, out, opos, len)
          pos += len; opos += len
        case c => // copy
          var len = 0; var offset = 0
          c match {
            case 1 =>
              len = 4 + ((tag >> 2) & 0x7)
              if (pos >= in.length) err(pos, "truncated copy-1 offset")
              offset = ((tag >> 5) << 8) | (in(pos) & 0xff); pos += 1
            case 2 =>
              len = (tag >> 2) + 1
              if (pos + 2 > in.length) err(pos, "truncated copy-2 offset")
              offset = (in(pos) & 0xff) | ((in(pos + 1) & 0xff) << 8); pos += 2
            case _ =>
              len = (tag >> 2) + 1
              if (pos + 4 > in.length) err(pos, "truncated copy-4 offset")
              offset = (in(pos) & 0xff) | ((in(pos + 1) & 0xff) << 8) |
                ((in(pos + 2) & 0xff) << 16) | ((in(pos + 3) & 0xff) << 24)
              pos += 4
          }
          if (offset <= 0) err(pos, "zero copy offset")
          if (offset > opos) err(pos, s"copy offset $offset reaches before the output start")
          if (opos + len > out.length) err(pos, "copy runs past declared length")
          // byte-by-byte: overlapping forward copies are the SPEC'd way
          // to encode runs (offset < len)
          var i = 0
          while (i < len) { out(opos + i) = out(opos + i - offset); i += 1 }
          opos += len
      }
    }
    if (opos != out.length)
      err(pos, s"stream produced $opos of declared ${out.length} octets")
    out
  }

  /** Greedy hash-match compressor (the reference encoder's shape): a
    * 4-byte rolling hash table finds back-references; everything else
    * is literals. Output is valid snappy that [[decompress]] — and any
    * conforming decoder — round-trips.
    */
  def compress(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    // varint length preamble
    var v = in.length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    val table = new Array[Int](1 << 14)
    java.util.Arrays.fill(table, -1)
    def hash(i: Int): Int =
      (((in(i) & 0xff) | ((in(i + 1) & 0xff) << 8) |
        ((in(i + 2) & 0xff) << 16) | ((in(i + 3) & 0xff) << 24)) * 0x1e35a7bd) >>> 18
    def emitLiteral(from: Int, until: Int): Unit = {
      var s = from
      while (s < until) {
        val len = math.min(until - s, 65536)
        if (len <= 60) out.write((len - 1) << 2)
        else if (len <= 256) { out.write(60 << 2); out.write(len - 1) }
        else { // 2-byte escape length covers the 64 KiB chunk cap
          out.write(61 << 2)
          out.write((len - 1) & 0xff); out.write(((len - 1) >> 8) & 0xff)
        }
        out.write(in, s, len)
        s += len
      }
    }
    var pos = 0
    var litStart = 0
    while (pos + 4 <= in.length) {
      val h = hash(pos)
      val cand = table(h)
      table(h) = pos
      if (cand >= 0 && pos - cand <= 65535 &&
          in(cand) == in(pos) && in(cand + 1) == in(pos + 1) &&
          in(cand + 2) == in(pos + 2) && in(cand + 3) == in(pos + 3)) {
        emitLiteral(litStart, pos)
        var len = 4
        while (pos + len < in.length && len < 64 && in(cand + len) == in(pos + len)) len += 1
        val offset = pos - cand
        // 2-byte-offset copy covers offsets to 65535 and lengths to 64
        out.write(((len - 1) << 2) | 2)
        out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        pos += len
        litStart = pos
      } else pos += 1
    }
    emitLiteral(litStart, in.length)
    out.toByteArray
  }
}
