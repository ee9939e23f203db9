package graft.operators

/** QOI — the "Quite OK Image" format (the published one-page spec at
  * qoiformat.org / qoi.h): the fifth still-image container beside
  * BMP/PNG/JPEG/GIF, chosen because it is a REAL lossless format with
  * a genuinely different compression model (a running 64-slot color
  * index + byte-wise delta ops instead of filters+DEFLATE or DCT).
  * Decoder and encoder both implemented from the spec.
  *
  * Layout: 14-byte header (magic "qoif", width/height uint32 BE,
  * channels 3|4, colorspace 0|1), then a chunk stream over pixels in
  * row-major order, closed by the 8-byte end marker 0x00×7 0x01.
  * Chunks (2-bit tags, 8-bit tags win):
  *   - QOI_OP_RGB  0xFE r g b          (alpha unchanged)
  *   - QOI_OP_RGBA 0xFF r g b a
  *   - QOI_OP_INDEX 0b00iiiiii         (64-slot index, hash
  *     (3r+5g+7b+11a) mod 64)
  *   - QOI_OP_DIFF 0b01_dr_dg_db       (2-bit channel deltas, bias 2,
  *     alpha unchanged, wrapping)
  *   - QOI_OP_LUMA 0b10_dddddd + byte  (dg 6-bit bias 32; dr−dg and
  *     db−dg 4-bit bias 8, wrapping)
  *   - QOI_OP_RUN  0b11_rrrrrr         (run 1..62, bias −1; 63/64
  *     collide with the 8-bit tags and are illegal)
  * Decoder state starts at previous = (0,0,0,255), index all-zero;
  * EVERY decoded pixel is written into its index slot.
  *
  * Loud-failure contract: wrong magic → None (sniffing callers route
  * elsewhere); anything structurally wrong past the magic (bad
  * channels, truncated stream, chunk overrun past the pixel count,
  * missing/garbled end marker, oversized dims) throws — corrupt data
  * is refused, never "close enough" (the Warc/Avro posture).
  */
object Qoi {

  /** Decoded image: `pixels(i)` is 0xAARRGGBB at row-major i. */
  final case class Decoded(w: Int, h: Int, channels: Int, pixels: Array[Int])

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def err(what: String): Nothing =
    throw new IllegalArgumentException(s"malformed QOI stream: $what")

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  /** Max pixels per image — same guard class as the BMP/PNG paths. */
  private val MaxPixels = 100000000L

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 14 ||
      bytes(0) != 'q' || bytes(1) != 'o' || bytes(2) != 'i' || bytes(3) != 'f')
      return None
    val w = be32(bytes, 4)
    val h = be32(bytes, 8)
    val channels = bytes(12) & 0xff
    val colorspace = bytes(13) & 0xff
    if (channels != 3 && channels != 4) err(s"channels $channels (spec: 3|4)")
    if (colorspace > 1) err(s"colorspace $colorspace (spec: 0|1)")
    // guard each dimension BEFORE multiplying: w and h are raw uint32s,
    // so w*h can wrap Long and sail past the product guard
    if (w <= 0 || h <= 0 || w > MaxPixels || h > MaxPixels) err(s"dims ${w}x$h")
    if (w * h > MaxPixels) err(s"dims ${w}x$h exceed the $MaxPixels-pixel guard")
    val n = (w * h).toInt
    val out = new Array[Int](n)
    val index = new Array[Int](64) // 0xAARRGGBB, all-zero start per spec
    var r = 0; var g = 0; var b = 0; var a = 255
    var pos = 14
    var i = 0
    def need(k: Int): Unit =
      if (pos + k > bytes.length) err(s"truncated at byte $pos: need $k more")
    while (i < n) {
      need(1)
      val tag = bytes(pos) & 0xff; pos += 1
      var run = 1
      if (tag == 0xfe) { // RGB
        need(3)
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff; b = bytes(pos + 2) & 0xff
        pos += 3
      } else if (tag == 0xff) { // RGBA
        need(4)
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff
        b = bytes(pos + 2) & 0xff; a = bytes(pos + 3) & 0xff
        pos += 4
      } else (tag >> 6) match {
        case 0 => // INDEX
          val px = index(tag & 0x3f)
          a = (px >>> 24) & 0xff; r = (px >> 16) & 0xff
          g = (px >> 8) & 0xff; b = px & 0xff
        case 1 => // DIFF, bias 2, wrapping
          r = (r + ((tag >> 4) & 0x3) - 2) & 0xff
          g = (g + ((tag >> 2) & 0x3) - 2) & 0xff
          b = (b + (tag & 0x3) - 2) & 0xff
        case 2 => // LUMA, dg bias 32; dr-dg / db-dg bias 8
          need(1)
          val dg = (tag & 0x3f) - 32
          val b2 = bytes(pos) & 0xff; pos += 1
          r = (r + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
          g = (g + dg) & 0xff
          b = (b + dg + (b2 & 0xf) - 8) & 0xff
        case _ => // RUN, bias -1; 63/64 are the 8-bit tags, unreachable here
          run = (tag & 0x3f) + 1
      }
      if (i + run > n) err(s"chunk at byte ${pos - 1} overruns the pixel count")
      val px = (a << 24) | (r << 16) | (g << 8) | b
      index(hash(r, g, b, a)) = px
      var k = 0
      while (k < run) { out(i) = px; i += 1; k += 1 }
    }
    need(8)
    var k = 0
    while (k < 7) {
      if (bytes(pos + k) != 0) err("end marker: expected 0x00*7 0x01")
      k += 1
    }
    if (bytes(pos + 7) != 1) err("end marker: expected 0x00*7 0x01")
    if (pos + 8 != bytes.length) err(s"${bytes.length - pos - 8} trailing octets")
    Some(Decoded(w.toInt, h.toInt, channels, out))
  }

  /** Reference-shaped greedy encoder (the qoi.c strategy: run, then
    * index, then diff, then luma, then RGB/RGBA) — exists so fixtures
    * are REAL streams exercising every op, and so re-encode round
    * trips are byte-faithful to the published behavior. `pixels(i)` is
    * 0xAARRGGBB; channels 3 forces alpha 255.
    */
  def encode(w: Int, h: Int, channels: Int, pixels: Array[Int]): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels $channels")
    require(w > 0 && h > 0 && w.toLong * h == pixels.length,
      s"dims ${w}x$h vs ${pixels.length} pixels")
    val out = new java.io.ByteArrayOutputStream(pixels.length / 2 + 32)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be(w); be(h); out.write(channels); out.write(0)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    var i = 0
    while (i < pixels.length) {
      val px0 = pixels(i)
      val a = if (channels == 3) 255 else (px0 >>> 24) & 0xff
      val r = (px0 >> 16) & 0xff; val g = (px0 >> 8) & 0xff; val b = px0 & 0xff
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val px = (a << 24) | (r << 16) | (g << 8) | b
        val hx = hash(r, g, b, a)
        if (index(hx) == px) out.write(hx)
        else {
          index(hx) = px
          if (a == pa) {
            val dr = ((r - pr + 128) & 0xff) - 128
            val dg = ((g - pg + 128) & 0xff) - 128
            val db = ((b - pb + 128) & 0xff) - 128
            val drg = dr - dg; val dbg = db - dg
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
              dbg >= -8 && dbg <= 7) {
              out.write(0x80 | (dg + 32)); out.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(b)
            }
          } else {
            out.write(0xff); out.write(r); out.write(g); out.write(b); out.write(a)
          }
        }
        pr = r; pg = g; pb = b; pa = a
      }
      i += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    // index parity with the decoder: runs repeat the PREVIOUS pixel,
    // whose slot is already current, and an index hit re-writes the
    // same value — both idempotent, so updating only on fresh pixels
    // here matches the decoder's every-pixel update exactly.
    (0 until 7).foreach(_ => out.write(0))
    out.write(1)
    out.toByteArray
  }
}
