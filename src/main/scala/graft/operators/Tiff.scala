package graft.operators

/** Baseline TIFF reader (the published TIFF 6.0 structure: byte-order
  * header, IFD entry walk, strip-organized raster) — the sixth
  * still-image container beside BMP/PNG/JPEG/GIF/QOI, and the first
  * with BOTH byte orders live in the wild ("II" little- and "MM"
  * big-endian files are equally common), so the IFD walk is
  * endian-parameterized rather than hardcoded.
  *
  * Subset (spec-pinned in TiffSpec, loud beyond it): 8-bit samples,
  * Compression = 1 (none), PhotometricInterpretation 1 (BlackIsZero
  * grayscale) or 2 (RGB), SamplesPerPixel 1 or 3, any strip layout
  * (RowsPerStrip + StripOffsets/StripByteCounts arrays, SHORT or LONG
  * typed, inline or offset-stored — all four combinations decode).
  * Unknown tags are SKIPPED (the format's extensibility contract);
  * a missing required tag, a short strip, an unsupported compression
  * or bit depth fail loudly. First IFD only (multi-page refused
  * loudly, not truncated silently).
  *
  * The writer twin ([[encode]]) emits a minimal little-endian baseline
  * file so fixtures exercise real IFD/strip framing; TiffSpec also
  * hand-builds a big-endian ("MM") stream byte for byte.
  */
object Tiff {

  final case class Decoded(w: Int, h: Int, channels: Int, pixels: Array[Int])

  private val MaxPixels = 100000000L

  private def err(what: String): Nothing =
    throw new IllegalArgumentException(s"malformed TIFF stream: $what")

  private final class Rd(bytes: Array[Byte], le: Boolean) {
    def u8(o: Int): Int = {
      if (o < 0 || o >= bytes.length) err(s"offset $o out of bounds")
      bytes(o) & 0xff
    }
    def u16(o: Int): Int =
      if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      if (le) (u16(o) | (u16(o + 2).toLong << 16)) & 0xffffffffL
      else ((u16(o).toLong << 16) | u16(o + 2)) & 0xffffffffL
  }

  /** One IFD entry's values as longs (SHORT=3 or LONG=4 only — the
    * types the baseline tags use; value array inline when it fits the
    * 4-byte value slot, at the pointed offset otherwise).
    */
  private def entryValues(r: Rd, entryOff: Int): (Int, Seq[Long]) = {
    val tag = r.u16(entryOff)
    val typ = r.u16(entryOff + 2)
    val n = r.u32(entryOff + 4)
    if (n > 65536) err(s"tag $tag count $n exceeds the sanity bound")
    val size = typ match {
      case 3 => 2
      case 4 => 4
      case _ => return (tag, Seq.empty) // non-integer types: caller skips
    }
    val total = size * n.toInt
    val base = if (total <= 4) entryOff + 8 else r.u32(entryOff + 8).toInt
    val vals = (0 until n.toInt).map { i =>
      if (size == 2) r.u16(base + 2 * i).toLong else r.u32(base + 4 * i)
    }
    (tag, vals)
  }

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    val r = new Rd(bytes, le)
    if (r.u16(2) != 42) return None // the spec's arbitrary-but-carefully-chosen 42
    val ifd = r.u32(4).toInt
    val nEntries = r.u16(ifd)
    val tags = scala.collection.mutable.Map.empty[Int, Seq[Long]]
    (0 until nEntries).foreach { i =>
      val (tag, vals) = entryValues(r, ifd + 2 + 12 * i)
      if (vals.nonEmpty) tags(tag) = vals // unknown tags simply rest here
    }
    if (r.u32(ifd + 2 + 12 * nEntries) != 0L) err("multi-page TIFF (IFD chain) unsupported")
    def one(tag: Int, name: String): Long =
      tags.getOrElse(tag, err(s"required tag $name ($tag) missing")).head
    def opt(tag: Int, dflt: Long): Long = tags.get(tag).map(_.head).getOrElse(dflt)
    val w = one(256, "ImageWidth")
    val h = one(257, "ImageLength")
    val comp = opt(259, 1L)
    if (comp != 1L) err(s"compression $comp (baseline subset: 1 = none)")
    val photo = one(262, "PhotometricInterpretation")
    val spp = opt(277, 1L).toInt
    val ok = (photo == 2L && spp == 3) || (photo <= 1L && spp == 1)
    if (!ok) err(s"photometric $photo with $spp samples/pixel unsupported")
    if (photo == 0L) err("WhiteIsZero grayscale unsupported (inverted ramp)")
    val bits = tags.getOrElse(258, Seq.fill(spp)(8L))
    if (bits.exists(_ != 8L)) err(s"bits-per-sample $bits (subset: 8)")
    // per-dim guard BEFORE the product: raw uint32s can wrap Long in w*h
    if (w <= 0 || h <= 0 || w > MaxPixels || h > MaxPixels) err(s"dims ${w}x$h")
    if (w * h > MaxPixels) err(s"dims ${w}x$h exceed the $MaxPixels-pixel guard")
    val rowsPerStrip = opt(278, h)
    if (rowsPerStrip <= 0) err(s"RowsPerStrip $rowsPerStrip")
    val offsets = tags.getOrElse(273, err("required tag StripOffsets (273) missing"))
    val counts = tags.getOrElse(279, err("required tag StripByteCounts (279) missing"))
    if (offsets.size != counts.size)
      err(s"${offsets.size} strip offsets vs ${counts.size} byte counts")
    val expectStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
    if (offsets.size != expectStrips)
      err(s"${offsets.size} strips for $h rows at $rowsPerStrip rows/strip")
    val rowBytes = w.toInt * spp
    val out = new Array[Int]((w * h).toInt)
    var row = 0
    offsets.zip(counts).foreach { case (off, cnt) =>
      val rowsHere = math.min(rowsPerStrip, h - row).toInt
      if (cnt != rowsHere.toLong * rowBytes)
        err(s"strip at $off carries $cnt octets, expected ${rowsHere.toLong * rowBytes}")
      if (off + cnt > bytes.length) err(s"strip at $off truncated")
      var k = 0
      while (k < rowsHere) {
        val src = off.toInt + k * rowBytes
        var x = 0
        while (x < w.toInt) {
          val px = if (spp == 3) {
            val rr = bytes(src + 3 * x) & 0xff
            val gg = bytes(src + 3 * x + 1) & 0xff
            val bb = bytes(src + 3 * x + 2) & 0xff
            (0xff << 24) | (rr << 16) | (gg << 8) | bb
          } else {
            val v = bytes(src + x) & 0xff
            (0xff << 24) | (v << 16) | (v << 8) | v
          }
          out((row + k) * w.toInt + x) = px
          x += 1
        }
        k += 1
      }
      row += rowsHere
    }
    Some(Decoded(w.toInt, h.toInt, spp, out))
  }

  /** Minimal little-endian baseline writer: one or more strips of
    * uncompressed 8-bit RGB (channels = 3) or grayscale (1), plus an
    * inert UNKNOWN tag (0x9999) the reader must skip. `pixels(i)` is
    * 0xAARGGBB row-major; alpha ignored.
    */
  def encode(w: Int, h: Int, channels: Int, pixels: Array[Int],
      rowsPerStrip: Int = Int.MaxValue): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(w > 0 && h > 0 && w.toLong * h == pixels.length,
      s"dims ${w}x$h vs ${pixels.length} pixels")
    val rps = math.min(rowsPerStrip, h)
    val nStrips = (h + rps - 1) / rps
    val rowBytes = w * channels
    // layout: header(8) | IFD | [strip arrays if spilled] | strip data
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    // (tag, type, count, valueOrOffset) — filled below once offsets known
    val nEntries = 10
    val ifdOff = 8
    val ifdSize = 2 + 12 * nEntries + 4
    var cursor = ifdOff + ifdSize
    // strip offset/count arrays spill after the IFD when nStrips > 1
    // (a single LONG value rides inline in the entry's value slot)
    val arraysOff = cursor
    if (nStrips > 1) cursor += 2 * 4 * nStrips
    val dataOff = cursor
    val stripOffsets = (0 until nStrips).map { s =>
      dataOff.toLong + s.toLong * rps * rowBytes
    }
    val stripCounts = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      rows.toLong * rowBytes
    }
    entries += ((256, 4, 1, w.toLong))
    entries += ((257, 4, 1, h.toLong))
    entries += ((258, 3, 1, 8L))
    entries += ((259, 3, 1, 1L))
    entries += ((262, 3, 1, if (channels == 3) 2L else 1L))
    entries += ((273, 4, nStrips,
      if (nStrips == 1) stripOffsets.head else arraysOff.toLong))
    entries += ((277, 3, 1, channels.toLong))
    entries += ((278, 4, 1, rps.toLong))
    entries += ((279, 4, nStrips,
      if (nStrips == 1) stripCounts.head else arraysOff.toLong + 4L * nStrips))
    entries += ((0x9999, 4, 1, 123456L)) // unknown tag: reader must skip
    val sorted = entries.sortBy(_._1) // the spec mandates ascending tag order
    val total = dataOff + h * rowBytes
    val out = new Array[Byte](total)
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = {
      w16(o, (v & 0xffff).toInt); w16(o + 2, ((v >> 16) & 0xffff).toInt)
    }
    out(0) = 'I'; out(1) = 'I'; w16(2, 42); w32(4, ifdOff.toLong)
    w16(ifdOff, nEntries)
    sorted.zipWithIndex.foreach { case ((tag, typ, cnt, v), i) =>
      val o = ifdOff + 2 + 12 * i
      w16(o, tag); w16(o + 2, typ); w32(o + 4, cnt.toLong)
      if (typ == 3) w16(o + 8, v.toInt) else w32(o + 8, v)
    }
    w32(ifdOff + 2 + 12 * nEntries, 0L) // no next IFD
    if (nStrips > 1) {
      stripOffsets.zipWithIndex.foreach { case (v, i) => w32(arraysOff + 4 * i, v) }
      stripCounts.zipWithIndex.foreach { case (v, i) =>
        w32(arraysOff + 4 * nStrips + 4 * i, v)
      }
    }
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      if (channels == 3) {
        out(dataOff + 3 * i) = ((p >> 16) & 0xff).toByte
        out(dataOff + 3 * i + 1) = ((p >> 8) & 0xff).toByte
        out(dataOff + 3 * i + 2) = (p & 0xff).toByte
      } else out(dataOff + i) = (p & 0xff).toByte
      i += 1
    }
    out
  }
}
