package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** REAL GIF (87a/89a) decode, pure JVM — the fourth codec-class format on
  * the real-decode path after PNG (zlib), JPEG (Huffman+DCT) and MP4
  * (container walk). GIF's payload is LZW-compressed palette indices, so
  * the decoder owns the full critical path with no library at all:
  * logical-screen/image descriptors, global+local color tables, extension
  * skipping, sub-block reassembly, LSB-first variable-width LZW with
  * dictionary growth/reset, and 4-pass interlace row mapping.
  *
  * Reference analog: none (the reference is an OPC→Mongo bridge); this is
  * SURVEY.md §2.11 multimodal surface. Stats stream per pixel — the image
  * is never materialized, so a 100 TB corpus of blobs decodes in O(1)
  * memory per row beyond the 12-bit dictionary (fixed 4096 entries).
  *
  * Hostile-input posture mirrors Jpeg/Mp4/PNG: every length is bounds-
  * checked, claimed geometry above [[Multimodal.MaxStatPixels]] (the
  * Σ i·255 Long-overflow cap) returns None, an out-of-range LZW code
  * returns None, and decode stops exactly at width·height emitted pixels
  * so a malicious stream cannot force unbounded output.
  */
private[graft] object Gif {

  /** Sequential LZW decode state over GIF's LSB-first packed codes.
    * Dictionary entries are (prefixCode, suffixByte) pairs — emitting an
    * entry walks the prefix chain through a reusable stack, so no entry
    * ever materializes as an array (entry length is still bounded by the
    * pixel budget because emission decrements it).
    */
  private final class LzwReader(bytes: Array[Byte], var pos: Int, minCode: Int) {
    private val clearCode = 1 << minCode
    private val eoiCode = clearCode + 1
    private val prefix = new Array[Int](4096)
    private val suffix = new Array[Byte](4096)
    private val stack = new Array[Byte](4096)
    private var next = 0
    private var codeSize = 0
    private var prevCode = -1
    // bit buffer across sub-block boundaries
    private var bitBuf = 0
    private var bitCnt = 0
    private var blockLeft = 0
    private var done = false

    reset()

    private def reset(): Unit = {
      next = eoiCode + 1
      codeSize = minCode + 1
      prevCode = -1
    }

    /** Pull the next codeSize bits (LSB-first), refilling from length-
      * prefixed sub-blocks. Returns -1 on truncation.
      */
    private def readCode(): Int = {
      while (bitCnt < codeSize) {
        if (blockLeft == 0) {
          if (pos >= bytes.length) return -1
          blockLeft = bytes(pos) & 0xff
          pos += 1
          if (blockLeft == 0) return -1 // terminator before EOI
        }
        if (pos >= bytes.length) return -1
        bitBuf |= (bytes(pos) & 0xff) << bitCnt
        bitCnt += 8
        pos += 1
        blockLeft -= 1
      }
      val c = bitBuf & ((1 << codeSize) - 1)
      bitBuf >>>= codeSize
      bitCnt -= codeSize
      c
    }

    /** Decode up to `budget` pixels into `emit`; returns pixels emitted,
      * or -1 on any malformation (bad code, truncation before budget).
      */
    def decodeInto(budget: Long)(emit: Int => Unit): Long = {
      var emitted = 0L
      while (emitted < budget && !done) {
        val code = readCode()
        if (code < 0) return -1
        if (code == clearCode) { reset() }
        else if (code == eoiCode) { done = true }
        else {
          // code == next is only legal as the KwKwK case with a prior code
          if (code > next || (code == next && prevCode < 0)) return -1
          var sp = 0
          var cur = code
          var firstByte = 0
          if (code == next) {
            // KwKwK: entry = prev + first(prev); synthesize by pushing a
            // placeholder now and resolving first(prev) below
            cur = prevCode
            sp = 1 // reserve slot 0 for the repeated first byte
          }
          while (cur >= clearCode + 2) {
            if (sp >= stack.length) return -1
            stack(sp) = suffix(cur); sp += 1
            cur = prefix(cur)
          }
          firstByte = cur // a literal (< clearCode)
          if (cur >= clearCode) return -1
          if (code == next) stack(0) = firstByte.toByte
          // emit literal then stack in reverse (stack holds the tail)
          emit(firstByte)
          emitted += 1
          var i = sp - 1
          while (i >= 0 && emitted < budget) {
            emit(stack(i) & 0xff); emitted += 1; i -= 1
          }
          if (i >= 0) return emitted // budget hit mid-entry: pixels complete
          if (prevCode >= 0 && next < 4096) {
            prefix(next) = prevCode
            suffix(next) = firstByte.toByte
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prevCode = code
        }
      }
      emitted
    }
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Logical row order of an interlaced GIF: pass 1 rows 0,8,16…, pass 2
    * rows 4,12…, pass 3 rows 2,6…, pass 4 rows 1,3,5…
    */
  private def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var k = 0
    val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
    var p = 0
    while (p < 4) {
      var y = starts(p)
      while (y < h) { out(k) = y; k += 1; y += steps(p) }
      p += 1
    }
    out
  }

  /** Parse a GIF and stream per-pixel RGB stats (mean per channel +
    * `weighted_r` = Σ i·R over logical index i = y·width + x, the same
    * position-sensitive checksum as the BMP/PNG/JPEG paths — it catches
    * interlace and palette-order bugs a mean would mask). Uses the FIRST
    * image block; local color table overrides global. Returns None for
    * non-GIF, truncated, oversized, or LZW-malformed input.
    */
  private[graft] def decodeStats(id: Long, bytes: Array[Byte]): Option[Row] = {
    var w = 0; var h = 0
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wR = 0L
    val ok = decodeFirstFrame(bytes) { (iw, ih) => w = iw; h = ih } {
      (i, r, g, b) =>
        sumR += r; sumG += g; sumB += b
        wR += i * r
    }
    if (!ok) None
    else {
      val n = w.toLong * h
      Some(Row(id, w, h, n, sumR.toDouble / n, sumG.toDouble / n,
        sumB.toDouble / n, wR))
    }
  }

  /** The shared first-image decode path: header + global/local color
    * table, block walk to the first image descriptor, full LZW
    * machinery, de-interlace. `init(w, h)` runs once at the descriptor;
    * `emit(i, r, g, b)` runs per pixel with `i` the LOGICAL index
    * y·w + x (interlaced streams arrive in storage order but are
    * emitted with their logical position — downstream code never sees
    * the pass structure). Returns false for non-GIF, truncated,
    * oversized, palette-escaping, or LZW-malformed input. ONE proven
    * decode path under both [[decodeStats]] and
    * [[Multimodal.gifDHash]].
    */
  private[graft] def decodeFirstFrame(bytes: Array[Byte])(
      init: (Int, Int) => Unit)(
      emit: (Long, Int, Int, Int) => Unit): Boolean = {
    if (bytes.length < 14) return false
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return false
    val packed = bytes(10) & 0xff
    var pos = 13
    var gctSize = 0
    var gctOff = -1
    if ((packed & 0x80) != 0) {
      gctSize = 2 << (packed & 7)
      gctOff = pos
      pos += 3 * gctSize
      if (pos > bytes.length) return false
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => return false // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var len = if (pos < bytes.length) bytes(pos) & 0xff else return false
          while (len != 0) {
            pos += 1 + len
            if (pos >= bytes.length) return false
            len = bytes(pos) & 0xff
          }
          pos += 1
        case 0x2c =>
          if (pos + 10 > bytes.length) return false
          val w = le16(bytes, pos + 5)
          val h = le16(bytes, pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          pos += 10
          var palOff = gctOff
          var palSize = gctSize
          if ((ipacked & 0x80) != 0) {
            palSize = 2 << (ipacked & 7)
            palOff = pos
            pos += 3 * palSize
            if (pos > bytes.length) return false
          }
          if (w <= 0 || h <= 0 || palOff < 0) return false
          val n = w.toLong * h
          if (n > Multimodal.MaxStatPixels) return false
          if (pos >= bytes.length) return false
          val minCode = bytes(pos) & 0xff
          if (minCode < 2 || minCode > 8) return false
          init(w, h)
          val rows = if (interlaced) interlaceRows(h) else null
          var k = 0L // stream position in stored order
          val pOff = palOff; val pSize = palSize
          val reader = new LzwReader(bytes, pos + 1, minCode)
          val got = try reader.decodeInto(n) { v =>
            if (v >= pSize) throw new IllegalArgumentException("palette index")
            val r = bytes(pOff + 3 * v) & 0xff
            val g = bytes(pOff + 3 * v + 1) & 0xff
            val b = bytes(pOff + 3 * v + 2) & 0xff
            val y = if (rows == null) k / w else rows((k / w).toInt).toLong
            emit(y * w + k % w, r, g, b)
            k += 1
          } catch { case _: IllegalArgumentException => -1L }
          return got == n
        case _ => return false
      }
    }
    false
  }

  // ===================== ANIMATION METADATA =====================

  val gifAnimSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_loops", LongType, nullable = false)))

  /** Animated-GIF metadata: walk EVERY block (not just to the first
    * image): frame count, total duration from the Graphic Control
    * Extension delays (centiseconds → ms), loop count from the NETSCAPE
    * 2.0 application extension (0 = forever, -1 = not animated/absent),
    * logical screen dims. Returns None for non-GIF/truncated/imageless
    * streams. Sub-block walking is bounds-checked — a hostile length
    * byte terminates cleanly.
    */
  private[graft] def parseAnimMeta(id: Long, bytes: Array[Byte]): Option[Row] = {
    if (bytes.length < 14) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val w = le16(bytes, 6)
    val h = le16(bytes, 8)
    val packed = bytes(10) & 0xff
    var pos = 13
    if ((packed & 0x80) != 0) {
      pos += 3 * (2 << (packed & 7))
      if (pos > bytes.length) return None
    }
    var nFrames = 0
    var totalCs = 0L
    var pendingCs = 0L // a GCE governs only the NEXT image descriptor
    var loops = -1L
    var done = false
    while (!done && pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 =>
          if (pos + 2 >= bytes.length) return None
          val label = bytes(pos + 1) & 0xff
          var p = pos + 2
          var first = true
          var len = bytes(p) & 0xff
          while (len != 0) {
            if (label == 0xf9 && first && len >= 4 && p + 4 < bytes.length) {
              // latest-wins, charged only when a frame follows: stray or
              // doubled GCEs (common in crawled GIFs) must not inflate
              // the duration
              pendingCs = le16(bytes, p + 2)
            }
            if (label == 0xff && first && len == 11 &&
              p + 11 < bytes.length &&
              new String(bytes, p + 1, 11, "US-ASCII") == "NETSCAPE2.0") {
              // the next sub-block carries [0x01, loops lo, loops hi]
              val q = p + 12
              if (q < bytes.length && (bytes(q) & 0xff) >= 3 &&
                q + 3 < bytes.length && (bytes(q + 1) & 0xff) == 1) {
                loops = le16(bytes, q + 2).toLong
              }
            }
            first = false
            p += 1 + len
            if (p >= bytes.length) return None
            len = bytes(p) & 0xff
          }
          pos = p + 1
        case 0x2c =>
          if (pos + 10 > bytes.length) return None
          val ipacked = bytes(pos + 9) & 0xff
          var p = pos + 10
          if ((ipacked & 0x80) != 0) {
            p += 3 * (2 << (ipacked & 7))
            if (p > bytes.length) return None
          }
          if (p >= bytes.length) return None
          p += 1 // LZW min code size
          // skip the image's data sub-blocks without decoding
          if (p >= bytes.length) return None
          var len = bytes(p) & 0xff
          while (len != 0) {
            p += 1 + len
            if (p >= bytes.length) return None
            len = bytes(p) & 0xff
          }
          pos = p + 1
          nFrames += 1
          totalCs += pendingCs
          pendingCs = 0L
        case _ => return None
      }
    }
    // the trailer is required: a stream that just stops after the last
    // block is truncated by contract (None), even if the blocks so far
    // parsed — matching the decodeStats/Mp4 strictness
    if (!done || nFrames == 0) return None
    Some(Row(id, w, h, nFrames, totalCs * 10L, loops))
  }

  /** Encode a REAL animated GIF89a: `nFrames` 4×4 frames (pixel v =
    * (3·id + 11·f + i) mod 256 for frame f), each preceded by a GCE with
    * delay 5 + (id + f) mod 10 cs, NETSCAPE loop extension first. Every
    * parsed field is formula-predictable.
    */
  private[graft] def encodeSyntheticAnim(id: Long, nFrames: Int, loops: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(4); u16(4)
    out.write(0x80 | 7); out.write(0); out.write(0)
    var j = 0
    while (j < 256) {
      out.write(j); out.write((2 * j) % 256); out.write((3 * j) % 256)
      j += 1
    }
    // NETSCAPE 2.0 loop extension
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16(loops); out.write(0)
    var f = 0
    while (f < nFrames) {
      // GCE: delay in centiseconds
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); u16(5 + ((id + f) % 10).toInt); out.write(0); out.write(0)
      out.write(0x2c)
      u16(0); u16(0); u16(4); u16(4)
      out.write(0)
      val idx = Array.tabulate(16)(i => ((3 * id + 11L * f + i) % 256).toInt)
      out.write(8)
      out.write(lzwEncode(idx, 8))
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ========================== LZW ENCODER ==========================
  // Fixture-side compressor so the decoder's dictionary path is exercised
  // by REAL compressed streams (not the clear-code-per-symbol shortcut
  // that never builds an entry).

  /** GIF-flavor LZW compress of palette indices: emits Clear first,
    * grows 2^min+2 → 4096 then resets, packs codes LSB-first into
    * 255-byte sub-blocks, ends with EOI + block terminator.
    */
  private[graft] def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val block = new Array[Byte](255)
    var blockLen = 0
    var bitBuf = 0L
    var bitCnt = 0
    val clearCode = 1 << minCode
    val eoiCode = clearCode + 1
    var codeSize = minCode + 1
    def flushByte(): Unit = {
      while (bitCnt >= 8) {
        block(blockLen) = (bitBuf & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) { out.write(blockLen); out.write(block, 0, 255); blockLen = 0 }
        bitBuf >>>= 8; bitCnt -= 8
      }
    }
    def write(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      flushByte()
    }
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Int, Integer](8192)
    var next = eoiCode + 1
    write(clearCode)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val c = indices(i)
      if (prev < 0) prev = c
      else {
        val key = (prev << 8) | c
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          write(prev)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            // the decoder creates its entry for this code only when it
            // READS it, so its table runs one behind ours: grow the write
            // width one entry later than the decoder's `next == 2^size`
            // (an aligned check here desyncs every width boundary)
            next += 1
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            write(clearCode)
            dict = new java.util.HashMap[Int, Integer](8192)
            next = eoiCode + 1
            codeSize = minCode + 1
          }
          prev = c
        }
      }
      i += 1
    }
    if (prev >= 0) {
      write(prev)
      // phantom add: the decoder adds an entry when it reads this final
      // code and may grow its width before reading EOI — mirror that
      if (next < 4096) {
        next += 1
        if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
      }
    }
    write(eoiCode)
    if (bitCnt > 0) { bitBuf |= 0L; bitCnt = ((bitCnt + 7) / 8) * 8; flushByte() }
    if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen) }
    out.write(0) // block terminator
    out.toByteArray
  }

  /** Encode a REAL GIF89a: 256-entry global palette p[j] = (j, 2j mod 256,
    * 3j mod 256), one full-frame image, pixel index v(i) = (5·id + 7·i)
    * mod 256 over logical i = y·w + x. Optionally interlaced (the fixture
    * stores rows in pass order so the decoder's de-interlace is load-
    * bearing). An oracle predicts the decoded stats from the formula
    * alone — any LZW/palette/interlace bug breaks the match.
    */
  private[graft] def encodeSynthetic(
      id: Long, w: Int, h: Int, interlaced: Boolean = false): Array[Byte] = {
    val idx = new Array[Int](w * h)
    if (interlaced) {
      val rows = interlaceRows(h)
      var sr = 0
      while (sr < h) {
        val y = rows(sr)
        var x = 0
        while (x < w) {
          idx(sr * w + x) = ((5 * id + 7 * (y.toLong * w + x)) % 256).toInt
          x += 1
        }
        sr += 1
      }
    } else {
      var i = 0
      while (i < idx.length) { idx(i) = ((5 * id + 7 * i.toLong) % 256).toInt; i += 1 }
    }
    encodeIndexed(idx, w, h, interlaced)
  }

  /** Assemble a full GIF89a around an arbitrary stored-order index array
    * (256-entry formula palette). Lets the spec push index streams that
    * force dictionary growth through every code width and the 4096 reset.
    */
  private[graft] def encodeIndexed(
      idx: Array[Int], w: Int, h: Int, interlaced: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    out.write(0x80 | 7) // GCT present, 2^(7+1) = 256 entries
    out.write(0); out.write(0) // bg index, aspect
    var j = 0
    while (j < 256) {
      out.write(j); out.write((2 * j) % 256); out.write((3 * j) % 256)
      j += 1
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(if (interlaced) 0x40 else 0)
    out.write(8) // LZW min code size
    out.write(lzwEncode(idx, 8))
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
