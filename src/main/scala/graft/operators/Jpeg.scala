package graft.operators

import org.apache.spark.sql.Row

/** REAL baseline JPEG codec (pure JVM, no codec libraries). Everything
  * here is from the public ITU T.81 spec (baseline sequential DCT,
  * Huffman entropy coding, Annex K reference tables).
  *
  * Decoder scope (returns None outside it, like every other decoder in
  * [[Multimodal]]): baseline SOF0, 8-bit precision, 1 component
  * (grayscale) or 3 components (JFIF YCbCr) with sampling factors 1–2 —
  * covering 4:4:4, 4:2:2 and 4:2:0, the layouts that exist in practice;
  * chroma is upsampled nearest-neighbor. MCU components follow the
  * SCAN-header order (which may differ from SOF order). Restart markers
  * honored. Progressive (SOF2), arithmetic coding and 12-bit streams are
  * rejected — the common training-corpus subset decodes, everything else
  * fails loudly into the drop-corrupt-rows contract.
  *
  * 100 TB posture: identical to the other codecs — decode runs
  * per-partition over BINARY columns ([[Multimodal.decodeJpegFeatures]]),
  * state (Huffman tables, IDCT buffers) is per-blob, and every read is
  * bounds-checked so a hostile blob lands in None, never in a task-killing
  * exception or an unbounded allocation (dims are capped by
  * [[Multimodal.MaxStatPixels]]).
  */
private[graft] object Jpeg {

  // ---------------------------------------------------------------- bits

  /** MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing.
    * RST markers (FFD0-FFD7) are consumed and reset DC predictors via the
    * caller; any other marker mid-stream ends decoding.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false

    /** Refill to at least n bits; false on end/marker. */
    private def fill(n: Int): Boolean = {
      while (nbits < n) {
        if (pos >= bytes.length) return false
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 >= bytes.length) return false
          val b2 = bytes(pos + 1) & 0xff
          if (b2 == 0x00) { pos += 2 }                     // stuffed FF
          else { hitMarker = true; return false }          // real marker
          acc = (acc << 8) | 0xff; nbits += 8
        } else {
          pos += 1
          acc = (acc << 8) | b; nbits += 8
        }
      }
      true
    }

    def readBit(): Int = {
      if (!fill(1)) return -1
      nbits -= 1
      (acc >>> nbits) & 1
    }

    /** n-bit unsigned value, -1 on exhaustion (n ≤ 16). */
    def readBits(n: Int): Int = {
      if (n == 0) return 0
      if (!fill(n)) return -1
      nbits -= n
      (acc >>> nbits) & ((1 << n) - 1)
    }

    /** Align to byte boundary and consume an expected RST marker; false if
      * the next marker is not RSTn.
      */
    def consumeRst(): Boolean = {
      nbits = 0; acc = 0; hitMarker = false
      while (pos + 1 < bytes.length && (bytes(pos) & 0xff) != 0xff) pos += 1
      if (pos + 1 >= bytes.length) return false
      val m = bytes(pos + 1) & 0xff
      if (m >= 0xd0 && m <= 0xd7) { pos += 2; true } else false
    }
  }

  /** Canonical JPEG Huffman table: decode one symbol by walking code
    * lengths 1..16 (T.81 F.2.2.3). Built from DHT's (bits, vals).
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per length (T.81 F-15)
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }

    /** -1 on invalid/exhausted stream. */
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = br.readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l)) {
          val idx = valPtr(l) + code - minCode(l)
          if (idx < 0 || idx >= vals.length) return -1
          return vals(idx)
        }
        l += 1
      }
      -1
    }
  }

  /** EXTEND (T.81 F.2.2.1): map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Zigzag order: zigzag(k) = natural index of the k-th scanned coef. */
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---------------------------------------------------------------- DCT

  private val CosTable: Array[Double] = {
    val t = new Array[Double](8 * 8) // t(u*8 + x) = cos((2x+1)uπ/16)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) { t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0); x += 1 }
      u += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** In-place 2D IDCT of one dequantized 8×8 block (naive separable —
    * exactness over speed; the per-blob cost is dwarfed by Huffman I/O at
    * test scale and the whole decode is per-partition parallel anyway).
    */
  private def idct(block: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each y, 1D IDCT over u
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * block(y * 8 + u) * CosTable(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // cols
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          s += cv * tmp(v * 8 + x) * CosTable(v * 8 + yy)
          v += 1
        }
        block(yy * 8 + x) = s / 2.0
        yy += 1
      }
      x += 1
    }
  }

  /** Forward 2D DCT (encoder side), same normalization. */
  private def fdct(block: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // over rows of output (frequency u along x first)
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(v * 8 + x) * CosTable(u * 8 + x); x += 1 }
        tmp(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    var u2 = 0
    while (u2 < 8) {
      var v2 = 0
      while (v2 < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + u2) * CosTable(v2 * 8 + y); y += 1 }
        val cu = if (u2 == 0) InvSqrt2 else 1.0
        val cv = if (v2 == 0) InvSqrt2 else 1.0
        block(v2 * 8 + u2) = cu * cv * s / 4.0
        v2 += 1
      }
      u2 += 1
    }
  }

  // ------------------------------------------------------------- decode

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private final case class Component(id: Int, qTable: Int, var dcTable: Int = 0,
      var acTable: Int = 0, h: Int = 1, v: Int = 1)

  /** Decode a baseline JPEG into (width, height, nComponents, pixel
    * planes in component order, each w·h samples as Int 0..255). None on
    * anything outside the supported subset or any corruption.
    *
    * MATERIALIZES the full image, so it carries a total-sample cap
    * (w·h·nc ≤ 2^26 ≈ 268 MB of Int planes) on top of the streaming
    * guards — [[decodeStats]] has no such cap because it accumulates
    * per-MCU without ever holding the image.
    */
  private[graft] def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Array[Int]])] = {
    var planes: Array[Array[Int]] = null
    var dims: (Int, Int, Int) = null
    val ok = decodeStream(bytes) { (w, h, nc) =>
      if (w.toLong * h * nc > (1L << 26)) false
      else { planes = Array.fill(nc)(new Array[Int](w * h)); dims = (w, h, nc); true }
    } { (mx, my, hMax, vMax, samp, blocks) =>
      val (w, h, nc) = dims
      val x0 = mx * 8 * hMax; val y0 = my * 8 * vMax
      val yEnd = math.min(h, y0 + 8 * vMax)
      val xEnd = math.min(w, x0 + 8 * hMax)
      var py = y0
      while (py < yEnd) {
        var px = x0
        while (px < xEnd) {
          var c = 0
          while (c < nc) {
            planes(c)(py * w + px) =
              sampleMcu(blocks, samp, c, mx, my, hMax, vMax, px, py)
            c += 1
          }
          px += 1
        }
        py += 1
      }
    }
    if (ok) Some((dims._1, dims._2, dims._3, planes)) else None
  }

  /** Streaming decode core: `init(w, h, nc)` runs once after SOF0 (veto
    * by returning false); `visit(mx, my, hMax, vMax, samp, blocks)` runs per MCU —
    * (mx, my) is the MCU index (an MCU spans 8·hMax × 8·vMax pixels),
    * `samp(c)` packs component c's factors as (h<<4 | v), and
    * `blocks(c)(v2·h + h2)` is one 64-sample block (0..255,
    * level-shifted and clamped). Sample through [[sampleMcu]]. The
    * buffers are REUSED across MCUs, consume synchronously. Returns
    * true iff the full scan decoded.
    */
  private def decodeStream(bytes: Array[Byte])(init: (Int, Int, Int) => Boolean)(
      visit: (Int, Int, Int, Int, Array[Int], Array[Array[Array[Int]]]) => Unit): Boolean = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return false
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0

    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return false
      // T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
      // marker — skip them so padded-but-valid files aren't read as a
      // garbage segment length under marker 0xFF
      while (pos + 4 <= bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 4 > bytes.length) return false
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) return false // EOI before SOS
      val len = be16(bytes, pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return false
      val seg = pos + 4
      val segEnd = pos + 2 + len
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < segEnd) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0 || tq > 3 || p + 1 + 64 > segEnd) return false // 8-bit only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = bytes(p + 1 + k) & 0xff; k += 1 }
            qTables(tq) = t
            p += 65
          }
        case 0xc4 => // DHT
          var p = seg
          while (p < segEnd) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3 || p + 17 > segEnd) return false
            val bits = new Array[Int](16)
            var n = 0
            var k = 0
            while (k < 16) { bits(k) = bytes(p + 1 + k) & 0xff; n += bits(k); k += 1 }
            if (p + 17 + n > segEnd || n > 256) return false
            val vals = new Array[Int](n)
            k = 0
            while (k < n) { vals(k) = bytes(p + 17 + k) & 0xff; k += 1 }
            val tab = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = tab else acTables(th) = tab
            p += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          // fixed header (precision + dims + nc) is 6 bytes — check the
          // SEGMENT length before touching any of it (a truncated segment
          // must land in false, never an out-of-bounds read)
          if (seg + 6 > segEnd) return false
          if (bytes(seg) != 8) return false // precision
          h = be16(bytes, seg + 1); w = be16(bytes, seg + 3)
          val nc = bytes(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return false
          if (w.toLong * h > Multimodal.MaxStatPixels) return false
          if (seg + 6 + 3 * nc > segEnd) return false
          comps = Array.tabulate(nc) { i =>
            val cid = bytes(seg + 6 + 3 * i) & 0xff
            val samp = bytes(seg + 7 + 3 * i) & 0xff
            val sh = (samp >> 4) & 0xf
            val sv = samp & 0xf
            // factors 1 and 2 cover the layouts that exist in practice:
            // 4:4:4 (all 1×1), 4:2:0 (luma 2×2), 4:2:2 (luma 2×1)
            if (sh < 1 || sh > 2 || sv < 1 || sv > 2) return false
            val tq = bytes(seg + 8 + 3 * i) & 0xff
            if (tq > 3) return false // table ids index 4-slot arrays
            Component(cid, tq, h = sh, v = sv)
          }
          if (nc == 1 && (comps(0).h != 1 || comps(0).v != 1)) return false
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
            0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return false // extended/progressive/lossless/arithmetic
        case 0xdd => // DRI
          if (len != 4) return false
          restartInterval = be16(bytes, seg)
        case 0xda => // SOS — entropy data follows
          if (comps == null) return false
          if (seg >= segEnd) return false // ns byte must be inside the segment
          val ns = bytes(seg) & 0xff
          if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd) return false
          // the entropy stream interleaves components in SCAN-header
          // order (T.81 B.2.3), which may differ from SOF order — record
          // it so the MCU loop reads blocks where the stream put them
          val scanOrder = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = bytes(seg + 1 + 2 * i) & 0xff
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0 || scanOrder.take(i).contains(ci)) return false
            scanOrder(i) = ci
            comps(ci).dcTable = (bytes(seg + 2 + 2 * i) & 0xf0) >> 4
            comps(ci).acTable = bytes(seg + 2 + 2 * i) & 0x0f
            // nibbles reach 15 but the table arrays have 4 slots — a
            // hostile Td/Ta must be None, not AIOOBE
            if (comps(ci).dcTable > 3 || comps(ci).acTable > 3) return false
            i += 1
          }
          if (!init(w, h, comps.length)) return false
          return decodeScan(bytes, segEnd, w, h, comps, scanOrder, qTables,
            dcTables, acTables, restartInterval)(visit)
        case _ => () // APPn / COM / others: skip
      }
      pos = segEnd
    }
    false
  }

  private def decodeScan(
      bytes: Array[Byte], dataStart: Int, w: Int, h: Int,
      comps: Array[Component], scanOrder: Array[Int],
      qTables: Array[Array[Int]],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      restartInterval: Int)(
      visit: (Int, Int, Int, Int, Array[Int], Array[Array[Array[Int]]]) => Unit): Boolean = {
    val nc = comps.length
    var hMax = 1; var vMax = 1
    comps.foreach { c =>
      if (c.h > hMax) hMax = c.h
      if (c.v > vMax) vMax = c.v
    }
    val mcuW = (w + 8 * hMax - 1) / (8 * hMax)
    val mcuH = (h + 8 * vMax - 1) / (8 * vMax)
    val nMcu = mcuW.toLong * mcuH
    var blocksPerMcu = 0
    comps.foreach(c => blocksPerMcu += c.h * c.v)
    // cheap plausibility bound BEFORE any per-MCU work: every block costs
    // ≥ 2 entropy bits (1-bit DC symbol + 1-bit EOB is the floor any DHT
    // can declare), so a tiny blob whose SOF claims millions of MCUs is
    // rejected here — work and (in decode()) allocation stay proportional
    // to the blob, never to hostile header claims
    if (nMcu * blocksPerMcu * 2L > (bytes.length - dataStart).toLong * 8L + 64L)
      return false
    val pred = new Array[Int](nc)
    val br = new BitReader(bytes, dataStart)
    val coef = new Array[Double](64)
    // blocks(c)(v2·h + h2): each component's MCU blocks in raster order
    val blocks = comps.map(c => Array.fill(c.h * c.v)(new Array[Int](64)))
    val samp = comps.map(c => (c.h << 4) | c.v)
    var mcu = 0L
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.consumeRst()) return false
        java.util.Arrays.fill(pred, 0)
      }
      val bx = (mcu % mcuW).toInt
      val by = (mcu / mcuW).toInt
      var sc = 0
      while (sc < nc) {
        val c = scanOrder(sc) // stream order, not SOF order
        val comp = comps(c)
        val q = qTables(comp.qTable)
        val dcT = dcTables(comp.dcTable)
        val acT = acTables(comp.acTable)
        if (q == null || dcT == null || acT == null) return false
        var blk = 0
        while (blk < comp.h * comp.v) {
          java.util.Arrays.fill(coef, 0.0)
          // DC
          val s = dcT.decode(br)
          if (s < 0 || s > 11) return false
          val diffBits = br.readBits(s)
          if (diffBits < 0) return false
          pred(c) += extend(diffBits, s)
          coef(0) = pred(c).toDouble * q(0)
          // AC
          var k = 1
          while (k < 64) {
            val rs = acT.decode(br)
            if (rs < 0) return false
            val r = (rs >> 4) & 0xf
            val sz = rs & 0xf
            if (sz == 0) {
              if (r == 15) k += 16           // ZRL
              else k = 64                    // EOB
            } else {
              k += r
              if (k > 63) return false
              val vb = br.readBits(sz)
              if (vb < 0) return false
              coef(Zigzag(k)) = extend(vb, sz).toDouble * q(Zigzag(k))
              k += 1
            }
          }
          idct(coef)
          var j = 0
          while (j < 64) {
            val v = math.round(coef(j) + 128.0).toInt
            blocks(c)(blk)(j) = if (v < 0) 0 else if (v > 255) 255 else v
            j += 1
          }
          blk += 1
        }
        sc += 1
      }
      visit(bx, by, hMax, vMax, samp, blocks)
      mcu += 1
    }
    true
  }

  /** Sample component `c`'s value at image pixel (px, py) from an MCU's
    * decoded blocks: nearest-neighbor chroma upsampling (the box inverse
    * of the encoder's 2×2 average). (mx, my) is the MCU index, `samp`
    * the (h<<4|v) factors, hMax/vMax the frame maxima.
    */
  private def sampleMcu(
      blocks: Array[Array[Array[Int]]], samp: Array[Int], c: Int,
      mx: Int, my: Int, hMax: Int, vMax: Int, px: Int, py: Int): Int = {
    val sh = (samp(c) >> 4) & 0xf
    val sv = samp(c) & 0xf
    val lx = px - mx * 8 * hMax
    val ly = py - my * 8 * vMax
    val csx = lx * sh / hMax
    val csy = ly * sv / vMax
    blocks(c)((csy >> 3) * sh + (csx >> 3))((csy & 7) * 8 + (csx & 7))
  }

  /** Decode + per-channel stats in the [[Multimodal.bmpStatsSchema]]
    * contract: grayscale maps to r=g=b; 3-component streams convert
    * YCbCr→RGB with the JFIF formula. weighted_r = Σ i·R(i) over logical
    * pixel index, same as the BMP/PNG paths. Streams per MCU — the image
    * is never materialized, so memory is O(1) regardless of dims.
    */
  private[graft] def decodeStats(id: Long, bytes: Array[Byte]): Option[Row] = {
    var w = 0; var h = 0; var nc = 0
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wR = 0L
    val ok = decodeStream(bytes) { (iw, ih, inc) =>
      w = iw; h = ih; nc = inc; true
    } { (mx, my, hMax, vMax, samp, blocks) =>
      val x0 = mx * 8 * hMax; val y0 = my * 8 * vMax
      val yEnd = math.min(h, y0 + 8 * vMax)
      val xEnd = math.min(w, x0 + 8 * hMax)
      var py = y0
      while (py < yEnd) {
        var px = x0
        while (px < xEnd) {
          var r = 0; var g = 0; var b = 0
          if (nc == 1) {
            r = sampleMcu(blocks, samp, 0, mx, my, hMax, vMax, px, py)
            g = r; b = r
          } else {
            val y = sampleMcu(blocks, samp, 0, mx, my, hMax, vMax, px, py).toDouble
            val cb = sampleMcu(blocks, samp, 1, mx, my, hMax, vMax, px, py).toDouble - 128.0
            val cr = sampleMcu(blocks, samp, 2, mx, my, hMax, vMax, px, py).toDouble - 128.0
            r = clamp8(math.round(y + 1.402 * cr).toInt)
            g = clamp8(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
            b = clamp8(math.round(y + 1.772 * cb).toInt)
          }
          sumR += r; sumG += g; sumB += b
          wR += (py.toLong * w + px) * r
          px += 1
        }
        py += 1
      }
    }
    if (!ok) None
    else {
      val n = w.toLong * h
      Some(Row(id, w, h, n, sumR.toDouble / n, sumG.toDouble / n,
        sumB.toDouble / n, wR))
    }
  }

  /** Sample a gw×gh nearest-neighbor RGB grid from a baseline JPEG,
    * streaming per MCU — only the grid samples are kept (packed
    * r<<16|g<<8|b), so memory is O(gw·gh) whatever the image size and
    * the [[decode]] total-sample cap does not apply. Grid row y samples
    * source row ⌊y·h/gh⌋, column x samples ⌊x·w/gw⌋ — the SAME
    * nearest-neighbor rule as [[Multimodal.bmpDHash]], so cross-format
    * fingerprints agree. Uses the identical JFIF YCbCr→RGB arithmetic as
    * [[decodeStats]] (grayscale replicates). None on unsupported or
    * corrupt input.
    */
  private[graft] def gridRgb(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Int]] = {
    var w = 0; var h = 0; var nc = 0
    var sxs: Array[Int] = null; var sys: Array[Int] = null
    val out = new Array[Int](gw * gh)
    val ok = decodeStream(bytes) { (iw, ih, inc) =>
      w = iw; h = ih; nc = inc
      sxs = Array.tabulate(gw)(gx => (gx.toLong * w / gw).toInt)
      sys = Array.tabulate(gh)(gy => (gy.toLong * h / gh).toInt)
      true
    } { (mx, my, hMax, vMax, samp, blocks) =>
      val x0 = mx * 8 * hMax; val y0 = my * 8 * vMax
      val yEnd = math.min(h, y0 + 8 * vMax)
      val xEnd = math.min(w, x0 + 8 * hMax)
      var gy = 0
      while (gy < gh) {
        val py = sys(gy)
        if (py >= y0 && py < yEnd) {
          var gx = 0
          while (gx < gw) {
            val px = sxs(gx)
            if (px >= x0 && px < xEnd) {
              var r = 0; var g = 0; var b = 0
              if (nc == 1) {
                r = sampleMcu(blocks, samp, 0, mx, my, hMax, vMax, px, py)
                g = r; b = r
              } else {
                val y = sampleMcu(blocks, samp, 0, mx, my, hMax, vMax, px, py).toDouble
                val cb = sampleMcu(blocks, samp, 1, mx, my, hMax, vMax, px, py).toDouble - 128.0
                val cr = sampleMcu(blocks, samp, 2, mx, my, hMax, vMax, px, py).toDouble - 128.0
                r = clamp8(math.round(y + 1.402 * cr).toInt)
                g = clamp8(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
                b = clamp8(math.round(y + 1.772 * cb).toInt)
              }
              out(gy * gw + gx) = (r << 16) | (g << 8) | b
            }
            gx += 1
          }
        }
        gy += 1
      }
    }
    if (ok) Some(out) else None
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ------------------------------------------------------------- encode

  /** Annex K reference Huffman tables (ITU T.81, Tables K.3/K.5) —
    * luminance DC and AC. The encoder declares them in DHT, so the
    * decoder exercises its general table machinery, not a special case.
    */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** (code, length) per symbol from canonical (bits, vals). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    m.toMap
  }
  private lazy val DcCodes = buildCodes(DcBits, DcVals)
  private lazy val AcCodes = buildCodes(AcBits, AcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      n += len
      while (n >= 8) {
        val b = (acc >>> (n - 8)) & 0xff
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { write(0x7f, 8 - n) } // pad with 1s? no: pad bits are 1s per convention
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one 8-bit grayscale image (dims need not be 8-multiples; edge
    * MCUs replicate the last row/column, the standard approach) as a real
    * baseline JPEG with all-ones quantization — numerically near-lossless,
    * and EXACTLY lossless for blocks of constant value (DC-only, integer
    * round-trip), which is what the oracle fixture uses.
    */
  private[graft] def encodeGray(pix: Array[Int], w: Int, h: Int): Array[Byte] =
    encode(Array(pix), w, h)

  /** Encode 8-bit RGB as a 3-component YCbCr 4:4:4 baseline JPEG (JFIF
    * conversion, rounded to integer planes before the DCT) — exercises
    * the decoder's interleaved-MCU + color-conversion path.
    */
  private[graft] def encodeRgb(
      r: Array[Int], g: Array[Int], b: Array[Int], w: Int, h: Int): Array[Byte] = {
    val n = w * h
    val yP = new Array[Int](n); val cbP = new Array[Int](n); val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      yP(i) = clamp8(math.round(0.299 * r(i) + 0.587 * g(i) + 0.114 * b(i)).toInt)
      cbP(i) = clamp8(math.round(-0.168736 * r(i) - 0.331264 * g(i) + 0.5 * b(i) + 128.0).toInt)
      crP(i) = clamp8(math.round(0.5 * r(i) - 0.418688 * g(i) - 0.081312 * b(i) + 128.0).toInt)
      i += 1
    }
    encode(Array(yP, cbP, crP), w, h)
  }

  /** SOI + DQT (all-ones, table 0) + SOF0 + DHT (Annex K pair) + SOS for
    * components 1..n with the given (h<<4 | v) sampling bytes. ONE copy —
    * the fixture encoders must never drift apart in header layout.
    */
  private def writeJpegHeaders(
      out: java.io.ByteArrayOutputStream, w: Int, h: Int,
      sampling: Array[Int]): Unit = {
    val nc = sampling.length
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00)
    var i = 0
    while (i < 64) { u8(1); i += 1 }
    marker(0xc0); u16(8 + 3 * nc); u8(8); u16(h); u16(w); u8(nc)
    var c = 0
    while (c < nc) { u8(c + 1); u8(sampling(c)); u8(0); c += 1 }
    marker(0xc4); u16(2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length))
    u8(0x00); DcBits.foreach(u8); DcVals.foreach(u8)
    u8(0x10); AcBits.foreach(u8); AcVals.foreach(u8)
    marker(0xda); u16(6 + 2 * nc); u8(nc)
    c = 0
    while (c < nc) { u8(c + 1); u8(0x00); c += 1 }
    u8(0); u8(63); u8(0)
  }

  /** Shared encoder: 1 plane = grayscale, 3 planes = YCbCr 4:4:4. All
    * components use quant table 0 (all ones) and the Annex K luminance
    * Huffman pair; MCUs interleave one block per component with
    * independent DC predictors (T.81 interleaved-scan order).
    */
  private def encode(planes: Array[Array[Int]], w: Int, h: Int): Array[Byte] = {
    val nc = planes.length
    require(nc == 1 || nc == 3, "1 or 3 planes")
    val out = new java.io.ByteArrayOutputStream()
    writeJpegHeaders(out, w, h, Array.fill(nc)(0x11))
    var c = 0
    // entropy-coded MCUs (interleaved, per-component DC predictors)
    val bw = new BitWriter(out)
    val mcuW = (w + 7) / 8
    val mcuH = (h + 7) / 8
    val block = new Array[Double](64)
    val pred = new Array[Int](nc)
    var by = 0
    while (by < mcuH) {
      var bx = 0
      while (bx < mcuW) {
        c = 0
        while (c < nc) {
          val pix = planes(c)
          var y = 0
          while (y < 8) {
            val py = math.min(h - 1, by * 8 + y)
            var x = 0
            while (x < 8) {
              val px = math.min(w - 1, bx * 8 + x)
              block(y * 8 + x) = pix(py * w + px).toDouble - 128.0
              x += 1
            }
            y += 1
          }
          writeBlock(bw, block, pred, c)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** fdct → quantize (q=1) → DC diff + AC run-length Huffman write of
    * one 8×8 block. Shared by the 4:4:4 and 4:2:0 encoders.
    */
  private def writeBlock(
      bw: BitWriter, block: Array[Double], pred: Array[Int], c: Int): Unit = {
    fdct(block)
    val qc = new Array[Int](64)
    var k = 0
    while (k < 64) { qc(k) = math.round(block(k)).toInt; k += 1 }
    // clamp AC to the Annex K table domain (magnitude category ≤ 10,
    // |v| ≤ 1023): with q=1 a basis-aligned ±128 checkerboard can reach
    // |1024| = category 11, which the AC code table does not cover. DC
    // needs no clamp — DC ∈ [-1024, 1016] so |diff| ≤ 2040 stays inside
    // the DC table's category-11 ceiling.
    k = 1
    while (k < 64) {
      if (qc(k) > 1023) qc(k) = 1023 else if (qc(k) < -1023) qc(k) = -1023
      k += 1
    }
    val diff = qc(0) - pred(c)
    pred(c) = qc(0)
    val s = category(diff)
    val (dcCode, dcLen) = DcCodes(s)
    bw.write(dcCode, dcLen)
    if (s > 0) {
      val bitsVal = if (diff < 0) diff + (1 << s) - 1 else diff
      bw.write(bitsVal, s)
    }
    var run = 0
    k = 1
    while (k < 64) {
      val v = qc(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { val (cd, l) = AcCodes(0xf0); bw.write(cd, l); run -= 16 }
        val sz = category(v)
        val (cd, l) = AcCodes((run << 4) | sz)
        bw.write(cd, l)
        val bitsVal = if (v < 0) v + (1 << sz) - 1 else v
        bw.write(bitsVal, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (cd, l) = AcCodes(0x00); bw.write(cd, l) } // EOB
  }

  /** Encode REAL 4:2:0 YCbCr: luma 2×2, chroma 1×1 with 2×2 box
    * subsampling — the layout nearly every camera/web JPEG uses. Each
    * MCU carries 4 Y blocks (raster order) + Cb + Cr, per-component DC
    * predictors, replicate-padded edges.
    */
  private[graft] def encodeRgb420(
      r: Array[Int], g: Array[Int], b: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(r.length == w * h && g.length == w * h && b.length == w * h)
    val yP = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      yP(i) = clamp8(math.round(
        0.299 * r(i) + 0.587 * g(i) + 0.114 * b(i)).toInt)
      i += 1
    }
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        // 2×2 box average over full-res chroma (edge-clamped)
        var sumCb = 0.0; var sumCr = 0.0
        var k = 0
        while (k < 4) {
          val px = math.min(w - 1, 2 * cx + (k & 1))
          val py = math.min(h - 1, 2 * cy + (k >> 1))
          val j = py * w + px
          sumCb += -0.168736 * r(j) - 0.331264 * g(j) + 0.5 * b(j) + 128.0
          sumCr += 0.5 * r(j) - 0.418688 * g(j) - 0.081312 * b(j) + 128.0
          k += 1
        }
        cbP(cy * cw + cx) = clamp8(math.round(sumCb / 4).toInt)
        crP(cy * cw + cx) = clamp8(math.round(sumCr / 4).toInt)
        cx += 1
      }
      cy += 1
    }
    encodeYcc420(yP, cbP, crP, w, h)
  }

  /** 4:2:0 bitstream from ALREADY-SUBSAMPLED planes (luma w×h, chroma
    * ⌈w/2⌉×⌈h/2⌉) — the fixture entry that keeps DC-only exactness
    * available (no RGB→YCbCr rounding in the way).
    */
  private[graft] def encodeYcc420(
      yP: Array[Int], cbP: Array[Int], crP: Array[Int],
      w: Int, h: Int): Array[Byte] = {
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    require(yP.length == w * h && cbP.length == cw * ch && crP.length == cw * ch)
    val out = new java.io.ByteArrayOutputStream()
    writeJpegHeaders(out, w, h, Array(0x22, 0x11, 0x11))
    val bw = new BitWriter(out)
    val mcuW = (w + 15) / 16
    val mcuH = (h + 15) / 16
    val block = new Array[Double](64)
    val pred = new Array[Int](3)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        // 4 luma blocks in raster order
        var v2 = 0
        while (v2 < 2) {
          var h2 = 0
          while (h2 < 2) {
            var y = 0
            while (y < 8) {
              val py = math.min(h - 1, my * 16 + v2 * 8 + y)
              var x = 0
              while (x < 8) {
                val px = math.min(w - 1, mx * 16 + h2 * 8 + x)
                block(y * 8 + x) = yP(py * w + px).toDouble - 128.0
                x += 1
              }
              y += 1
            }
            writeBlock(bw, block, pred, 0)
            h2 += 1
          }
          v2 += 1
        }
        // one Cb + one Cr block at half resolution
        var cc = 0
        while (cc < 2) {
          val plane = if (cc == 0) cbP else crP
          var y = 0
          while (y < 8) {
            val py = math.min(ch - 1, my * 8 + y)
            var x = 0
            while (x < 8) {
              val px = math.min(cw - 1, mx * 8 + x)
              block(y * 8 + x) = plane(py * cw + px).toDouble - 128.0
              x += 1
            }
            y += 1
          }
          writeBlock(bw, block, pred, cc + 1)
          cc += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // -------------------------------------------- progressive (SOF2) DC scan

  /** Progressive (SOF2) JPEG: parse the headers and decode the FIRST
    * scan — the spectral-selection DC scan (Ss = Se = 0, Ah = 0, any
    * successive-approximation Al ≤ 13) — into the DC-only preview image
    * every progressive decoder shows first: each 8×8 block constant at
    * round(((dc ≪ Al) · q₀₀) / 8) + 128. Supported subset: 1- or
    * 3-component with ALL sampling factors 1 (4:4:4); subsampled
    * progressive chroma is rejected (None), as is any non-DC first scan.
    * Restart intervals honored. Output row matches
    * [[Multimodal.bmpStatsSchema]]: per-image channel means + weighted_r
    * over the preview pixels — the real "progressive preview" decode, so
    * a training pipeline can stat the large share of real-world JPEGs
    * that baseline-only decoders drop.
    */
  private[graft] def decodeProgressiveDcStats(id: Long, bytes: Array[Byte]): Option[Row] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      while (pos + 4 <= bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 4 > bytes.length) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      val len = be16(bytes, pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return None
      val seg = pos + 4
      val segEnd = pos + 2 + len
      marker match {
        case 0xdb =>
          var p = seg
          while (p < segEnd) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0 || tq > 3 || p + 1 + 64 > segEnd) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = bytes(p + 1 + k) & 0xff; k += 1 }
            qTables(tq) = t
            p += 65
          }
        case 0xc4 =>
          var p = seg
          while (p < segEnd) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3 || p + 17 > segEnd) return None
            val bits = new Array[Int](16)
            var n = 0
            var k = 0
            while (k < 16) { bits(k) = bytes(p + 1 + k) & 0xff; n += bits(k); k += 1 }
            if (p + 17 + n > segEnd || n > 256) return None
            val vals = new Array[Int](n)
            k = 0
            while (k < n) { vals(k) = bytes(p + 17 + k) & 0xff; k += 1 }
            if (tc == 0) dcTables(th) = new HuffTable(bits, vals)
            // AC tables belong to later scans; parse-skip them
            p += 17 + n
          }
        case 0xc2 => // SOF2 progressive (same payload layout as SOF0)
          if (seg + 6 > segEnd) return None
          if (bytes(seg) != 8) return None
          h = be16(bytes, seg + 1); w = be16(bytes, seg + 3)
          val nc = bytes(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          if (w.toLong * h > Multimodal.MaxStatPixels) return None
          if (seg + 6 + 3 * nc > segEnd) return None
          comps = Array.tabulate(nc) { i =>
            val cid = bytes(seg + 6 + 3 * i) & 0xff
            val samp = bytes(seg + 7 + 3 * i) & 0xff
            // 4:4:4-only subset for the progressive path
            if (samp != 0x11) return None
            val tq = bytes(seg + 8 + 3 * i) & 0xff
            if (tq > 3) return None // table ids index 4-slot arrays
            Component(cid, tq)
          }
        case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
            0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // baseline et al. belong to decodeStream
        case 0xdd =>
          if (len != 4) return None
          restartInterval = be16(bytes, seg)
        case 0xda =>
          if (comps == null) return None
          if (seg >= segEnd) return None
          val ns = bytes(seg) & 0xff
          // the DC first scan is interleaved over ALL components
          if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd) return None
          val scanOrder = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = bytes(seg + 1 + 2 * i) & 0xff
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0 || scanOrder.take(i).contains(ci)) return None
            scanOrder(i) = ci
            comps(ci).dcTable = (bytes(seg + 2 + 2 * i) & 0xf0) >> 4
            if (comps(ci).dcTable > 3) return None // 4-slot table array
            i += 1
          }
          val ss = bytes(seg + 1 + 2 * ns) & 0xff
          val se = bytes(seg + 2 + 2 * ns) & 0xff
          val ahal = bytes(seg + 3 + 2 * ns) & 0xff
          val ah = (ahal & 0xf0) >> 4
          val al = ahal & 0x0f
          // first scan only: spectral selection DC, no refinement
          if (ss != 0 || se != 0 || ah != 0 || al > 13) return None
          return decodeDcScan(id, bytes, segEnd, w, h, comps, scanOrder,
            qTables, dcTables, restartInterval, al)
        case _ => () // APPn / COM
      }
      pos = segEnd
    }
    None
  }

  /** The DC-scan MCU walk: with 4:4:4 sampling an MCU is one block per
    * component; blocks are raster-ordered. DC predictors live in the
    * point-transformed (≫ Al) domain per T.81 G.1.2.1; dequantization
    * and the ≪ Al happen at reconstruction.
    */
  private def decodeDcScan(
      id: Long, bytes: Array[Byte], dataStart: Int, w: Int, h: Int,
      comps: Array[Component], scanOrder: Array[Int],
      qTables: Array[Array[Int]], dcTables: Array[HuffTable],
      restartInterval: Int, al: Int): Option[Row] = {
    val nc = comps.length
    var c = 0
    while (c < nc) {
      if (qTables(comps(c).qTable) == null) return None
      if (dcTables(comps(c).dcTable) == null) return None
      c += 1
    }
    val mcuW = (w + 7) / 8
    val mcuH = (h + 7) / 8
    val nMcu = mcuW.toLong * mcuH
    // every MCU costs ≥ nc entropy bits (1-bit DC symbols) — reject
    // hostile header claims before any per-MCU work
    if (nMcu * nc > (bytes.length - dataStart).toLong * 8L + 64L) return None
    val pred = new Array[Int](nc)
    val dcVal = new Array[Int](nc)
    val br = new BitReader(bytes, dataStart)
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wR = 0L
    var mcu = 0L
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.consumeRst()) return None
          java.util.Arrays.fill(pred, 0)
        }
        var s = 0
        while (s < nc) {
          val ci = scanOrder(s)
          val t = dcTables(comps(ci).dcTable).decode(br)
          if (t < 0 || t > 15) return None
          val bits = br.readBits(t)
          if (bits < 0) return None
          pred(ci) += extend(bits, t)
          dcVal(ci) = (pred(ci) << al) * qTables(comps(ci).qTable)(0)
          s += 1
        }
        // block-constant preview pixels over the REAL image area
        val x0 = mx * 8; val y0 = my * 8
        val xEnd = math.min(w, x0 + 8); val yEnd = math.min(h, y0 + 8)
        var r = 0; var g = 0; var b = 0
        if (nc == 1) {
          r = clamp8(math.round(dcVal(0) / 8.0).toInt + 128)
          g = r; b = r
        } else {
          val y = math.round(dcVal(0) / 8.0).toDouble + 128.0
          val cb = math.round(dcVal(1) / 8.0).toDouble
          val cr = math.round(dcVal(2) / 8.0).toDouble
          r = clamp8(math.round(y + 1.402 * cr).toInt)
          g = clamp8(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
          b = clamp8(math.round(y + 1.772 * cb).toInt)
        }
        val rows = yEnd - y0
        val cols = xEnd - x0
        val px = rows.toLong * cols
        sumR += r * px; sumG += g * px; sumB += b * px
        // Σ i·r over the block's pixels: r · Σ (py·w + pxx)
        var py = y0
        while (py < yEnd) {
          // Σ over one row: py·w·cols + Σ x0..xEnd-1
          wR += r.toLong * (py.toLong * w * cols +
            (x0 + xEnd - 1).toLong * cols / 2)
          py += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    val n = w.toLong * h
    Some(Row(id, w, h, n, sumR.toDouble / n, sumG.toDouble / n,
      sumB.toDouble / n, wR))
  }

  /** Encode a REAL progressive (SOF2) grayscale JPEG carrying its first
    * scan only — the spectral-selection DC scan with successive-
    * approximation Al (the truncated-progressive "preview" framing): SOI,
    * all-ones DQT, SOF2, the Annex K DC table, SOS(Ss=0, Se=0, Ah=0,
    * Al=al), diff-coded point-transformed DC per raster block, EOI. The
    * block DC is Σ(x−128)/8 rounded — for constant blocks that is
    * 8·(v−128), even, so any Al ≤ 3 round-trips v exactly and an oracle
    * predicts the preview stats by formula.
    */
  private[graft] def encodeGrayProgressiveDc(
      pix: Array[Int], w: Int, h: Int, al: Int): Array[Byte] =
    encodeProgressiveDc(Array(pix), w, h, al)

  /** 3-component 4:4:4 variant: YCbCr planes, interleaved DC first scan
    * with per-component predictors — exercises the progressive decoder's
    * color path.
    */
  private[graft] def encodeYcc444ProgressiveDc(
      yP: Array[Int], cbP: Array[Int], crP: Array[Int],
      w: Int, h: Int, al: Int): Array[Byte] =
    encodeProgressiveDc(Array(yP, cbP, crP), w, h, al)

  /** Shared first-scan-only progressive writer (1 or 3 components, all
    * sampling 1×1, one shared all-ones DQT + Annex K DC table).
    */
  private def encodeProgressiveDc(
      planes: Array[Array[Int]], w: Int, h: Int, al: Int): Array[Byte] = {
    val nc = planes.length
    require(w > 0 && h > 0 && planes.forall(_.length == w * h) &&
      al >= 0 && al <= 13 && (nc == 1 || nc == 3))
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xdb); u16(2 + 1 + 64); u8(0x00)
    var i = 0
    while (i < 64) { u8(1); i += 1 }
    marker(0xc2); u16(8 + 3 * nc); u8(8); u16(h); u16(w); u8(nc)
    var c = 0
    while (c < nc) { u8(c + 1); u8(0x11); u8(0); c += 1 }
    marker(0xc4); u16(2 + 1 + 16 + DcVals.length)
    u8(0x00); DcBits.foreach(u8); DcVals.foreach(u8)
    marker(0xda); u16(6 + 2 * nc); u8(nc)
    c = 0
    while (c < nc) { u8(c + 1); u8(0x00); c += 1 }
    u8(0); u8(0); u8(al) // Ss=0 Se=0 Ah=0 Al
    val bw = new BitWriter(out)
    val mcuW = (w + 7) / 8
    val mcuH = (h + 7) / 8
    val pred = new Array[Int](nc)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        c = 0
        while (c < nc) {
          // true DCT DC = Σ(x−128)/8 over the block (edges replicate)
          var sum = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val py = math.min(h - 1, my * 8 + y)
              val px = math.min(w - 1, mx * 8 + x)
              sum += planes(c)(py * w + px) - 128
              x += 1
            }
            y += 1
          }
          val dc = math.round(sum / 8.0).toInt >> al // point transform
          val diff = dc - pred(c)
          pred(c) = dc
          val s = category(diff)
          val (code, clen) = DcCodes(s)
          bw.write(code, clen)
          if (s > 0) {
            val bitsVal = if (diff < 0) diff + (1 << s) - 1 else diff
            bw.write(bitsVal, s)
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }
}
