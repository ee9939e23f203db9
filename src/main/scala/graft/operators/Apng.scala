package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** APNG (Animated PNG) — the INTER-FRAME video decode path.
  *
  * Every earlier video-shaped format in this engine is intra-frame only:
  * MJPEG and animated GIF decode each frame from its own bytes. APNG is
  * the first format where a frame is NOT a standalone image — frames
  * k ≥ 1 arrive as fdAT patches (a sub-rectangle of the canvas) and the
  * displayed frame exists only after compositing the patch onto the
  * previous canvas state under the fcTL dispose/blend rules. That
  * temporal dependency is exactly the inter-frame seam the multimodal
  * mandate calls for (SURVEY.md §2.11; the reference itself has no
  * media path — `Program.cs` moves scalar telemetry only), delivered on
  * a format whose codec layer (zlib DEFLATE + PNG scanline filters) the
  * JDK ships, so the decode is REAL end to end, not a stub.
  *
  * Spec surface implemented (public APNG spec, now part of the PNG
  * spec): `acTL` (frame count), `fcTL` (frame rectangle, delay,
  * dispose_op, blend_op), `fdAT` (sequenced frame data), the shared
  * strictly-consecutive sequence counter across fcTL+fdAT, the
  * IDAT-as-first-frame vs hidden-default-image distinction,
  * dispose NONE/BACKGROUND/PREVIOUS (first-frame PREVIOUS downgrades
  * to BACKGROUND), and blend SOURCE/OVER (non-premultiplied alpha).
  *
  * Scale shape: one blob in, F composited frames out — per-partition
  * imperative decode behind `mapPartitions` (the one place RDD-style
  * logic is warranted), narrow, no shuffle; downstream ops (per-frame
  * dHash, temporal signatures, banded near-dup) stay declarative.
  * Corrupt/hostile rows drop via the same Try contract as the other
  * decoders; allocation guards live in [[Multimodal.inflateUnfilter]].
  */
object Apng {

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private val PngSig: Array[Int] = Array(137, 80, 78, 71, 13, 10, 26, 10)

  /** One animation frame's control data (fcTL) + its raw DEFLATE stream. */
  private final case class FrameRec(
      w: Int, h: Int, x: Int, y: Int,
      dispose: Int, blend: Int,
      data: java.io.ByteArrayOutputStream)

  /** Decode an APNG into its composited per-frame RGBA canvases.
    *
    * @return (canvasW, canvasH, frames) where each frame is a 4·W·H RGBA
    *         byte array — the canvas AS DISPLAYED after rendering that
    *         frame (disposal applies between frames, not to the output).
    *         None on: non-APNG (no acTL before IDAT), bad signature /
    *         IHDR (only 8-bit color types 0/2/6, non-interlaced), frame
    *         count ≠ acTL, a sequence number out of order, a frame
    *         rectangle outside the canvas, an IDAT-carried first frame
    *         not covering the full canvas, fdAT before any fcTL, or a
    *         corrupt DEFLATE/filter stream in any frame.
    */
  private[graft] def decodeApngCanvases(
      bytes: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xff) != PngSig(i)) return None; i += 1 }
    var pos = 8
    var w = -1; var h = -1; var ctype = -1
    var declaredFrames = -1 // acTL num_frames
    var sawActlBeforeIdat = false
    var sawIdat = false
    var expectSeq = 0 // shared fcTL/fdAT counter, strictly consecutive
    val frames = scala.collection.mutable.ArrayBuffer.empty[FrameRec]
    var idatIsFrame0 = false // first fcTL appeared before first IDAT
    var sawEnd = false
    while (!sawEnd) {
      if (pos.toLong + 8 > bytes.length) return None
      val len = be32(bytes, pos)
      if (len < 0 || pos.toLong + 12 + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val off = pos + 8
      typ match {
        case "IHDR" =>
          if (len != 13 || pos != 8) return None
          w = be32(bytes, off); h = be32(bytes, off + 4)
          val bitDepth = bytes(off + 8) & 0xff
          val colorType = bytes(off + 9) & 0xff
          val compression = bytes(off + 10) & 0xff
          val filterMethod = bytes(off + 11) & 0xff
          val interlace = bytes(off + 12) & 0xff
          if (w <= 0 || h <= 0 || bitDepth != 8 ||
            (colorType != 0 && colorType != 2 && colorType != 6) ||
            compression != 0 || filterMethod != 0 || interlace != 0) return None
          if (w.toLong * h > (1L << 26)) return None // 64 M px canvas cap
          ctype = colorType
        case "acTL" =>
          if (len != 8 || sawIdat || declaredFrames >= 0) return None
          declaredFrames = be32(bytes, off)
          if (declaredFrames <= 0) return None
          sawActlBeforeIdat = true
        case "fcTL" =>
          if (len != 26) return None
          if (be32(bytes, off) != expectSeq) return None
          expectSeq += 1
          val fw = be32(bytes, off + 4); val fh = be32(bytes, off + 8)
          val fx = be32(bytes, off + 12); val fy = be32(bytes, off + 16)
          val dispose = bytes(off + 24) & 0xff
          val blend = bytes(off + 25) & 0xff
          if (fw <= 0 || fh <= 0 || fx < 0 || fy < 0 ||
            fx.toLong + fw > w || fy.toLong + fh > h ||
            dispose > 2 || blend > 1) return None
          frames += FrameRec(fw, fh, fx, fy, dispose, blend,
            new java.io.ByteArrayOutputStream())
          if (!sawIdat) idatIsFrame0 = true
        case "IDAT" =>
          sawIdat = true
          if (idatIsFrame0) {
            // the IDAT stream carries animation frame 0; its fcTL must
            // cover the full canvas at (0,0) (APNG spec constraint), and
            // all IDAT chunks must precede any further fcTL
            if (frames.size != 1) return None
            val f0 = frames.head
            if (f0.w != w || f0.h != h || f0.x != 0 || f0.y != 0) return None
            f0.data.write(bytes, off, len)
          }
          // else: hidden default image, not part of the animation — skip
        case "fdAT" =>
          if (len < 4) return None
          if (be32(bytes, off) != expectSeq) return None
          expectSeq += 1
          if (frames.isEmpty) return None
          val cur = frames.last
          // fdAT may not target the IDAT-carried frame
          if (idatIsFrame0 && frames.size == 1) return None
          cur.data.write(bytes, off + 4, len - 4)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (ctype < 0 || !sawActlBeforeIdat) return None
    if (frames.size != declaredFrames) return None
    if (frames.exists(_.data.size() == 0)) return None

    val bpp = if (ctype == 0) 1 else if (ctype == 2) 3 else 4
    val canvas = new Array[Byte](4 * w * h) // RGBA, starts transparent black
    val out = Seq.newBuilder[Array[Byte]]
    var saved: Array[Byte] = null // PREVIOUS-dispose region snapshot
    var k = 0
    while (k < frames.size) {
      val f = frames(k)
      if (k > 0) {
        // apply the PREVIOUS frame's disposal to ITS region
        val p = frames(k - 1)
        val d = if (k - 1 == 0 && p.dispose == 2) 1 else p.dispose
        if (d == 1) { // BACKGROUND: region → transparent black
          var yy = 0
          while (yy < p.h) {
            java.util.Arrays.fill(canvas, 4 * ((p.y + yy) * w + p.x),
              4 * ((p.y + yy) * w + p.x + p.w), 0.toByte)
            yy += 1
          }
        } else if (d == 2) { // PREVIOUS: region → pre-render snapshot
          var yy = 0
          while (yy < p.h) {
            System.arraycopy(saved, 4 * yy * p.w,
              canvas, 4 * ((p.y + yy) * w + p.x), 4 * p.w)
            yy += 1
          }
        }
      }
      if (f.dispose == 2 && !(k == 0)) {
        // snapshot this frame's region BEFORE rendering (PREVIOUS dispose)
        saved = new Array[Byte](4 * f.w * f.h)
        var yy = 0
        while (yy < f.h) {
          System.arraycopy(canvas, 4 * ((f.y + yy) * w + f.x),
            saved, 4 * yy * f.w, 4 * f.w)
          yy += 1
        }
      } else saved = null
      val raw = Multimodal.inflateUnfilter(f.data.toByteArray, f.w, f.h, bpp) match {
        case Some(r) => r
        case None => return None
      }
      val rowBytes = 1 + bpp * f.w
      var yy = 0
      while (yy < f.h) {
        val src = yy * rowBytes + 1
        var xx = 0
        while (xx < f.w) {
          val sr = raw(src + bpp * xx) & 0xff
          val sg = if (ctype == 0) sr else raw(src + bpp * xx + 1) & 0xff
          val sb = if (ctype == 0) sr else raw(src + bpp * xx + 2) & 0xff
          val sa = if (ctype == 6) raw(src + bpp * xx + 3) & 0xff else 255
          val dst = 4 * ((f.y + yy) * w + (f.x + xx))
          if (f.blend == 0 || sa == 255) { // SOURCE (or fully opaque OVER)
            canvas(dst) = sr.toByte; canvas(dst + 1) = sg.toByte
            canvas(dst + 2) = sb.toByte; canvas(dst + 3) = sa.toByte
          } else if (sa != 0) { // OVER, non-premultiplied alpha
            val da = canvas(dst + 3) & 0xff
            val outA = sa + da * (255 - sa) / 255.0
            def mix(s: Int, dIdx: Int): Int = {
              val d = canvas(dst + dIdx) & 0xff
              val v = (s * sa + d * da * (255 - sa) / 255.0) / outA
              math.floor(v + 0.5).toInt
            }
            canvas(dst) = mix(sr, 0).toByte
            canvas(dst + 1) = mix(sg, 1).toByte
            canvas(dst + 2) = mix(sb, 2).toByte
            canvas(dst + 3) = math.floor(outA + 0.5).toInt.toByte
          } // sa == 0 under OVER: destination unchanged
          xx += 1
        }
        yy += 1
      }
      out += canvas.clone()
      k += 1
    }
    Some((w, h, out.result()))
  }

  // ======================= frame-level features =======================

  val frameStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("weighted_r", LongType, nullable = false)))

  /** Per-frame stats of the COMPOSITED canvas — the same stat contract
    * as [[Multimodal.decodeBmpFeatures]] (means + position-sensitive
    * Σ i·R checksum over storage order i = y·W + x) extended with
    * frame_idx, so any bug in fdAT parsing, sequence handling, patch
    * offsets, or dispose/blend compositing shifts a number. Alpha is
    * decoded and drives OVER blending but is not itself a stat; stats
    * read the canvas RGB regardless of transparency.
    */
  def decodeApngFrameFeatures(blobs: DataFrame, spark: SparkSession): DataFrame = {
    val idIdx = blobs.schema.fieldIndex(blobs.columns.head)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val enc = RowEncoder.encoderFor(frameStatsSchema)
    blobs.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        scala.util.Try(decodeApngCanvases(r.getAs[Array[Byte]](blobIdx)))
          .toOption.flatten.toSeq.flatMap { case (w, h, frames) =>
            frames.zipWithIndex.map { case (c, k) =>
              var sumR = 0L; var sumG = 0L; var sumB = 0L; var wR = 0L
              var i = 0
              val n = w * h
              while (i < n) {
                val rr = c(4 * i) & 0xff
                sumR += rr; sumG += c(4 * i + 1) & 0xff; sumB += c(4 * i + 2) & 0xff
                wR += i.toLong * rr
                i += 1
              }
              Row(id, k, w, h, n.toLong, sumR.toDouble / n, sumG.toDouble / n,
                sumB.toDouble / n, wR)
            }
          }
      }
    }(enc)
  }

  /** dHash of one RGBA canvas: the same 9×8 nearest-neighbor luma grid
    * and bit layout as [[Multimodal.bmpDHash]] (bit y·8+x set iff
    * luma(x) < luma(x+1), BT.601 integer luma ×1000) — so image and
    * video-frame fingerprints live in the same 64-bit space and share
    * the banded pairing machinery.
    */
  private[graft] def canvasDHash(c: Array[Byte], w: Int, h: Int): Long = {
    val gw = 9; val gh = 8
    val luma = new Array[Int](gh * gw)
    var gy = 0
    while (gy < gh) {
      val sy = (gy.toLong * h / gh).toInt
      var gx = 0
      while (gx < gw) {
        val sx = (gx.toLong * w / gw).toInt
        val p = 4 * (sy * w + sx)
        luma(gy * gw + gx) = 299 * (c(p) & 0xff) + 587 * (c(p + 1) & 0xff) +
          114 * (c(p + 2) & 0xff)
        gx += 1
      }
      gy += 1
    }
    Multimodal.lumaGridBits(luma)
  }

  val frameDHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** Per-frame perceptual fingerprints over the composited canvases:
    * (doc_id, frame_idx, dhash). Corrupt rows drop.
    */
  def apngFrameDHashes(blobs: DataFrame, spark: SparkSession): DataFrame = {
    val idIdx = blobs.schema.fieldIndex(blobs.columns.head)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val enc = RowEncoder.encoderFor(frameDHashSchema)
    blobs.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        scala.util.Try(decodeApngCanvases(r.getAs[Array[Byte]](blobIdx)))
          .toOption.flatten.toSeq.flatMap { case (w, h, frames) =>
            frames.zipWithIndex.map { case (c, k) => Row(id, k, canvasDHash(c, w, h)) }
          }
      }
    }(enc)
  }

  val videoSigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_cuts", IntegerType, nullable = false),
    StructField("signature", LongType, nullable = false)))

  /** Temporal video fingerprint per blob:
    *   - n_cuts: scene-cut count — frames whose dHash Hamming distance
    *     to the previous frame exceeds `cutBits` (the standard
    *     shot-boundary signal on perceptual hashes);
    *   - signature: 64-bit MAJORITY-VOTE fold of the frame dHashes
    *     (bit set iff set in a strict majority of frames) — a temporal
    *     SimHash. Two videos sharing most frames (re-encodes, trims)
    *     land within small Hamming distance, so near-dup VIDEO pairs
    *     come from the same pigeonhole-banded machinery as text SimHash
    *     and image dHash ([[Dedup.simhashPairs]], sigBits = 64).
    *
    * Everything is per-row compute after the decode — no shuffle; the
    * pairing step downstream is a banded equi-join, never all-pairs.
    */
  def videoSignatures(
      blobs: DataFrame, spark: SparkSession, cutBits: Int = 16): DataFrame = {
    val idIdx = blobs.schema.fieldIndex(blobs.columns.head)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val enc = RowEncoder.encoderFor(videoSigSchema)
    blobs.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        scala.util.Try(decodeApngCanvases(r.getAs[Array[Byte]](blobIdx)))
          .toOption.flatten.map { case (w, h, frames) =>
            val hs = frames.map(canvasDHash(_, w, h))
            var cuts = 0
            var k = 1
            while (k < hs.size) {
              if (java.lang.Long.bitCount(hs(k) ^ hs(k - 1)) > cutBits) cuts += 1
              k += 1
            }
            var sig = 0L
            var b = 0
            while (b < 64) {
              var set = 0
              hs.foreach(hh => if (((hh >>> b) & 1L) == 1L) set += 1)
              if (2 * set > hs.size) sig |= 1L << b
              b += 1
            }
            Row(id, hs.size, cuts, sig)
          }
      }
    }(enc)
  }

  // ========================= synthetic fixtures =========================

  /** One frame of a hand-assembled APNG: rectangle, dispose/blend ops,
    * and raw samples (bpp·w·h bytes in scanline order, no filter bytes).
    */
  private[graft] final case class FrameSpec(
      w: Int, h: Int, x: Int, y: Int,
      dispose: Int, blend: Int, pix: Array[Byte])

  /** Assemble a real APNG from frame specs: correct CRCs, acTL/fcTL/fdAT
    * sequence numbers, per-row filters cycling ((id + k + y) mod 5) so
    * every frame decode exercises all five unfilters. Frame 0 rides the
    * IDAT stream unless `hiddenFirst` (then IDAT carries a default image
    * excluded from the animation and ALL frames are fdAT).
    */
  private[graft] def encodeApng(
      id: Long, w: Int, h: Int, frames: Seq[FrameSpec],
      colorType: Int = 2, hiddenFirst: Boolean = false): Array[Byte] = {
    require(colorType == 0 || colorType == 2 || colorType == 6, "gray/RGB/RGBA")
    val bpp = if (colorType == 0) 1 else if (colorType == 2) 3 else 4
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      def w32(v: Int): Unit = {
        out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff)
      }
      w32(payload.length)
      val typed = typ.getBytes("US-ASCII") ++ payload
      out.write(typed, 0, typed.length)
      val crc = new java.util.zip.CRC32()
      crc.update(typed)
      w32(crc.getValue.toInt)
    }
    def be(v: Int): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ihdr = new Array[Byte](13)
    System.arraycopy(be(w), 0, ihdr, 0, 4)
    System.arraycopy(be(h), 0, ihdr, 4, 4)
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    chunk("acTL", be(frames.size) ++ be(0))
    var seq = 0
    def filterAndDeflate(f: FrameSpec, k: Int): Array[Byte] = {
      require(f.pix.length == bpp * f.w * f.h, s"frame $k sample count")
      val rowBytes = 1 + bpp * f.w
      val raw = new Array[Byte](f.h * rowBytes)
      var y = 0
      while (y < f.h) {
        val ft = ((id + k + y) % 5).toInt
        raw(y * rowBytes) = ft.toByte
        var x = 0
        while (x < bpp * f.w) {
          val cur = f.pix(y * bpp * f.w + x) & 0xff
          val a = if (x >= bpp) f.pix(y * bpp * f.w + x - bpp) & 0xff else 0
          val b = if (y > 0) f.pix((y - 1) * bpp * f.w + x) & 0xff else 0
          val c = if (y > 0 && x >= bpp) f.pix((y - 1) * bpp * f.w + x - bpp) & 0xff else 0
          val filtered = ft match {
            case 0 => cur
            case 1 => (cur - a) & 0xff
            case 2 => (cur - b) & 0xff
            case 3 => (cur - (a + b) / 2) & 0xff
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              (cur - pred) & 0xff
          }
          raw(y * rowBytes + 1 + x) = filtered.toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      try {
        deflater.setInput(raw); deflater.finish()
        val o = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!deflater.finished()) o.write(buf, 0, deflater.deflate(buf))
        o.toByteArray
      } finally deflater.end()
    }
    def fctl(f: FrameSpec): Unit = {
      val p = new Array[Byte](26)
      System.arraycopy(be(seq), 0, p, 0, 4); seq += 1
      System.arraycopy(be(f.w), 0, p, 4, 4)
      System.arraycopy(be(f.h), 0, p, 8, 4)
      System.arraycopy(be(f.x), 0, p, 12, 4)
      System.arraycopy(be(f.y), 0, p, 16, 4)
      p(20) = 0; p(21) = 1; p(22) = 0; p(23) = 25 // delay 1/25 s
      p(24) = f.dispose.toByte; p(25) = f.blend.toByte
      chunk("fcTL", p)
    }
    if (hiddenFirst) {
      // default image (full canvas, zeros) excluded from the animation
      chunk("IDAT", filterAndDeflate(
        FrameSpec(w, h, 0, 0, 0, 0, new Array[Byte](bpp * w * h)), 0))
      frames.zipWithIndex.foreach { case (f, k) =>
        fctl(f)
        val d = filterAndDeflate(f, k)
        chunk("fdAT", be(seq) ++ d); seq += 1
      }
    } else {
      frames.zipWithIndex.foreach { case (f, k) =>
        fctl(f)
        val d = filterAndDeflate(f, k)
        if (k == 0) chunk("IDAT", d)
        else { chunk("fdAT", be(seq) ++ d); seq += 1 }
      }
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** The ORACLE fixture family: RGB, dispose NONE, blend SOURCE — frame
    * 0 fills the canvas with the engine's standard deterministic pixel
    * formula (R = (3·id + 7·i) mod 256, … over i = y·w + x) and each
    * frame k ≥ 1 is a half-canvas PATCH at a formula-determined offset
    * whose samples follow the same formulas shifted by 13·k over the
    * PATCH-LOCAL index j. The composited result has a closed form — the
    * newest covering patch wins per pixel — that a SQL oracle replays
    * exactly (q180/q181/q182).
    */
  private[graft] def encodeSyntheticApng(
      id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { k =>
      if (k == 0) {
        val pix = new Array[Byte](3 * w * h)
        var i = 0
        while (i < w * h) {
          pix(3 * i) = ((3 * id + 7 * i) % 256).toByte
          pix(3 * i + 1) = ((2 * id + 5 * i) % 256).toByte
          pix(3 * i + 2) = ((id + 3 * i) % 256).toByte
          i += 1
        }
        FrameSpec(w, h, 0, 0, 0, 0, pix)
      } else {
        val fw = (w + 1) / 2; val fh = (h + 1) / 2
        val fx = ((id + 3 * k) % (w - fw + 1)).toInt
        val fy = ((id + 5 * k) % (h - fh + 1)).toInt
        val pix = new Array[Byte](3 * fw * fh)
        var j = 0
        while (j < fw * fh) {
          pix(3 * j) = ((3 * id + 7 * j + 13 * k) % 256).toByte
          pix(3 * j + 1) = ((2 * id + 5 * j + 13 * k) % 256).toByte
          pix(3 * j + 2) = ((id + 3 * j + 13 * k) % 256).toByte
          j += 1
        }
        FrameSpec(fw, fh, fx, fy, 0, 0, pix)
      }
    }
    encodeApng(id, w, h, frames)
  }

  /** Fixture APNGs built from a SEED column instead of the row id:
    * input (id, seed) rows; output (doc_id, blob) where the blob is the
    * deterministic video of the SEED (dims, frame count and pixel
    * formulas all keyed on seed). Rows sharing a seed carry
    * byte-identical videos under distinct ids — the controlled-duplicate
    * fixture for near-dup pair queries, same trick as text dedup's
    * mod-class fixtures.
    */
  def syntheticApngsSeeded(idsWithSeed: DataFrame, spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    idsWithSeed.mapPartitions { it =>
      it.map { r =>
        val seed = r.getLong(1)
        Row(r.getLong(0), encodeSyntheticApng(seed,
          9 + (seed % 8).toInt, 8 + (seed % 7).toInt, 2 + (seed % 3).toInt))
      }
    }(enc)
  }

  /** Fixture APNGs: canvas 9 + id mod 8 × 8 + id mod 7 (distinct from
    * the BMP/PNG families so bugs don't mask), 2 + id mod 3 frames.
    */
  def syntheticApngs(ids: DataFrame, spark: SparkSession): DataFrame = {
    val idIdx = 0
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, encodeSyntheticApng(id,
          9 + (id % 8).toInt, 8 + (id % 7).toInt, 2 + (id % 3).toInt))
      }
    }(enc)
  }
}
