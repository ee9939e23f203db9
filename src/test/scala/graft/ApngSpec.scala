package graft

import graft.operators.{Apng, Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** Inter-frame APNG decode: compositing semantics the DuckDB oracle
  * (q180–q182) can't express directly — dispose/blend ops, hidden first
  * frames, hostile inputs — plus parity pins between the operator
  * surface and hand-computed expectations.
  */
class ApngSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  // hand-build tiny frames: 2×2 canvas, solid-color helpers
  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int, a: Int = -1): Array[Byte] = {
    val bpp = if (a >= 0) 4 else 3
    val p = new Array[Byte](bpp * w * h)
    (0 until w * h).foreach { i =>
      p(bpp * i) = r.toByte; p(bpp * i + 1) = g.toByte; p(bpp * i + 2) = b.toByte
      if (a >= 0) p(bpp * i + 3) = a.toByte
    }
    p
  }

  private def canvases(bytes: Array[Byte]) =
    Apng.decodeApngCanvases(bytes).getOrElse(fail("decode returned None"))

  private def px(c: Array[Byte], w: Int, x: Int, y: Int): (Int, Int, Int, Int) = {
    val o = 4 * (y * w + x)
    ((c(o) & 0xff), (c(o + 1) & 0xff), (c(o + 2) & 0xff), (c(o + 3) & 0xff))
  }

  test("synthetic round-trip: composited frames equal the closed-form formula") {
    // replicate the oracle's model in Scala directly from the formulas
    val id = 7L
    val w = 9 + (id % 8).toInt; val h = 8 + (id % 7).toInt
    val f = 2 + (id % 3).toInt
    val (gw, gh, frames) = canvases(Apng.encodeSyntheticApng(id, w, h, f))
    assert(gw === w && gh === h && frames.size === f)
    val fw = (w + 1) / 2; val fh = (h + 1) / 2
    for (k <- 0 until f; y <- 0 until h; x <- 0 until w) {
      // newest covering patch m ≤ k wins, else the frame-0 formula
      val cover = (1 to k).reverse.find { m =>
        val fx = ((id + 3 * m) % (w - fw + 1)).toInt
        val fy = ((id + 5 * m) % (h - fh + 1)).toInt
        x >= fx && x < fx + fw && y >= fy && y < fy + fh
      }
      val (er, eg, eb) = cover match {
        case Some(m) =>
          val fx = ((id + 3 * m) % (w - fw + 1)).toInt
          val fy = ((id + 5 * m) % (h - fh + 1)).toInt
          val j = (y - fy) * fw + (x - fx)
          (((3 * id + 7 * j + 13 * m) % 256).toInt,
            ((2 * id + 5 * j + 13 * m) % 256).toInt,
            ((id + 3 * j + 13 * m) % 256).toInt)
        case None =>
          val i = y * w + x
          (((3 * id + 7 * i) % 256).toInt, ((2 * id + 5 * i) % 256).toInt,
            ((id + 3 * i) % 256).toInt)
      }
      val (gr, gg, gb, ga) = px(frames(k), w, x, y)
      assert((gr, gg, gb, ga) === ((er, eg, eb, 255)),
        s"frame $k pixel ($x,$y)")
    }
  }

  test("dispose BACKGROUND clears the frame's region before the next frame") {
    // 2×2 canvas: frame0 solid red full-canvas dispose=BACKGROUND,
    // frame1 a 1×1 green patch at (0,0) blend SOURCE. Frame 1's canvas:
    // (0,0) green, the other three pixels transparent black (cleared).
    val blob = Apng.encodeApng(1L, 2, 2, Seq(
      Apng.FrameSpec(2, 2, 0, 0, 1, 0, solid(2, 2, 200, 0, 0)),
      Apng.FrameSpec(1, 1, 0, 0, 0, 0, solid(1, 1, 0, 200, 0))))
    val (_, _, fs) = canvases(blob)
    assert(px(fs(0), 2, 1, 1) === ((200, 0, 0, 255)))
    assert(px(fs(1), 2, 0, 0) === ((0, 200, 0, 255)))
    assert(px(fs(1), 2, 1, 0) === ((0, 0, 0, 0)), "cleared to transparent black")
    assert(px(fs(1), 2, 1, 1) === ((0, 0, 0, 0)))
  }

  test("dispose PREVIOUS reverts the region; first-frame PREVIOUS acts as BACKGROUND") {
    // frame0 red (dispose PREVIOUS on frame 0 downgrades to BACKGROUND),
    // frame1 blue patch over (0,0) with dispose PREVIOUS,
    // frame2 1×1 white at (1,1): frame2 must show frame1's region
    // REVERTED — i.e. (0,0) back to the post-disposal state of frame 0's
    // disposal (transparent, since frame0's PREVIOUS→BACKGROUND cleared
    // the full canvas), not blue.
    val blob = Apng.encodeApng(2L, 2, 2, Seq(
      Apng.FrameSpec(2, 2, 0, 0, 2, 0, solid(2, 2, 200, 0, 0)), // PREVIOUS→BACKGROUND
      Apng.FrameSpec(1, 1, 0, 0, 2, 0, solid(1, 1, 0, 0, 200)),
      Apng.FrameSpec(1, 1, 1, 1, 0, 0, solid(1, 1, 255, 255, 255))))
    val (_, _, fs) = canvases(blob)
    assert(px(fs(1), 2, 0, 0) === ((0, 0, 200, 255)), "frame1 shows its patch")
    assert(px(fs(1), 2, 1, 0) === ((0, 0, 0, 0)), "frame0 cleared by BACKGROUND")
    assert(px(fs(2), 2, 0, 0) === ((0, 0, 0, 0)),
      "PREVIOUS revert: patch region back to pre-render (transparent)")
    assert(px(fs(2), 2, 1, 1) === ((255, 255, 255, 255)))
  }

  test("blend OVER composites by alpha; SOURCE overwrites including alpha") {
    // RGBA: frame0 opaque red; frame1 half-transparent? use a=0 and
    // a=255 for exact arithmetic: a=0 OVER leaves red; a=255 OVER
    // replaces; then a genuine fractional case with known rounding
    val blob = Apng.encodeApng(3L, 2, 1, Seq(
      Apng.FrameSpec(2, 1, 0, 0, 0, 0, solid(2, 1, 200, 0, 0, 255)),
      Apng.FrameSpec(2, 1, 0, 0, 0, 1,
        solid(1, 1, 0, 200, 0, 0) ++ solid(1, 1, 0, 200, 0, 255))),
      colorType = 6)
    val (_, _, fs) = canvases(blob)
    assert(px(fs(1), 2, 0, 0) === ((200, 0, 0, 255)), "alpha-0 OVER is a no-op")
    assert(px(fs(1), 2, 1, 0) === ((0, 200, 0, 255)), "alpha-255 OVER replaces")

    // fractional alpha: src (100,0,0,102) OVER dst (0,200,0,255):
    // outA = 102 + 255·153/255 = 255; r = 100·102/255 = 40;
    // g = 200·255·153/255/255 → 200·153/255 = 120
    val blob2 = Apng.encodeApng(4L, 1, 1, Seq(
      Apng.FrameSpec(1, 1, 0, 0, 0, 0, solid(1, 1, 0, 200, 0, 255)),
      Apng.FrameSpec(1, 1, 0, 0, 0, 1, solid(1, 1, 100, 0, 0, 102))),
      colorType = 6)
    val (_, _, fs2) = canvases(blob2)
    assert(px(fs2(1), 1, 0, 0) === ((40, 120, 0, 255)))
  }

  test("hidden default image: IDAT is excluded; all frames come from fdAT") {
    val blob = Apng.encodeApng(5L, 2, 2, Seq(
      Apng.FrameSpec(2, 2, 0, 0, 0, 0, solid(2, 2, 10, 20, 30)),
      Apng.FrameSpec(1, 1, 1, 0, 0, 0, solid(1, 1, 40, 50, 60))),
      hiddenFirst = true)
    val (_, _, fs) = canvases(blob)
    assert(fs.size === 2)
    assert(px(fs(0), 2, 0, 0) === ((10, 20, 30, 255)),
      "frame 0 is the first fdAT frame, NOT the hidden IDAT zeros")
    assert(px(fs(1), 2, 1, 0) === ((40, 50, 60, 255)))
  }

  test("hostile inputs reject: bad sequence, out-of-bounds region, frame-count lies") {
    val good = Apng.encodeSyntheticApng(9L, 9, 8, 3)
    assert(Apng.decodeApngCanvases(good).isDefined)

    // corrupt an fcTL/fdAT sequence number (find 'fdAT', bump its seq)
    def indexOf(b: Array[Byte], s: String): Int = {
      val pat = s.getBytes("US-ASCII")
      (0 to b.length - pat.length).find(i => pat.indices.forall(j => b(i + j) == pat(j)))
        .getOrElse(-1)
    }
    val badSeq = good.clone()
    val fd = indexOf(badSeq, "fdAT")
    assert(fd > 0)
    badSeq(fd + 7) = (badSeq(fd + 7) + 1).toByte
    assert(Apng.decodeApngCanvases(badSeq).isEmpty, "skewed sequence number")

    // region outside the canvas
    assert(Apng.decodeApngCanvases(Apng.encodeApng(6L, 2, 2, Seq(
      Apng.FrameSpec(2, 2, 0, 0, 0, 0, solid(2, 2, 1, 2, 3)),
      Apng.FrameSpec(2, 1, 1, 0, 0, 0, solid(2, 1, 4, 5, 6))))).isEmpty)

    // acTL declares more frames than exist
    val lie = good.clone()
    val ac = indexOf(lie, "acTL")
    lie(ac + 7) = 9 // num_frames low byte (3 → 9); CRC now wrong too but
    // the count check fires regardless of CRC (we don't verify ancillary CRCs)
    assert(Apng.decodeApngCanvases(lie).isEmpty)

    // a plain still PNG (no acTL) is NOT an APNG
    assert(Apng.decodeApngCanvases(
      graft.operators.Multimodal.syntheticBmps(ids(1), spark)
        .head().getAs[Array[Byte]]("blob")).isEmpty)

    // truncation anywhere must reject, not throw
    (1 until good.length by 37).foreach { cut =>
      assert(Apng.decodeApngCanvases(good.take(cut)).isEmpty, s"cut=$cut")
    }
  }

  test("frame dHash: frame 0 of a single-frame APNG equals the still-image dHash path") {
    // the same pixel field through the BMP dHash and the APNG canvas
    // dHash must produce the identical 64-bit signature — one fingerprint
    // space across stills and video frames
    val id = 11L
    val w = 9 + (id % 8).toInt; val h = 8 + (id % 7).toInt
    val apng = Apng.encodeSyntheticApng(id, w, h, 1)
    val (_, _, fs) = canvases(apng)
    val viaApng = Apng.canvasDHash(fs(0), w, h)
    // build the equivalent BMP (same formula, same dims) and hash it
    val viaBmpDf = graft.operators.Multimodal.imageDHashes(
      Seq((id, encodeBmp(id, w, h))).toDF("doc_id", "blob"), spark)
    assert(viaBmpDf.select("dhash").as[Long].head() === viaApng)
  }

  // local copy of the BMP fixture builder shape at chosen dims (the
  // library one pins its own dims); formula identical
  private def encodeBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val size = 54 + rowSize * h
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(2, size); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, w); putLe32(22, h)
    b(26) = 1; b(28) = 24
    putLe32(34, rowSize * h)
    var sr = 0
    while (sr < h) {
      val y = h - 1 - sr
      val base = 54 + sr * rowSize
      var x = 0
      while (x < w) {
        val i = y.toLong * w + x
        b(base + 3 * x) = ((id + 3 * i) % 256).toByte
        b(base + 3 * x + 1) = ((2 * id + 5 * i) % 256).toByte
        b(base + 3 * x + 2) = ((3 * id + 7 * i) % 256).toByte
        x += 1
      }
      sr += 1
    }
    b
  }

  test("videoSignatures: cut counting and majority vote are order-exact") {
    val blobs = Apng.syntheticApngs(ids(40), spark)
    val sigs = Apng.videoSignatures(blobs, spark, cutBits = 16)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    val hashes = Apng.apngFrameDHashes(blobs, spark)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(sigs.keySet === hashes.keySet && sigs.nonEmpty)
    sigs.foreach { case (id, (nf, cuts, sig)) =>
      val hs = hashes(id)
      assert(nf === hs.size)
      assert(cuts === hs.sliding(2).count {
        case Seq(a, b) => java.lang.Long.bitCount(a ^ b) > 16
        case _ => false
      })
      (0 until 64).foreach { b =>
        val set = hs.count(hh => ((hh >>> b) & 1L) == 1L)
        assert((((sig >>> b) & 1L) == 1L) === (2 * set > hs.size), s"bit $b of $id")
      }
    }
  }

  test("video near-dup: identical APNGs pair through the banded SimHash machinery") {
    // two ids forced to the same blob → identical signatures → the
    // pigeonhole-banded pairing MUST surface the pair (distance 0 ≤ any
    // threshold); a third, different video must not pair at distance 0
    val base = Apng.encodeSyntheticApng(21L, 12, 9, 3)
    val other = Apng.encodeSyntheticApng(22L, 12, 9, 3)
    val blobs = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "blob")
    val sigs = Apng.videoSignatures(blobs, spark).select(col("doc_id"), col("signature"))
    val pairs = Dedup.simhashPairs(sigs, "doc_id", "signature", maxHamming = 0, sigBits = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
