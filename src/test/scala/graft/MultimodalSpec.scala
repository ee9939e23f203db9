package graft

import org.apache.spark.sql.functions._

import graft.operators.{Gif, Jpeg, Mp4, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "x" * 100)).toDF("doc_id", "text")

  test("withBlob produces a BINARY column carrying the exact bytes") {
    val blobs = Multimodal.withBlob(docs, "doc_id", "text")
    assert(blobs.schema("blob").dataType.typeName == "binary")
    val got = blobs.select("doc_id", "blob").as[(Long, Array[Byte])].collect().toMap
    assert(new String(got(1L), "UTF-8") == "hello world")
    assert(got(2L).isEmpty)
  }

  test("decodeFeaturesStub: deterministic fixed-shape features, empty-safe") {
    val out = Multimodal.decodeFeaturesStub(
      Multimodal.withBlob(docs, "doc_id", "text"), spark)
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == 11L)               // n_bytes
    assert(rows(2L).getLong(1) == 0L)                // empty blob ok
    assert(rows(1L).getSeq[Float](5).length == 8)    // fixed feature dim
    // determinism: same input → same feature
    val again = Multimodal.decodeFeaturesStub(
      Multimodal.withBlob(docs, "doc_id", "text"), spark).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](5)).toMap
    assert(again(3L) == rows(3L).getSeq[Float](5))
  }

  test("resizeMeta: fits within maxSide, preserves aspect, never upscales") {
    val decoded = Multimodal.decodeFeaturesStub(
      Multimodal.withBlob(docs, "doc_id", "text"), spark)
    val got = Multimodal.resizeMeta(decoded, maxSide = 32)
      .select("doc_id", "width", "height", "out_width", "out_height")
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, w, h, ow, oh) =>
      assert(ow <= 32 && oh <= 32 && ow >= 1 && oh >= 1, s"doc $id out of bounds")
      assert(ow <= w && oh <= h, s"doc $id upscaled")
      if (math.max(w, h) <= 32) assert(ow == w && oh == h, s"doc $id needlessly resized")
      // aspect preserved within ceil rounding: same scale applied to both
      else {
        val s = 32.0 / math.max(w, h)
        assert(ow == math.max(1, math.ceil(w * s).toInt), s"doc $id width scale")
        assert(oh == math.max(1, math.ceil(h * s).toInt), s"doc $id height scale")
      }
    }
  }

  test("decodeBmpStats parses a hand-built 2x2 BMP: padding, bottom-up, BGR") {
    // 2x2, 24bpp: rowSize = ceil(6/4)*4 = 8 → 2 pad bytes per row.
    // Logical pixels (y=0 top): (0,0)=R10 G20 B30, (0,1)=R11 G21 B31,
    //                           (1,0)=R12 G22 B32, (1,1)=R13 G23 B33.
    // Stored BOTTOM-UP: first stored row is logical y=1.
    val b = new Array[Byte](54 + 16)
    b(0) = 'B'; b(1) = 'M'
    def put32(o: Int, v: Int): Unit = (0 until 4).foreach(k => b(o + k) = ((v >> (8 * k)) & 0xff).toByte)
    put32(10, 54); put32(14, 40); put32(18, 2); put32(22, 2)
    b(26) = 1; b(28) = 24
    // stored row 0 = logical y=1: [B32 G22 R12][B33 G23 R13] pad pad
    val px = Seq(32, 22, 12, 33, 23, 13, 0, 0, 30, 20, 10, 31, 21, 11, 0, 0)
    px.zipWithIndex.foreach { case (v, i) => b(54 + i) = v.toByte }
    val r = Multimodal.decodeBmpStats(7L, b).get
    assert(r.getInt(1) == 2 && r.getInt(2) == 2 && r.getLong(3) == 4L)
    assert(r.getDouble(4) == (10 + 11 + 12 + 13) / 4.0) // mean_r
    assert(r.getDouble(5) == (20 + 21 + 22 + 23) / 4.0) // mean_g
    assert(r.getDouble(6) == (30 + 31 + 32 + 33) / 4.0) // mean_b
    // weighted_r over logical i: 0*10 + 1*11 + 2*12 + 3*13 = 74 — wrong
    // orientation (reading stored order as logical) would give
    // 0*12 + 1*13 + 2*10 + 3*11 = 66
    assert(r.getLong(7) == 74L)
  }

  test("bmpDHash: gradient extremes, perturbation locality, banded image pairing") {
    // in-spec 24bpp bottom-up builder driven by a per-pixel (r,g,b) fn
    def bmp(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rowSize = ((3 * w + 3) / 4) * 4
      val b = new Array[Byte](54 + rowSize * h)
      b(0) = 'B'; b(1) = 'M'
      def put32(o: Int, v: Int): Unit =
        (0 until 4).foreach(k => b(o + k) = ((v >> (8 * k)) & 0xff).toByte)
      put32(10, 54); put32(14, 40); put32(18, w); put32(22, h)
      b(26) = 1; b(28) = 24
      for (sr <- 0 until h; x <- 0 until w) {
        val y = h - 1 - sr
        val (r, g, bl) = px(x, y)
        val base = 54 + sr * rowSize + 3 * x
        b(base) = bl.toByte; b(base + 1) = g.toByte; b(base + 2) = r.toByte
      }
      b
    }
    // strictly increasing left-to-right luma → all 64 comparison bits set;
    // strictly decreasing → none
    val inc = bmp(9, 8)((x, _) => (x * 20, x * 20, x * 20))
    assert(Multimodal.bmpDHash(inc).contains(-1L))
    val dec = bmp(9, 8)((x, _) => (200 - x * 20, 200 - x * 20, 200 - x * 20))
    assert(Multimodal.bmpDHash(dec).contains(0L))

    // perturbation locality: zeroing ONE sampled pixel of an 18x16 image
    // flips only the <=2 comparisons that touch its grid cell, while a
    // structurally different image lands far away in Hamming space
    def lum(v: Int) = (v, v, v)
    def p1(x: Int, y: Int) = lum((x * 37 + y * 61) % 200)
    val base = bmp(18, 16)(p1 _)
    val perturbed = bmp(18, 16)((x, y) => if (x == 2 && y == 2) lum(0) else p1(x, y))
    val other = bmp(18, 16)((x, y) => lum((x * 53 + y * 17 + 91) % 200))
    val (hb, hp, ho) = (Multimodal.bmpDHash(base).get,
      Multimodal.bmpDHash(perturbed).get, Multimodal.bmpDHash(other).get)
    val near = java.lang.Long.bitCount(hb ^ hp)
    val far = java.lang.Long.bitCount(hb ^ ho)
    assert(near >= 1 && near <= 2, s"one sampled pixel flips <=2 bits, got $near")
    assert(far > 4, s"unrelated image must be far in Hamming space, got $far")

    // end-to-end: imageDHashes + the text-SimHash banding machinery pair
    // the near-duplicate images and nothing else (sigBits = 64)
    import spark.implicits._
    val blobs = Seq((1L, base), (2L, perturbed), (3L, other)).toDF("doc_id", "blob")
    val sigs = Multimodal.imageDHashes(blobs, spark)
    assert(sigs.count() === 3)
    val pairs = graft.operators.Dedup.simhashPairs(
        sigs, "doc_id", "dhash", nBands = 8, maxHamming = 4, sigBits = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"only the perturbed pair is near: $pairs")

    // corrupt rows drop, not crash
    val withBad = blobs.unionByName(Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob"))
    assert(Multimodal.imageDHashes(withBad, spark).count() === 3)
  }

  test("imageDHash: one fingerprint space across BMP/PNG/JPEG/GIF") {
    // the SAME logical image through the two lossless encoders hashes
    // IDENTICALLY — dispatch, decode, and grid sampling all agree
    for (id <- Seq(0L, 7L, 23L)) {
      val (w, h) = (8 + (id % 11).toInt, 8 + (id % 5).toInt)
      // a BMP carrying the PNG-fixture formula pixels (same dims)
      val bmpOfPng = {
        val b = Multimodal.encodeSyntheticBmp(id, w, h)
        b // encodeSyntheticBmp already uses the identical RGB formula
      }
      val png = Multimodal.encodeSyntheticPng(id, w, h, colorType = 2)
      val pngA = Multimodal.encodeSyntheticPng(id, w, h, colorType = 6)
      val hb = Multimodal.imageDHash(bmpOfPng)
      val hp = Multimodal.imageDHash(png)
      val hpA = Multimodal.imageDHash(pngA)
      assert(hb.isDefined && hb === hp, s"BMP vs PNG dHash diverged for id=$id")
      assert(hp === hpA, "alpha plane must not affect the fingerprint")
    }

    // the same logical image through LOSSY JPEG lands within a small
    // Hamming distance of the lossless hash (dHash's whole point)
    val (w, h) = (24, 16)
    def px(i: Long): (Int, Int, Int) =
      (((3 * 5 + 7 * i) % 256).toInt, ((2 * 5 + 5 * i) % 256).toInt,
        ((5 + 3 * i) % 256).toInt)
    val n = w * h
    val (rs, gs, bs) = (new Array[Int](n), new Array[Int](n), new Array[Int](n))
    for (i <- 0 until n) { val (r, g, b) = px(i); rs(i) = r; gs(i) = g; bs(i) = b }
    val jpeg = Jpeg.encodeRgb(rs, gs, bs, w, h)
    val bmp = Multimodal.encodeSyntheticBmp(5L, w, h) // same formula, id=5
    val hj = Multimodal.imageDHash(jpeg).get
    val hbm = Multimodal.imageDHash(bmp).get
    val ham = java.lang.Long.bitCount(hj ^ hbm)
    assert(ham <= 8, s"lossy JPEG drifted $ham bits from the lossless hash")

    // GIF (incl. interlaced) dispatches and matches a direct formula replay
    for ((id, interlaced) <- Seq((3L, true), (10L, false))) {
      val (gw, gh) = (8 + (id % 13).toInt, 8 + (id % 6).toInt)
      val gif = Gif.encodeSynthetic(id, gw, gh, interlaced)
      val luma = new Array[Int](72)
      for (gy <- 0 until 8; gx <- 0 until 9) {
        val i = (gy.toLong * gh / 8) * gw + (gx.toLong * gw / 9)
        val v = ((5 * id + 7 * i) % 256).toInt
        luma(gy * 9 + gx) = 299 * v + 587 * ((2 * v) % 256) + 114 * ((3 * v) % 256)
      }
      assert(Multimodal.imageDHash(gif).contains(Multimodal.lumaGridBits(luma)),
        s"GIF dHash mismatch for id=$id interlaced=$interlaced")
    }

    // unknown magic and truncated streams land in None, never a crash
    assert(Multimodal.imageDHash("no magic here at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDHash(
      Multimodal.encodeSyntheticPng(4L, 12, 9).take(40)).isEmpty)
    assert(Multimodal.imageDHash(Array[Byte]()).isEmpty)
  }

  test("decodeBmpStats rejects non-BMP, compressed, and truncated input") {
    assert(Multimodal.decodeBmpStats(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeBmpStats(1L, "not a bitmap at all, just text!!!!!!!!!!!!!!!!!!!!!!!!!"
      .getBytes("UTF-8")).isEmpty)
    val valid = Multimodal.encodeSyntheticBmp(5L, 9, 8)
    assert(Multimodal.decodeBmpStats(5L, valid).isDefined)
    assert(Multimodal.decodeBmpStats(5L, valid.take(60)).isEmpty) // truncated
    val compressed = valid.clone(); compressed(30) = 1 // BI_RLE8
    assert(Multimodal.decodeBmpStats(5L, compressed).isEmpty)
  }

  test("dims above the weighted-checksum overflow cap decode to None") {
    // 20000×20000 = 4e8 px > MaxStatPixels: Σ i·255 would wrap Long, so
    // the claim must land in None (wrong-stats prevention), not in
    // silently-wrapped weighted_r
    val bmp = Multimodal.encodeSyntheticBmp(1L, 9, 8).clone()
    def put32(o: Int, v: Int): Unit =
      (0 until 4).foreach(k => bmp(o + k) = ((v >> (8 * k)) & 0xff).toByte)
    put32(18, 20000); put32(22, 20000)
    assert(Multimodal.decodeBmpStats(1L, bmp).isEmpty)
    assert(20000L * 20000L > Multimodal.MaxStatPixels)
    // and the cap itself is safe: 255·n(n-1)/2 at the cap fits a Long
    val n = Multimodal.MaxStatPixels
    assert(BigInt(255) * n * (n - 1) / 2 <= BigInt(Long.MaxValue))
  }

  test("hostile headers land in None, never an out-of-bounds crash") {
    // BMP: negative pixel-data offset
    val bmp1 = Multimodal.encodeSyntheticBmp(1L, 9, 8)
    val negOff = bmp1.clone(); negOff(13) = 0x80.toByte // off = 0x80000000
    assert(Multimodal.decodeBmpStats(1L, negOff).isEmpty)
    // BMP: width large enough that 3*w overflows Int
    val hugeW = bmp1.clone()
    hugeW(18) = 0; hugeW(19) = 0; hugeW(20) = 0; hugeW(21) = 0x40
    assert(Multimodal.decodeBmpStats(1L, hugeW).isEmpty)
    // BMP: height = Int.MinValue (abs() would overflow)
    val minH = bmp1.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    assert(Multimodal.decodeBmpStats(1L, minH).isEmpty)
    // WAV: chunk length near Int.MaxValue (Int bound check would wrap)
    val wav = Multimodal.encodeSyntheticWav(1L, 10)
    val hugeChunk = wav.clone()
    hugeChunk(16) = 0xF0.toByte; hugeChunk(17) = 0xFF.toByte
    hugeChunk(18) = 0xFF.toByte; hugeChunk(19) = 0x7F.toByte
    assert(Multimodal.decodeWavStats(1L, hugeChunk).isEmpty)
    // and through the Spark path: corrupt rows DROP, they never fail the job
    val blobs = Seq((1L, negOff), (2L, Multimodal.encodeSyntheticBmp(2L, 10, 9)))
      .toDF("doc_id", "blob")
    val out = Multimodal.decodeBmpFeatures(blobs, spark).select("doc_id")
      .as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("encode -> real decode round-trips the generation formula") {
    val ids = Seq(1L, 2L, 17L, 100L).toDF("doc_id")
    val got = Multimodal.decodeBmpFeatures(
        Multimodal.syntheticBmps(ids, spark), spark)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L, 17L, 100L).foreach { id =>
      val w = 8 + (id % 9).toInt; val h = 8 + (id % 7).toInt
      val n = w * h
      val r = got(id)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getLong(3) == n.toLong)
      val meanR = (0 until n).map(i => (3 * id + 7 * i) % 256).sum.toDouble / n
      val wR = (0 until n).map(i => i * ((3 * id + 7 * i) % 256)).sum
      assert(r.getDouble(4) == meanR, s"mean_r of $id")
      assert(r.getLong(7) == wR, s"weighted_r of $id")
    }
  }

  test("decodeWavStats parses PCM16, tolerates extra chunks, rejects non-PCM") {
    val wav = Multimodal.encodeSyntheticWav(3L, 10)
    val r = Multimodal.decodeWavStats(3L, wav).get
    assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getLong(3) == 10L)
    val want = (0 until 10).map(i => ((13 * 3 + 31 * i) % 65536) - 32768)
    assert(r.getDouble(4) == want.sum.toDouble / 10)
    assert(r.getLong(5) == want.map(math.abs(_).toLong).sum)

    // insert a LIST chunk between fmt and data: still parses
    val head = wav.take(36)          // RIFF..fmt chunk
    val tail = wav.drop(36)          // data chunk
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = head ++ listChunk ++ tail
    assert(Multimodal.decodeWavStats(3L, withList).contains(r))

    // non-PCM format code rejected; truncated data rejected; junk rejected
    val nonPcm = wav.clone(); nonPcm(20) = 3 // IEEE float
    assert(Multimodal.decodeWavStats(3L, nonPcm).isEmpty)
    assert(Multimodal.decodeWavStats(3L, wav.dropRight(3)).isEmpty)
    assert(Multimodal.decodeWavStats(3L, Array.fill[Byte](100)(7)).isEmpty)
  }

  test("sampleChunks: chunk count and strided fingerprints") {
    val out = Multimodal.sampleChunks(
      Multimodal.withBlob(docs, "doc_id", "text"), spark, chunkSize = 16, stride = 4)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getInt(1) == 7)                  // 100 bytes → 7 chunks of 16
    assert(byId(3L).getSeq[Long](2).length == 2)     // chunks 0 and 4 sampled
    assert(byId(2L).getInt(1) == 0)
    // identical chunks ("x"*16) hash identically
    val fps = byId(3L).getSeq[Long](2)
    assert(fps(0) == fps(1))
  }

  test("PNG: encode -> real decode round-trips; identical stats to the BMP path") {
    // ids 0..9 make (id + y) % 5 hit every filter type on every image
    // taller than 5 rows — any unfilter bug breaks the formula match
    (0L to 9L).foreach { id =>
      val w = 8 + (id % 11).toInt; val h = 8 + (id % 5).toInt
      val png = Multimodal.decodePngStats(id, Multimodal.encodeSyntheticPng(id, w, h))
      assert(png.isDefined, s"id $id must decode")
      // the BMP encoder draws the SAME formula: stats rows must be equal
      val bmp = Multimodal.decodeBmpStats(id, Multimodal.encodeSyntheticBmp(id, w, h))
      assert(png == bmp, s"id $id: PNG and BMP decodes disagree")
    }
  }

  test("PNG decoder rejects corrupt and unsupported input, never crashes") {
    val good = Multimodal.encodeSyntheticPng(5L, 10, 9)
    assert(Multimodal.decodePngStats(5L, good).isDefined)
    // wrong signature
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(Multimodal.decodePngStats(5L, badSig).isEmpty)
    // corrupt the DEFLATE stream (flip bytes inside IDAT payload)
    val badIdat = good.clone()
    (50 until 58).foreach(i => badIdat(i) = (badIdat(i) ^ 0x5a).toByte)
    assert(Multimodal.decodePngStats(5L, badIdat).isEmpty)
    // truncated file
    assert(Multimodal.decodePngStats(5L, good.take(good.length / 2)).isEmpty)
    // unsupported color type (grayscale) in an otherwise valid header
    val gray = good.clone(); gray(8 + 4 + 4 + 9) = 0 // IHDR color-type byte
    assert(Multimodal.decodePngStats(5L, gray).isEmpty)
    // empty and garbage
    assert(Multimodal.decodePngStats(5L, Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodePngStats(5L, Array.fill[Byte](200)(7)).isEmpty)
    // FDICT bit set in the zlib header (PNG forbids preset dictionaries;
    // chunk CRCs are unvalidated so one bit flip gets here): inflate()
    // reports zero progress forever — must be None, never a hang
    val fdict = good.clone()
    val cmfAt = 8 + 25 + 8 // sig + IHDR chunk + IDAT len/type
    val flgAt = cmfAt + 1
    // set FDICT and RE-VALIDATE FCHECK so the header parses and inflate()
    // genuinely stalls on needsDictionary (a broken FCHECK would take the
    // easier DataFormatException path instead)
    val cmf = fdict(cmfAt) & 0xff
    var flg = ((fdict(flgAt) & 0xff) | 0x20) & 0xE0
    flg |= (31 - (cmf * 256 + flg) % 31) % 31
    fdict(flgAt) = flg.toByte
    assert(Multimodal.decodePngStats(5L, fdict).isEmpty)
    // hostile dims: a tiny blob claiming ~26000x26000 must be rejected by
    // the DEFLATE-expansion bound BEFORE the ~2 GB buffer allocation
    // (an OOME is fatal and escapes the corrupt-row Try)
    val huge = good.clone()
    def put32(o: Int, v: Int): Unit = {
      huge(o) = ((v >>> 24) & 0xff).toByte; huge(o + 1) = ((v >>> 16) & 0xff).toByte
      huge(o + 2) = ((v >>> 8) & 0xff).toByte; huge(o + 3) = (v & 0xff).toByte
    }
    put32(16, 26000); put32(20, 26000) // IHDR width/height
    assert(Multimodal.decodePngStats(5L, huge).isEmpty)
  }

  test("JPEG: constant-block fixture decodes to the exact formula stats") {
    // constant 8×8 blocks are DC-only and integer-exact through the full
    // DCT→quant→Huffman→IDCT pipeline (q133's oracle contract)
    Seq((3L, 16, 16), (7L, 40, 24), (12L, 8, 8)).foreach { case (id, w, h) =>
      val blob = Multimodal.encodeSyntheticJpeg(id, w, h)
      val r = Jpeg.decodeStats(id, blob).get
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getLong(3) == w.toLong * h)
      val bpr = w / 8
      def v(i: Long): Long = {
        val y = i / w; val x = i % w
        (5 * id + 11 * ((y / 8) * bpr + x / 8)) % 256
      }
      val n = w.toLong * h
      val exp = (0L until n).map(v)
      assert(r.getDouble(4) == exp.sum.toDouble / n, s"mean id=$id")
      assert(r.getDouble(5) == r.getDouble(4) && r.getDouble(6) == r.getDouble(4))
      assert(r.getLong(7) == (0L until n).map(i => i * v(i)).sum, s"weighted id=$id")
    }
  }

  test("JPEG: non-constant images round-trip through the AC path within ±1") {
    // a gradient exercises AC coefficients, run-lengths, ZRL and multi-
    // category Huffman codes; all-ones quantization bounds the error at
    // the coefficient-rounding level (±1 per pixel after IDCT)
    val w = 24; val h = 16
    val pix = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      (x * 7 + y * 11 + ((x * y) % 5) * 3) % 256
    }
    val blob = Jpeg.encodeGray(pix, w, h)
    val (dw, dh, nc, planes) = Jpeg.decode(blob).get
    assert(dw == w && dh == h && nc == 1)
    val maxErr = (0 until w * h).map(i => math.abs(planes(0)(i) - pix(i))).max
    assert(maxErr <= 1, s"max pixel error $maxErr")
  }

  test("JPEG: color (YCbCr 4:4:4) decodes through the interleaved-MCU path") {
    val w = 16; val h = 16
    val r0 = Array.tabulate(w * h)(i => (i * 5) % 256)
    val g0 = Array.tabulate(w * h)(i => (i * 3 + 50) % 256)
    val b0 = Array.tabulate(w * h)(i => (250 - (i * 7) % 251))
    val blob = Jpeg.encodeRgb(r0, g0, b0, w, h)
    val (dw, dh, nc, planes) = Jpeg.decode(blob).get
    assert(dw == w && dh == h && nc == 3)
    // error budget: RGB→YCbCr rounding (±0.5/plane) + coefficient
    // rounding (±1/plane), amplified ≤1.772× by the back-conversion,
    // + final rounding — ≤ 5 per channel
    var maxErr = 0
    var i = 0
    while (i < w * h) {
      val y = planes(0)(i).toDouble
      val cb = planes(1)(i).toDouble - 128.0
      val cr = planes(2)(i).toDouble - 128.0
      def c8(v: Int) = math.max(0, math.min(255, v))
      val rr = c8(math.round(y + 1.402 * cr).toInt)
      val gg = c8(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
      val bb = c8(math.round(y + 1.772 * cb).toInt)
      maxErr = math.max(maxErr, math.max(math.abs(rr - r0(i)),
        math.max(math.abs(gg - g0(i)), math.abs(bb - b0(i)))))
      i += 1
    }
    assert(maxErr <= 5, s"max channel error $maxErr")
    // stats path agrees with the plane decode (same conversion formula)
    assert(Jpeg.decodeStats(1L, blob).isDefined)
  }

  test("JPEG 4:2:0: subsampled streams decode through the multi-block MCU path") {
    def roundTrip(r0: Array[Int], g0: Array[Int], b0: Array[Int],
        w: Int, h: Int, budget: Int): Unit = {
      val blob = Jpeg.encodeRgb420(r0, g0, b0, w, h)
      val (dw, dh, nc, planes) = Jpeg.decode(blob).get
      assert(dw == w && dh == h && nc == 3)
      var maxErr = 0
      var i = 0
      while (i < w * h) {
        val y = planes(0)(i).toDouble
        val cb = planes(1)(i).toDouble - 128.0
        val cr = planes(2)(i).toDouble - 128.0
        def c8(v: Int) = math.max(0, math.min(255, v))
        val rr = c8(math.round(y + 1.402 * cr).toInt)
        val gg = c8(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
        val bb = c8(math.round(y + 1.772 * cb).toInt)
        maxErr = math.max(maxErr, math.max(math.abs(rr - r0(i)),
          math.max(math.abs(gg - g0(i)), math.abs(bb - b0(i)))))
        i += 1
      }
      assert(maxErr <= budget, s"max channel error $maxErr > $budget ($w x $h)")
    }
    // constant chroma (fixed r-g / b-g): the 2×2 box average is lossless,
    // so the budget matches the 4:4:4 color test
    val w = 32; val h = 24
    val g0 = Array.tabulate(w * h)(i => 40 + (i * 3) % 176)
    roundTrip(g0.map(_ + 30), g0, g0.map(_ - 30), w, h, budget = 5)
    // non-16-aligned dims: replicate-padded edge MCUs must reconstruct
    val w2 = 13; val h2 = 9
    val g2 = Array.tabulate(w2 * h2)(i => 50 + (i * 5) % 150)
    roundTrip(g2.map(_ + 20), g2, g2.map(_ - 20), w2, h2, budget = 5)
    // gently varying chroma: budget covers box-downsample + NN-upsample
    val w3 = 48; val h3 = 32
    val g3 = Array.tabulate(w3 * h3)(i => 60 + (i % w3) * 2 % 140)
    val r3 = Array.tabulate(w3 * h3)(i => math.min(255, g3(i) + 10 + (i / w3) / 4))
    val b3 = Array.tabulate(w3 * h3)(i => math.max(0, g3(i) - 10 - (i % w3) / 8))
    roundTrip(r3, g3, b3, w3, h3, budget = 12)
    // the streaming stats path handles the same stream
    assert(Jpeg.decodeStats(9L,
      Jpeg.encodeRgb420(g0.map(_ + 30), g0, g0.map(_ - 30), w, h)).isDefined)
  }

  test("JPEG: MCU components follow SCAN-header order, not SOF order") {
    // spec-legal streams may list SOS components in any order (T.81
    // B.2.3); the entropy data follows THAT order. Re-labeling the SOS
    // entries of a normally-encoded stream must therefore swap the
    // decoded chroma planes — proof the decoder reads the scan header
    // rather than assuming SOF order
    val w = 16; val h = 16
    val r0 = Array.tabulate(w * h)(i => (i * 5) % 256)
    val g0 = Array.tabulate(w * h)(i => (i * 3 + 50) % 256)
    val b0 = Array.tabulate(w * h)(i => (250 - (i * 7) % 251))
    val blob = Jpeg.encodeRgb(r0, g0, b0, w, h)
    val (_, _, _, orig) = Jpeg.decode(blob).get
    // find SOS and swap the component ids of entries 2 and 3
    val sosAt = blob.indices.find(i =>
      (blob(i) & 0xff) == 0xff && (blob(i + 1) & 0xff) == 0xda).get
    val seg = sosAt + 4 // marker + length
    assert((blob(seg) & 0xff) == 3)
    val swapped = blob.clone()
    assert((swapped(seg + 3) & 0xff) == 2 && (swapped(seg + 5) & 0xff) == 3)
    swapped(seg + 3) = 3; swapped(seg + 5) = 2
    val (_, _, _, planes) = Jpeg.decode(swapped).get
    assert(planes(0).toSeq == orig(0).toSeq, "luma unaffected")
    assert(planes(1).toSeq == orig(2).toSeq && planes(2).toSeq == orig(1).toSeq,
      "chroma planes must swap with the scan order")
  }

  test("JPEG: non-8-aligned dims decode with replicate-padded edge MCUs") {
    val w = 13; val h = 9
    val pix = Array.tabulate(w * h)(i => (i * 17) % 256)
    val (dw, dh, _, planes) = Jpeg.decode(Jpeg.encodeGray(pix, w, h)).get
    assert(dw == w && dh == h)
    val maxErr = (0 until w * h).map(i => math.abs(planes(0)(i) - pix(i))).max
    assert(maxErr <= 1, s"max pixel error $maxErr")
  }

  test("MP4: box walk parses brand, duration, tracks, 16.16 dims") {
    import graft.operators.Mp4
    val blob = Mp4.encodeSynthetic(4321L, 320, 240, withAudio = true)
    val r = Mp4.parseMeta(9L, blob).get
    assert(r.getLong(1) == 4321L)       // duration_ms (timescale 1000)
    assert(r.getInt(2) == 2)            // video + audio tracks
    assert(r.getInt(3) == 320 && r.getInt(4) == 240)
    assert(r.getBoolean(5) && r.getBoolean(6))
    assert(r.getString(7) == "isom")
    // video-only
    val vOnly = Mp4.parseMeta(1L, Mp4.encodeSynthetic(500L, 16, 16, withAudio = false)).get
    assert(vOnly.getInt(2) == 1 && vOnly.getBoolean(5) && !vOnly.getBoolean(6))
  }

  test("MP4 parser rejects corrupt/hostile containers, never hangs") {
    import graft.operators.Mp4
    val good = Mp4.encodeSynthetic(1000L, 32, 32, withAudio = false)
    assert(Mp4.parseMeta(1L, good).isDefined)
    // truncations
    Seq(1, 8, 20, good.length / 2).foreach { cut =>
      assert(Mp4.parseMeta(1L, good.take(cut)).isEmpty, s"cut=$cut")
    }
    // garbage and empty
    assert(Mp4.parseMeta(1L, Array.emptyByteArray).isEmpty)
    assert(Mp4.parseMeta(1L, Array.fill[Byte](64)(9)).isEmpty)
    // hostile box size: first box claims 2 GB — walk must stop cleanly
    val huge = good.clone()
    huge(0) = 0x7f; huge(1) = 0xff.toByte; huge(2) = 0xff.toByte; huge(3) = 0xff.toByte
    assert(Mp4.parseMeta(1L, huge).isEmpty)
    // size-0 ("to end") first box swallows everything incl. moov → no ftyp
    // payload mismatch handled: just assert no crash
    val zero = good.clone()
    zero(0) = 0; zero(1) = 0; zero(2) = 0; zero(3) = 0
    Mp4.parseMeta(1L, zero) // must return, Some or None, without throwing
    // payload-less boxes at buffer end: version-byte reads must be
    // guarded (ftyp + moov whose only child is an 8-byte mvhd)
    def u32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val emptyMvhd = u32(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isomxxxx".getBytes("US-ASCII") ++
      u32(16) ++ "moov".getBytes("US-ASCII") ++
      u32(8) ++ "mvhd".getBytes("US-ASCII")
    assert(Mp4.parseMeta(1L, emptyMvhd).isEmpty)
    // v1 mvhd with a duration whose ms conversion would overflow Long:
    // must be None, never a wrapped/negative duration
    val v1 = good.clone()
    val mvhdAt = v1.indices.sliding(4).find(i =>
      new String(v1.slice(i.head, i.head + 4), "US-ASCII") == "mvhd").get.head
    val payload = mvhdAt + 4
    v1(payload) = 1              // version 1: timescale at +20, duration be64 at +24
    v1(payload + 23) = 0x01      // timescale (low byte of +20..23) stays > 0
    v1(payload + 24) = 0x7f      // duration ≈ 9.2e18 > Long.MaxValue/1000
    assert(Mp4.parseMeta(1L, v1).isEmpty)
  }

  test("WAV windowed features: hand-derived RMS/ZCR/peak; tail dropped") {
    val id = 3L
    val blob = Multimodal.encodeSyntheticWav(id, 70) // windows of 32: 2 frames + tail 6
    val frames = Multimodal.wavFrameStats(id, blob, 32).get
    assert(frames.length == 2, "partial tail frame must drop")
    def s(i: Int): Long = ((13 * id + 31L * i) % 65536) - 32768
    frames.zipWithIndex.foreach { case (r, f) =>
      val w = (0 until 32).map(k => s(f * 32 + k))
      assert(r.getInt(1) == f)
      val rms = math.sqrt(w.map(x => x * x).sum.toDouble / 32)
      assert(r.getDouble(2) == math.floor(rms * 1e6 + 0.5) / 1e6, s"rms frame $f")
      val zcr = w.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(r.getLong(3) == zcr, s"zcr frame $f")
      assert(r.getLong(4) == w.map(math.abs).max, s"peak frame $f")
    }
    // corrupt input drops through the shared header walk
    assert(Multimodal.wavFrameStats(id, blob.take(30), 32).isEmpty)
    assert(Multimodal.wavFrameStats(id, Array.fill[Byte](64)(1), 32).isEmpty)
  }

  test("audio fingerprint: hand-derived bits, gain invariance, perturbation locality") {
    // local WAV builder over arbitrary samples (the library fixture is
    // formula-pinned)
    def wavOf(samples: Array[Int]): Array[Byte] = {
      val dataLen = samples.length * 2
      val b = new Array[Byte](44 + dataLen)
      def putStr(o: Int, s: String): Unit =
        s.zipWithIndex.foreach { case (c, i) => b(o + i) = c.toByte }
      def put32(o: Int, v: Int): Unit =
        (0 until 4).foreach(k => b(o + k) = ((v >> (8 * k)) & 0xff).toByte)
      def put16(o: Int, v: Int): Unit = {
        b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      }
      putStr(0, "RIFF"); put32(4, 36 + dataLen); putStr(8, "WAVE")
      putStr(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
      put32(24, 8000); put32(28, 16000); put16(32, 2); put16(34, 16)
      putStr(36, "data"); put32(40, dataLen)
      samples.zipWithIndex.foreach { case (s, i) => put16(44 + 2 * i, s & 0xffff) }
      b
    }
    def fps(samples: Array[Int]): Seq[Long] =
      Multimodal.audioFingerprint(1L, wavOf(samples), 45, 9).get.map(_.getLong(2))

    // hand-derived: 2 frames of 45; frame 0 all zeros, frame 1 has
    // energy 10·5=50 in band 0 only → d(f=1): band0−band1 = +50, others
    // 0; d(f=0) all 0 → double diff > 0 only at bit 0 → fp = 1
    val base = new Array[Int](90)
    (45 until 50).foreach(i => base(i) = 10)
    assert(fps(base) === Seq(1L))

    // gain invariance: scaling every sample by 3 scales all energies by
    // 3 — every double-difference keeps its sign, fingerprint identical
    val formula = (0 until 135).map(i => ((7 * i * i + 3 * i) % 2000) - 1000).toArray
    assert(fps(formula) === fps(formula.map(_ * 3)))

    // perturbation locality: one sample touches ONE (frame, band) energy
    // → at most bands b−1,b of frames f and f+1 flip → hamming ≤ 4
    val pert = formula.clone(); pert(50) += 40
    val h = fps(formula).zip(fps(pert))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(h <= 4, s"one-sample perturbation flipped $h bits")

    // contract: window not divisible by bands → None; < 2 frames → empty
    assert(Multimodal.audioFingerprint(1L, wavOf(base), 40, 9).isEmpty)
    assert(Multimodal.audioFingerprint(1L, wavOf(base.take(80)), 45, 9).get.isEmpty)
    // corrupt input drops through the shared header walk
    assert(Multimodal.audioFingerprint(1L, wavOf(base).take(30), 45, 9).isEmpty)
  }

  test("MP4 frame sampling reads real sample tables; rejects inconsistent ones") {
    import graft.operators.Mp4
    val id = 13L // nF = 5 + 13%6 = 6
    val blob = Mp4.encodeSyntheticFrames(id)
    // everyN=1: all frames, fields from the formula, byte sums over the
    // ACTUAL mdat ranges
    val all = Mp4.sampleFrames(id, blob, 1).get
    assert(all.length == 6)
    all.zipWithIndex.foreach { case (r, i) =>
      val size = 50 + ((id + 17L * i) % 100)
      assert(r.getInt(1) == i && r.getLong(2) == i * 100L)
      assert(r.getLong(3) == size, s"size frame $i")
      assert(r.getLong(4) == size * ((id + 7L * i) % 256), s"sum frame $i")
    }
    // everyN=2 halves the emission, keeping even indices
    assert(Mp4.sampleFrames(id, blob, 2).get.map(_.getInt(1)) == Seq(0, 2, 4))
    // metadata-only stream (no stbl): None, not a crash
    assert(Mp4.sampleFrames(id,
      Mp4.encodeSynthetic(1000L, 32, 32, withAudio = false), 1).isEmpty)
    // truncation anywhere (header, tables, mdat) must be None
    Seq(10, 40, blob.length / 2, blob.length - 4).foreach { cut =>
      assert(Mp4.sampleFrames(id, blob.take(cut), 1).isEmpty, s"cut=$cut")
    }
    // stco pointing outside the blob: byte range check must reject
    val bad = blob.clone()
    val stcoAt = bad.indices.sliding(4).find(i =>
      new String(bad.slice(i.head, i.head + 4), "US-ASCII") == "stco").get.head
    // offset field = payload(ver/flags 4 + count 4) + 8 past the fourcc
    val offAt = stcoAt + 4 + 8
    bad(offAt) = 0x7f; bad(offAt + 1) = 0xff.toByte
    assert(Mp4.sampleFrames(id, bad, 1).isEmpty)
  }

  test("JPEG decoder rejects corrupt and unsupported input, never crashes") {
    val good = Multimodal.encodeSyntheticJpeg(5L, 40, 24)
    assert(Jpeg.decodeStats(5L, good).isDefined)
    // truncations that remove real header or entropy data must fail (a
    // cut that only drops the trailing EOI is legitimately decodable —
    // all MCUs are present — so cuts are placed in headers and mid-scan)
    val sosAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    Seq(1, 2, 10, 40, sosAt / 2, sosAt, sosAt + 16).foreach { cut =>
      assert(Jpeg.decodeStats(5L, good.take(cut)).isEmpty, s"cut=$cut")
    }
    // not a JPEG at all
    assert(Jpeg.decodeStats(5L, Array.emptyByteArray).isEmpty)
    assert(Jpeg.decodeStats(5L, Array.fill[Byte](100)(3)).isEmpty)
    // progressive (SOF2) must be rejected, not mis-decoded: flip SOF0→SOF2
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeStats(5L, prog).isEmpty)
    // hostile dims: SOF claiming > MaxStatPixels rejected before any work
    val huge = good.clone()
    val sofSeg = sofAt + 4 // marker + len
    huge(sofSeg + 1) = 0x7f; huge(sofSeg + 2) = 0xff.toByte // h = 32767
    huge(sofSeg + 3) = 0x7f; huge(sofSeg + 4) = 0xff.toByte // w = 32767
    assert(Jpeg.decodeStats(5L, huge).isEmpty)
    // dims UNDER the pixel cap but absurd for the blob size: the ≥2-bits-
    // per-block entropy bound must reject before any allocation or MCU
    // work (16128×16128 = 2.6e8 px ≈ 4M MCUs from a ~700-byte blob)
    val plausible = good.clone()
    plausible(sofSeg + 1) = 0x3f; plausible(sofSeg + 2) = 0x00 // h = 16128
    plausible(sofSeg + 3) = 0x3f; plausible(sofSeg + 4) = 0x00 // w = 16128
    assert(Jpeg.decodeStats(5L, plausible).isEmpty)
    // truncated SEGMENTS (not just truncated blobs): an SOF0/SOS whose
    // declared length is shorter than its fixed header must be None, not
    // an out-of-bounds read
    assert(Jpeg.decodeStats(5L,
      Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02).map(_.toByte)).isEmpty)
    assert(Jpeg.decodeStats(5L,
      Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)).isEmpty)
  }

  test("BMP resize: identity under maxSide, exact NN sampling over it") {
    // identity: a 8×7 image inside maxSide=8 must resize to itself —
    // stats equal the plain decode's
    val small = Multimodal.encodeSyntheticBmp(9L, 8, 7)
    assert(Multimodal.resizeBmpStats(9L, small, 8) ==
      Multimodal.decodeBmpStats(9L, small))
    // downscale: 16×8 → 8×4; NN sample (ox,oy) reads source
    // (ox·16/8, oy·8/4) = (2ox, 2oy) — re-derive the stats by formula
    val id = 5L
    val blob = Multimodal.encodeSyntheticBmp(id, 16, 8)
    val r = Multimodal.resizeBmpStats(id, blob, 8).get
    assert(r.getInt(1) == 8 && r.getInt(2) == 4 && r.getLong(3) == 32L)
    def chan(m: Long, k: Long, si: Long) = (m * id + k * si) % 256
    val sis = for (oy <- 0 until 4; ox <- 0 until 8)
      yield (2L * oy) * 16 + 2L * ox
    assert(r.getDouble(4) == sis.map(chan(3, 7, _)).sum.toDouble / 32)
    assert(r.getDouble(6) == sis.map(chan(1, 3, _)).sum.toDouble / 32)
    assert(r.getLong(7) ==
      sis.zipWithIndex.map { case (si, i) => i.toLong * chan(3, 7, si) }.sum)
    // corrupt input drops through the shared header validation
    assert(Multimodal.resizeBmpStats(id, blob.take(20), 8).isEmpty)
    assert(Multimodal.resizeBmpStats(id, Array.fill[Byte](64)(3), 8).isEmpty)
  }

  test("GIF: fixture decodes to the exact formula stats (incl. interlace)") {
    import graft.operators.Gif
    // ids cover padding-free and padded dims, interlaced (id%3==0) and
    // sequential storage, and the 9→10-bit LZW width boundary (dims up to
    // 20×13 = 260 px > 254 dictionary adds)
    for (id <- Seq(0L, 1L, 2L, 5L, 9L, 12L, 39L, 77L, 111L)) {
      val w = 8 + (id % 13).toInt; val h = 8 + (id % 6).toInt
      val blob = Gif.encodeSynthetic(id, w, h, interlaced = id % 3 == 0)
      val r = Gif.decodeStats(id, blob).get
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getLong(3) == w.toLong * h)
      val n = w.toLong * h
      def v(i: Long): Long = (5 * id + 7 * i) % 256
      assert(r.getDouble(4) == (0L until n).map(v).sum.toDouble / n, s"mean_r id=$id")
      assert(r.getDouble(5) == (0L until n).map(i => (2 * v(i)) % 256).sum.toDouble / n)
      assert(r.getDouble(6) == (0L until n).map(i => (3 * v(i)) % 256).sum.toDouble / n)
      assert(r.getLong(7) == (0L until n).map(i => i * v(i)).sum, s"weighted id=$id")
    }
    // interlaced and sequential encodings of the SAME image must agree —
    // the de-interlace row mapping is load-bearing, not cosmetic
    val a = Gif.decodeStats(4L, Gif.encodeSynthetic(4L, 17, 11, interlaced = false)).get
    val b = Gif.decodeStats(4L, Gif.encodeSynthetic(4L, 17, 11, interlaced = true)).get
    assert(a == b)
  }

  test("GIF: LZW survives width growth to 12 bits, 4096 reset, KwKwK runs") {
    import graft.operators.Gif
    // pseudo-random indices compress badly: the dictionary fills through
    // 9/10/11/12-bit widths and hits the 4096 clear-and-reset path
    val rnd = new java.util.Random(42)
    val w = 300; val h = 200
    val idx = Array.fill(w * h)(rnd.nextInt(256))
    val r = Gif.decodeStats(99L, Gif.encodeIndexed(idx, w, h, interlaced = false)).get
    assert(r.getDouble(4) == idx.map(_.toLong).sum.toDouble / (w * h))
    assert(r.getLong(7) == idx.zipWithIndex.map { case (v, i) => i.toLong * v }.sum)
    // an all-same run is a pure KwKwK chain (every code is the
    // just-defined entry)
    val same = Array.fill(400)(5)
    val s = Gif.decodeStats(1L, Gif.encodeIndexed(same, 20, 20, interlaced = false)).get
    assert(s.getDouble(4) == 5.0 && s.getDouble(5) == 10.0 && s.getDouble(6) == 15.0)
    // long repeats exercise multi-byte dictionary entries and the
    // budget-exact stop
    val rep = Array.tabulate(5000)(i => (i / 37) % 3)
    val t = Gif.decodeStats(7L, Gif.encodeIndexed(rep, 100, 50, interlaced = false)).get
    assert(t.getLong(7) == rep.zipWithIndex.map { case (v, i) => i.toLong * v }.sum)
  }

  test("GIF animation metadata: frames, GCE delays, NETSCAPE loops") {
    import graft.operators.Gif
    val id = 7L // nFrames = 2 + 7%4 = 5, loops = 7%3 = 1
    val blob = Gif.encodeSyntheticAnim(id, 5, 1)
    val r = Gif.parseAnimMeta(id, blob).get
    assert(r.getInt(1) == 4 && r.getInt(2) == 4)
    assert(r.getInt(3) == 5)
    val expMs = (0 until 5).map(f => 10L * (5 + (id + f) % 10)).sum
    assert(r.getLong(4) == expMs, s"duration ${r.getLong(4)} vs $expMs")
    assert(r.getLong(5) == 1L)
    // a single-image, extension-less GIF: 1 frame, 0 duration, loops -1
    val still = Gif.encodeSynthetic(3L, 10, 8)
    val sr = Gif.parseAnimMeta(3L, still).get
    assert(sr.getInt(3) == 1 && sr.getLong(4) == 0L && sr.getLong(5) == -1L)
    // the FIRST frame still decodes through the stats path (animation
    // parse and pixel decode agree on the container walk)
    assert(Gif.decodeStats(id, blob).isDefined)
    // truncations fail cleanly — including dropping ONLY the trailer
    Seq(4, 12, 800, blob.length - 3, blob.length - 1).foreach { cut =>
      assert(Gif.parseAnimMeta(id, blob.take(cut)).isEmpty, s"cut=$cut")
    }
    // a stray trailing GCE (no image follows) must not inflate duration:
    // splice one in before the trailer
    val stray = blob.dropRight(1) ++
      Array[Byte](0x21.toByte, 0xf9.toByte, 4, 0, 99, 0, 0, 0, 0x3b.toByte)
    val sr2 = Gif.parseAnimMeta(id, stray).get
    assert(sr2.getLong(4) == expMs && sr2.getInt(3) == 5,
      "stray GCE must not add duration or frames")
  }

  test("GIF decoder rejects corrupt and hostile input, never hangs") {
    import graft.operators.Gif
    val good = Gif.encodeSynthetic(5L, 18, 12, interlaced = false)
    assert(Gif.decodeStats(5L, good).isDefined)
    // truncations: header, palette, mid-LZW, lost terminator
    Seq(1, 6, 12, 100, 700, good.length - 10).foreach { cut =>
      assert(Gif.decodeStats(5L, good.take(cut)).isEmpty, s"cut=$cut")
    }
    assert(Gif.decodeStats(5L, Array.emptyByteArray).isEmpty)
    assert(Gif.decodeStats(5L, Array.fill[Byte](64)(7)).isEmpty)
    // hostile dims: header claims 65535×65535 (> MaxStatPixels) — must be
    // rejected before any LZW work
    val huge = good.clone()
    huge(6) = 0xff.toByte; huge(7) = 0xff.toByte
    huge(8) = 0xff.toByte; huge(9) = 0xff.toByte
    // logical screen is metadata only; the IMAGE descriptor dims drive
    // decode — patch those too (offset 13 + 768 palette + 5 into 0x2C)
    val imgAt = 13 + 768
    assert((good(imgAt) & 0xff) == 0x2c)
    huge(imgAt + 5) = 0xff.toByte; huge(imgAt + 6) = 0xff.toByte
    huge(imgAt + 7) = 0xff.toByte; huge(imgAt + 8) = 0xff.toByte
    assert(Gif.decodeStats(5L, huge).isEmpty)
    // out-of-range LZW code: first code references a not-yet-defined
    // dictionary entry (300 > next=258) — None, not garbage pixels
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, imgAt + 10) // header + palette + descriptor
    out.write(8)                   // min code size
    out.write(2); out.write(0x2c); out.write(0x01) // 9-bit code 300
    out.write(0)                   // sub-block terminator
    out.write(0x3b)
    assert(Gif.decodeStats(5L, out.toByteArray).isEmpty)
    // trailer before any image data
    val noImg = good.take(13 + 768) :+ 0x3b.toByte
    assert(Gif.decodeStats(5L, noImg).isEmpty)
  }

  test("progressive JPEG DC scan: preview matches a local reference; hostile input rejected") {
    // general (non-constant) content, both Al values, non-8-aligned dims:
    // the decoded preview must equal a local recomputation of
    // round((round(Σ(x−128)/8) >> al << al) / 8) + 128 per block
    for ((w, h, al, seed) <- Seq((13, 9, 0, 1L), (24, 16, 1, 2L), (8, 8, 3, 3L))) {
      val rnd = new java.util.Random(seed)
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val blob = Jpeg.encodeGrayProgressiveDc(pix, w, h, al)
      val st = Jpeg.decodeProgressiveDcStats(7L, blob)
        .getOrElse(fail(s"decode failed w=$w h=$h al=$al"))
      assert(st.getInt(1) == w && st.getInt(2) == h)
      var sum = 0L; var wr = 0L
      val mcuW = (w + 7) / 8; val mcuH = (h + 7) / 8
      for (my <- 0 until mcuH; mx <- 0 until mcuW) {
        var s = 0L
        for (y <- 0 until 8; x <- 0 until 8)
          s += pix(math.min(h - 1, my * 8 + y) * w + math.min(w - 1, mx * 8 + x)) - 128
        val dc = (math.round(s / 8.0).toInt >> al) << al
        val v = math.max(0, math.min(255, math.round(dc / 8.0).toInt + 128))
        for (y <- my * 8 until math.min(h, my * 8 + 8);
             x <- mx * 8 until math.min(w, mx * 8 + 8)) {
          sum += v; wr += (y.toLong * w + x) * v
        }
      }
      val n = (w * h).toLong
      assert(st.getDouble(4) == sum.toDouble / n, s"mean w=$w h=$h al=$al")
      assert(st.getLong(7) == wr, s"weighted w=$w h=$h al=$al")
    }
    // a BASELINE file is not progressive — rejected, and vice versa the
    // baseline decoder already rejects SOF2 (hostile-input tests above)
    val base = Multimodal.encodeSyntheticJpeg(4L, 16, 8)
    assert(Jpeg.decodeProgressiveDcStats(4L, base).isEmpty)
    val prog = Multimodal.encodeSyntheticProgressiveJpeg(4L, 16, 8)
    assert(Jpeg.decodeStats(4L, prog).isEmpty, "baseline path must reject SOF2")
    // truncated mid-scan entropy data → None, never garbage stats
    val cut = prog.take(prog.length - 6).toArray
    assert(Jpeg.decodeProgressiveDcStats(4L, cut).isEmpty)
    // hostile table ids index 4-slot arrays: SOF2 Tq=7 and SOS Td=7 must
    // be None, never ArrayIndexOutOfBounds
    val tqBad = prog.clone()
    assert((tqBad(83) & 0xff) <= 3, "fixture layout: Tq byte moved")
    tqBad(83) = 7
    assert(Jpeg.decodeProgressiveDcStats(4L, tqBad).isEmpty)
    def sosAt(b: Array[Byte]): Int =
      (0 until b.length - 1).find(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda).get
    // COLOR (3-component 4:4:4) progressive: interleaved DC scan with
    // per-component predictors, YCbCr preview → RGB — reference-checked
    locally {
      val (w, h, al) = (24, 16, 1)
      val rnd = new java.util.Random(9L)
      val yP = Array.fill(w * h)(rnd.nextInt(256))
      val cbP = Array.fill(w * h)(rnd.nextInt(256))
      val crP = Array.fill(w * h)(rnd.nextInt(256))
      val blob = Jpeg.encodeYcc444ProgressiveDc(yP, cbP, crP, w, h, al)
      val st = Jpeg.decodeProgressiveDcStats(3L, blob).getOrElse(fail("color decode"))
      var sumR = 0L
      def blockMean(p: Array[Int], my: Int, mx: Int): Int = {
        var s = 0L
        for (y <- 0 until 8; x <- 0 until 8)
          s += p(math.min(h - 1, my * 8 + y) * w + math.min(w - 1, mx * 8 + x)) - 128
        (math.round(s / 8.0).toInt >> al) << al
      }
      for (my <- 0 until h / 8; mx <- 0 until w / 8) {
        val yv = math.round(blockMean(yP, my, mx) / 8.0).toDouble + 128.0
        val cb = math.round(blockMean(cbP, my, mx) / 8.0).toDouble
        val cr = math.round(blockMean(crP, my, mx) / 8.0).toDouble
        val r = math.max(0, math.min(255, math.round(yv + 1.402 * cr).toInt))
        sumR += r.toLong * 64
      }
      assert(st.getDouble(4) == sumR.toDouble / (w * h), "color mean_r")
    }
    // SOS layout: FF DA | len(2) | ns | comp id | tables byte
    val tdBad = prog.clone()
    tdBad(sosAt(tdBad) + 6) = 0x70 // comp 1's Td nibble → 7
    assert(Jpeg.decodeProgressiveDcStats(4L, tdBad).isEmpty)
    val baseBad = base.clone()
    baseBad(sosAt(baseBad) + 6) = 0x77 // baseline Td=7/Ta=7
    assert(Jpeg.decodeStats(4L, baseBad).isEmpty)
  }

  test("MJPEG: a demuxed frame decodes identically to the same JPEG as a still") {
    for (id <- Seq(0L, 3L, 7L, 11L, 22L)) {
      val blob = Mp4.encodeSyntheticMjpeg(id)
      val nF = (3 + id % 4).toInt
      val w = 8 * (1 + (id % 5).toInt)
      val h = 8 * (1 + (id % 3).toInt)
      // everyN = 1: every frame decodes
      val frames = Mp4.mjpegFrames(id, blob, 1).get
      assert(frames.size == nF, s"id=$id expected $nF frames, got ${frames.size}")
      frames.zipWithIndex.foreach { case (fr, i) =>
        // the same JPEG bytes decoded as a standalone still
        val still = Jpeg.decodeStats(id,
          Multimodal.encodeSyntheticJpeg(id + 13L * i, w, h)).get
        assert(fr.getInt(1) == i && fr.getLong(2) == i * 100L)
        assert(fr.getInt(3) == still.getInt(1) && fr.getInt(4) == still.getInt(2))
        assert(fr.getLong(5) == still.getLong(3))
        assert(fr.getDouble(6) == still.getDouble(4) &&
          fr.getDouble(7) == still.getDouble(5) &&
          fr.getDouble(8) == still.getDouble(6))
        assert(fr.getLong(9) == still.getLong(7))
      }
    }
    // a corrupted individual frame drops alone; the rest still decode
    val id = 7L
    val blob = Mp4.encodeSyntheticMjpeg(id)
    val all = Mp4.mjpegFrames(id, blob, 1).get
    assert(all.size >= 2)
    // find the mdat payload (frame 0 starts right after 'mdat' header)
    val mdatAt = {
      var p = -1
      var i = 0
      while (p < 0 && i + 8 <= blob.length) {
        if (blob(i + 4) == 'm' && blob(i + 5) == 'd' && blob(i + 6) == 'a' &&
          blob(i + 7) == 't') p = i + 8
        i += 1
      }
      p
    }
    assert(mdatAt > 0)
    val bad = blob.clone()
    bad(mdatAt) = 0x00 // destroy frame 0's SOI marker
    val rest = Mp4.mjpegFrames(id, bad, 1).get
    assert(rest.size == all.size - 1, "only the corrupted frame drops")
    assert(rest.map(_.getInt(1)) == all.tail.map(_.getInt(1)))
  }
}
