package graft

import graft.operators.{Multimodal, Qoi}

/** QOI codec against the published qoiformat.org spec: a hand-derived
  * byte-level example, every chunk-op class targeted individually,
  * pseudo-random round trips, the loud-failure arms, and the
  * cross-format invariant (same logical image ⇒ same dHash through
  * BMP and QOI).
  */
class QoiSpec extends SparkSpec {

  private def rgb(r: Int, g: Int, b: Int, a: Int = 255): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  test("hand-derived example: 2x1 [(128,0,0) x2] = header + RGB + RUN(1)") {
    val px = Array(rgb(128, 0, 0), rgb(128, 0, 0))
    val enc = Qoi.encode(2, 1, 3, px)
    val expect = Array[Int](
      'q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 1, 3, 0, // header
      0xfe, 128, 0, 0, // QOI_OP_RGB (delta from (0,0,0) wraps out of range)
      0xc0, // QOI_OP_RUN, length 1 (bias -1)
      0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    assert(enc.toSeq == expect.toSeq)
    val dec = Qoi.decode(enc).get
    assert((dec.w, dec.h, dec.channels) == ((2, 1, 3)))
    assert(dec.pixels.toSeq == px.toSeq)
  }

  test("DIFF op: +1 blue from the (0,0,0,255) start state is one byte") {
    val px = Array(rgb(0, 0, 1))
    val enc = Qoi.encode(1, 1, 3, px)
    assert(enc.length == 14 + 1 + 8)
    assert((enc(14) & 0xc0) == 0x40) // 0b01 tag
    assert(Qoi.decode(enc).get.pixels.toSeq == px.toSeq)
  }

  test("LUMA op: dg=10, dr-dg=-1, db-dg=+1 is two bytes") {
    val px = Array(rgb(9, 10, 11))
    val enc = Qoi.encode(1, 1, 3, px)
    assert(enc.length == 14 + 2 + 8)
    assert(enc(14) == (0x80 | (10 + 32)).toByte)
    assert(enc(15) == (((-1 + 8) << 4) | (1 + 8)).toByte)
    assert(Qoi.decode(enc).get.pixels.toSeq == px.toSeq)
  }

  test("INDEX op: a revisited color comes back from its hash slot") {
    val a = rgb(200, 30, 90); val b = rgb(7, 77, 177)
    val px = Array(a, b, a)
    val enc = Qoi.encode(3, 1, 3, px)
    // third pixel must be a single index byte (0b00 tag)
    assert((enc(enc.length - 9) & 0xc0) == 0x00)
    assert(Qoi.decode(enc).get.pixels.toSeq == px.toSeq)
  }

  test("RUN op: caps at 62 and chains; decode restores the full run") {
    val px = Array.fill(101)(rgb(50, 60, 70))
    val enc = Qoi.encode(101, 1, 3, px)
    // first pixel (some op) + run(62) + run(38): two run bytes expected
    val runs = enc.drop(14).dropRight(8).filter(x => (x & 0xc0) == 0xc0 &&
      (x & 0xff) < 0xfe)
    assert(runs.length == 2)
    assert((runs(0) & 0x3f) == 61 && (runs(1) & 0x3f) == 37)
    assert(Qoi.decode(enc).get.pixels.toSeq == px.toSeq)
  }

  test("RGBA op on alpha change; channels=4 round trip") {
    val px = Array(rgb(1, 2, 3, 255), rgb(1, 2, 3, 128), rgb(9, 9, 9, 128))
    val enc = Qoi.encode(3, 1, 4, px)
    assert((enc(14 + 0) & 0xff) != 0xff) // first: alpha unchanged, not RGBA
    val dec = Qoi.decode(enc).get
    assert(dec.pixels.toSeq == px.toSeq)
  }

  test("pseudo-random round trip exercises mixed ops (RGB and RGBA)") {
    var seed = 12345L
    def next(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0x7fffffff).toInt }
    val px3 = Array.fill(500)(rgb(next() % 256, next() % 256, next() % 256))
    assert(Qoi.decode(Qoi.encode(20, 25, 3, px3)).get.pixels.toSeq == px3.toSeq)
    val px4 = Array.fill(500)(
      rgb(next() % 256, next() % 256, next() % 256, next() % 256))
    val dec4 = Qoi.decode(Qoi.encode(25, 20, 4, px4)).get
    assert(dec4.pixels.toSeq == px4.toSeq)
  }

  test("wrong magic routes to None; structural corruption is loud") {
    assert(Qoi.decode("nope".getBytes ++ new Array[Byte](20)).isEmpty)
    val good = Qoi.encode(2, 1, 3, Array(rgb(1, 2, 3), rgb(4, 5, 6)))
    def boom(b: Array[Byte]) =
      intercept[IllegalArgumentException](Qoi.decode(b))
    // truncated mid-stream
    assert(boom(good.dropRight(10)).getMessage.contains("truncated"))
    // chunk overruns the pixel count: 2x1 image, pixel 1 then a run of 2
    val overrun = Array[Int]('q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 1, 3, 0,
      0xfe, 1, 2, 3, 0xc1, 0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    assert(boom(overrun).getMessage.contains("overruns"))
    // garbled end marker
    val bad = good.clone(); bad(bad.length - 1) = 2
    assert(boom(bad).getMessage.contains("end marker"))
    // trailing junk after the marker
    assert(boom(good :+ 0.toByte).getMessage.contains("trailing"))
    // channels out of spec
    val ch = good.clone(); ch(12) = 5
    assert(boom(ch).getMessage.contains("channels"))
    // uint32 dims whose product wraps Long must refuse on the DIMS, not
    // decode one garbage pixel (per-dim guard precedes the multiply)
    val huge = good.clone()
    (4 until 12).foreach(i => huge(i) = 0xff.toByte)
    assert(boom(huge).getMessage.contains("dims"))
  }

  test("cross-format invariant: BMP and QOI of the same logical image hash equal") {
    (0L until 12L).foreach { id =>
      val w = 8 + (id % 9).toInt; val h = 8 + (id % 7).toInt
      val viaBmp = Multimodal.imageDHash(Multimodal.encodeSyntheticBmp(id, w, h))
      val viaQoi = Multimodal.imageDHash(
        Qoi.encode(w, h, 3, Multimodal.syntheticPixels(id, w, h)))
      assert(viaBmp.isDefined && viaBmp == viaQoi, s"id=$id")
    }
  }
}
