package graft

import graft.operators.{Multimodal, Qoi, Tiff}

/** Baseline TIFF against the published 6.0 structure: a hand-built
  * big-endian stream pinned byte for byte, little-endian round trips
  * over strip layouts, unknown-tag skip, the loud-failure arms, and
  * the cross-format dHash invariant.
  */
class TiffSpec extends SparkSpec {

  private def rgb(r: Int, g: Int, b: Int): Int =
    (0xff << 24) | (r << 16) | (g << 8) | b

  test("hand-built big-endian (MM) gray file decodes") {
    def be16(v: Int) = Seq((v >> 8) & 0xff, v & 0xff)
    def be32(v: Int) = Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    def entry(tag: Int, typ: Int, cnt: Int, value: Seq[Int]) =
      be16(tag) ++ be16(typ) ++ be32(cnt) ++ value
    val bytes = (Seq('M'.toInt, 'M'.toInt) ++ be16(42) ++ be32(8) ++
      be16(5) ++
      entry(256, 4, 1, be32(2)) ++ // width 2
      entry(257, 4, 1, be32(1)) ++ // height 1
      entry(262, 3, 1, be16(1) ++ Seq(0, 0)) ++ // BlackIsZero, left-justified SHORT
      entry(273, 4, 1, be32(74)) ++ // strip offset
      entry(279, 4, 1, be32(2)) ++ // strip bytes
      be32(0) ++ // no next IFD
      Seq(5, 200)).map(_.toByte).toArray
    val d = Tiff.decode(bytes).get
    assert((d.w, d.h, d.channels) == ((2, 1, 1)))
    assert(d.pixels.toSeq == Seq(rgb(5, 5, 5), rgb(200, 200, 200)))
  }

  test("little-endian round trips: RGB multi-strip and gray single-strip") {
    val px = Array.tabulate(5 * 7)(i => rgb((3 * i) % 256, (5 * i) % 256, (7 * i) % 256))
    for (rps <- Seq(1, 2, 7, 100)) {
      val d = Tiff.decode(Tiff.encode(5, 7, 3, px, rowsPerStrip = rps)).get
      assert((d.w, d.h, d.channels) == ((5, 7, 3)), s"rps=$rps")
      assert(d.pixels.toSeq == px.toSeq, s"rps=$rps")
    }
    val gray = Array.tabulate(6)(i => rgb(i * 40, i * 40, i * 40))
    val g = Tiff.decode(Tiff.encode(3, 2, 1, gray)).get
    assert(g.channels == 1 && g.pixels.toSeq == gray.toSeq)
    // the encoder plants unknown tag 0x9999 — every round trip above
    // already proves the reader skips it
  }

  test("structural corruption is loud; wrong magic routes to None") {
    assert(Tiff.decode("PK\u0003\u0004junkjunk".getBytes).isEmpty)
    val bad42 = Tiff.encode(2, 1, 3, Array(rgb(1, 2, 3), rgb(4, 5, 6)))
    bad42(2) = 43
    assert(Tiff.decode(bad42).isEmpty) // not-42 magic: not a TIFF at all
    val good = Tiff.encode(2, 2, 3, Array.fill(4)(rgb(9, 9, 9)))
    def boom(mutate: Array[Byte] => Unit) = {
      val b = good.clone(); mutate(b)
      intercept[IllegalArgumentException](Tiff.decode(b))
    }
    // entry 3 (ascending: 256,257,258,259,...) is Compression at
    // offset 8+2+12*3 = 46, SHORT value at 54
    assert(boom(b => b(54) = 5).getMessage.contains("compression"))
    // entry 5 is StripOffsets (273) at offset 70: retag as unknown
    assert(boom { b => b(70) = 0x98.toByte; b(71) = 0x99.toByte }
      .getMessage.contains("StripOffsets"))
    // next-IFD pointer at 8+2+120 = 130: non-zero = multi-page
    assert(boom(b => b(130) = 1).getMessage.contains("multi-page"))
    // truncated strip data
    assert(intercept[IllegalArgumentException](
      Tiff.decode(good.dropRight(3))).getMessage.contains("truncated"))
    // RowsPerStrip = 0 refuses, never an unguarded division
    // entry 8 (ascending tag order) is 278 at offset 8+2+12*7 = 94;
    // LONG value at 102
    assert(boom { b => b(102) = 0; b(103) = 0; b(104) = 0; b(105) = 0 }
      .getMessage.contains("RowsPerStrip"))
  }

  test("cross-format invariant: BMP, QOI and TIFF of one logical image hash equal") {
    (0L until 12L).foreach { id =>
      val w = 8 + (id % 9).toInt; val h = 8 + (id % 7).toInt
      val px = Multimodal.syntheticPixels(id, w, h)
      val viaBmp = Multimodal.imageDHash(Multimodal.encodeSyntheticBmp(id, w, h))
      val viaQoi = Multimodal.imageDHash(Qoi.encode(w, h, 3, px))
      val viaTiff = Multimodal.imageDHash(
        Tiff.encode(w, h, 3, px, rowsPerStrip = 1 + (id % 5).toInt))
      assert(viaBmp.isDefined && viaBmp == viaQoi && viaBmp == viaTiff, s"id=$id")
    }
  }
}
