package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{HashExpressions, UrlFunctions}
import graft.operators.Gif

/** Seeded property sweeps (the NormalizeSpec pattern — scalacheck
  * generators with fixed seeds, so failures replay) over the round-7
  * primitives whose input space is much larger than their fixtures: the
  * GIF LZW codec, URL canonicalization, and CDC boundary detection.
  */
class RoundTripPropertySpec extends SparkSpec {

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def sample[A](g: Gen[A], n: Int, seedBase: Long = 0L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seedBase + i)))

  test("property: GIF LZW round-trips arbitrary index streams exactly") {
    val dims = Gen.zip(Gen.chooseNum(1, 90), Gen.chooseNum(1, 70),
      Gen.chooseNum(0L, Long.MaxValue))
    sample(dims, 40).foreach { case (w, h, seed) =>
      val rnd = new java.util.Random(seed)
      // mixture of random and runs — runs drive long dictionary entries
      // and KwKwK, randomness drives growth/reset
      val idx = new Array[Int](w * h)
      var i = 0
      while (i < idx.length) {
        if (rnd.nextInt(4) == 0) {
          val v = rnd.nextInt(256)
          val run = math.min(idx.length - i, 1 + rnd.nextInt(40))
          java.util.Arrays.fill(idx, i, i + run, v)
          i += run
        } else { idx(i) = rnd.nextInt(256); i += 1 }
      }
      val interlaced = (seed & 1) == 0 && h > 1
      val blob = Gif.encodeIndexed(idx, w, h,
        interlaced = interlaced)
      // stored order differs under interlace; expected stats come from
      // the LOGICAL pixel order the decoder must reconstruct
      val logical =
        if (!interlaced) idx
        else {
          val out = new Array[Int](idx.length)
          val rows = {
            val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
            val r = new Array[Int](h); var k = 0
            for (p <- 0 until 4) {
              var y = starts(p)
              while (y < h) { r(k) = y; k += 1; y += steps(p) }
            }
            r
          }
          for (sr <- 0 until h; x <- 0 until w)
            out(rows(sr) * w + x) = idx(sr * w + x)
          out
        }
      val r = Gif.decodeStats(1L, blob)
        .getOrElse(fail(s"decode failed w=$w h=$h seed=$seed"))
      assert(r.getLong(3) == w.toLong * h)
      assert(r.getDouble(4) == logical.map(_.toLong).sum.toDouble / (w * h),
        s"mean w=$w h=$h seed=$seed interlaced=$interlaced")
      assert(r.getLong(7) ==
        logical.zipWithIndex.map { case (v, j) => j.toLong * v }.sum,
        s"weighted w=$w h=$h seed=$seed interlaced=$interlaced")
    }
  }

  test("property: url_canonicalize is idempotent and total on generated URLs") {
    val label = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
    val url = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
      www <- Gen.oneOf("", "www.", "WWW.")
      h1 <- label; h2 <- label
      port <- Gen.oneOf("", ":80", ":443", ":8080", ":65535")
      segs <- Gen.listOfN(3, Gen.oneOf("A", "b", "C2", "index.html", ""))
      params <- Gen.someOf("a=1", "b=2", "utm_source=x", "gclid=9", "ref=main", "z")
      frag <- Gen.oneOf("", "#top", "#a/b")
      slash <- Gen.oneOf("", "/")
    } yield s"$scheme://$www$h1.$h2${port}/${segs.mkString("/")}$slash" +
      (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag
    sample(url, 300).foreach { u =>
      val once = UrlFunctions.canonicalize(UTF8String.fromString(u))
      assert(once != null, s"generated URL must canonicalize: $u")
      val twice = UrlFunctions.canonicalize(once)
      assert(twice == once, s"idempotence broken: $u -> $once -> $twice")
      val c = once.toString
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("gclid"),
        s"residual fragment/tracking in $c")
      assert(!c.endsWith("/") && !c.endsWith("?"), s"residual trailing sep in $c")
    }
  }

  test("property: cdcBounds agrees with brute-force window hashing") {
    val cfg = for {
      window <- Gen.chooseNum(2, 10)
      modulus <- Gen.oneOf(2, 4, 8, 16)
      minLen <- Gen.chooseNum(0, 6)
      len <- Gen.chooseNum(0, 300)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (window, modulus, minLen, len, seed)
    sample(cfg, 80).foreach { case (w, d, m, len, seed) =>
      val rnd = new java.util.Random(seed)
      val text = Array.fill(len)(('a' + rnd.nextInt(6)).toChar).mkString
      val got = {
        val arr = HashExpressions.cdcBounds(UTF8String.fromString(text), w, d, m)
        (0 until arr.numElements()).map(arr.getLong)
      }
      def rh(s: String): Long = {
        var h = s.head.toLong
        for (c <- s.tail) h = (h * 31 + c) % 1000000007L
        h
      }
      val cands = (w to len).filter(i => rh(text.substring(i - w, i)) % d == 0)
      val exp = cands.foldLeft(List(0L)) { (acc, i) =>
        if (i - acc.head >= m) i.toLong :: acc else acc
      }.reverse.tail
      assert(got == exp, s"w=$w d=$d m=$m len=$len seed=$seed: $got vs $exp")
    }
  }

  test("property: text_canonicalize is idempotent and collapse-invariant on generated text") {
    import graft.functions.TextFunctions
    def c(s: String): String =
      TextFunctions.canonicalize(UTF8String.fromString(s)).toString
    val gen = for {
      n <- Gen.chooseNum(0, 60)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar,
        2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'),
        1 -> Gen.oneOf('é', 'e', '\u0301', 'ß', 'Ω', 'İ'),
        1 -> Gen.oneOf('.', ',', '!', '-')))
    } yield cs.mkString
    sample(gen, 300, seedBase = 777L).foreach { s =>
      val once = c(s)
      assert(c(once) == once, s"not idempotent: ${s.getBytes("UTF-8").toSeq}")
      // collapse invariant: no doubled spaces, no framing whitespace, no
      // collapsible chars survive
      assert(!once.contains("  ") && once == once.trim,
        s"residual whitespace in ${once.getBytes("UTF-8").toSeq}")
      assert(!once.exists(ch => "\t\n\r\f\u000b".contains(ch)))
      // whitespace-run equivalence: any run maps like a single space
      assert(c(s.replace("\t", " \n ")) == once,
        s"collapse not run-invariant on ${s.getBytes("UTF-8").toSeq}")
    }
  }

  test("property: per-row band keys equal the batch pipeline on random corpora") {
    import org.apache.spark.sql.functions.{col, explode}
    import graft.operators.Dedup
    val spark2 = spark
    import spark2.implicits._
    val cfg = Gen.zip(Gen.chooseNum(4, 16), Gen.oneOf(3, 4, 5),
      Gen.chooseNum(0L, Long.MaxValue))
    // numHashes/rowsPerBand combos INCLUDING non-divisible (partial band)
    sample(cfg, 6, seedBase = 4242L).foreach { case (numHashes, rpb, seed) =>
      val rnd = new java.util.Random(seed)
      val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      val docs = (0 until 12).map { i =>
        val n = rnd.nextInt(9) // 0..8 words — includes sub-k docs
        (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val batch = Dedup.bandKeys(
          Dedup.minhashSignatures(
            Dedup.shingles(docs, "doc_id", "text", 3), "doc_id", numHashes),
          "doc_id", rpb)
        .select(col("doc_id"), col("band").cast("int"), col("bkey"))
        .as[(Long, Int, String)].collect().toSet
      val perRow = docs.select(col("doc_id"),
          explode(Dedup.rowBandKeys(col("text"), 3, numHashes, rpb)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.bkey"))
        .as[(Long, Int, String)].collect().toSet
      assert(perRow == batch,
        s"numHashes=$numHashes rpb=$rpb seed=$seed:\nperRow=$perRow\nbatch=$batch")
    }
  }

  test("property: JPEG 4:2:0 decode matches an independent scalar DCT reference within ±1") {
    import graft.operators.Jpeg
    // Independent reference: the T.81 A.3.3 DCT-II / inverse as DIRECT
    // O(64²) cosine sums — no shared code with the codec's fdct/idct —
    // replaying the pipeline semantics: level-shift, forward, q=1
    // round-quantize (with the encoder's Annex-K AC clamp), inverse,
    // +128, clamp. Entropy coding is exactness-preserving, so any
    // decoded pixel farther than ±1 from this reference means a real
    // zigzag/Huffman/predictor/MCU-layout/IDCT bug.
    def refRoundTrip(plane: Array[Int], w: Int, h: Int): Array[Int] = {
      val out = new Array[Int](w * h)
      val pi = math.Pi
      val f = Array.ofDim[Double](8, 8)
      val q = Array.ofDim[Int](8, 8)
      var by = 0
      while (by < h) {
        var bx = 0
        while (bx < w) {
          for (y <- 0 until 8; x <- 0 until 8)
            f(y)(x) = plane((by + y) * w + (bx + x)).toDouble - 128.0
          for (v <- 0 until 8; u <- 0 until 8) {
            var s = 0.0
            for (y <- 0 until 8; x <- 0 until 8)
              s += f(y)(x) * math.cos((2 * x + 1) * u * pi / 16) *
                math.cos((2 * y + 1) * v * pi / 16)
            val cu = if (u == 0) 1 / math.sqrt(2.0) else 1.0
            val cv = if (v == 0) 1 / math.sqrt(2.0) else 1.0
            val c = math.round(cu * cv * s / 4.0).toInt
            q(v)(u) =
              if (u == 0 && v == 0) c
              else math.max(-1023, math.min(1023, c))
          }
          for (y <- 0 until 8; x <- 0 until 8) {
            var s = 0.0
            for (v <- 0 until 8; u <- 0 until 8) {
              val cu = if (u == 0) 1 / math.sqrt(2.0) else 1.0
              val cv = if (v == 0) 1 / math.sqrt(2.0) else 1.0
              s += cu * cv * q(v)(u) * math.cos((2 * x + 1) * u * pi / 16) *
                math.cos((2 * y + 1) * v * pi / 16)
            }
            val px = math.round(s / 4.0 + 128.0).toInt
            out((by + y) * w + (bx + x)) = math.max(0, math.min(255, px))
          }
          bx += 8
        }
        by += 8
      }
      out
    }
    val cfg = Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(1, 2),
      Gen.chooseNum(0L, Long.MaxValue))
    sample(cfg, 10, seedBase = 420L).foreach { case (wb, hb, seed) =>
      val w = 16 * wb; val h = 16 * hb
      val cw = w / 2; val ch = h / 2
      val rnd = new java.util.Random(seed)
      // gradients + noise + flat runs: DC-dominant regions AND busy AC
      def genPlane(n: Int, pw: Int): Array[Int] = Array.tabulate(n) { i =>
        rnd.nextInt(3) match {
          case 0 => (i % pw) * 255 / math.max(1, pw - 1)
          case 1 => rnd.nextInt(256)
          case _ => 128
        }
      }
      val yP = genPlane(w * h, w)
      val cbP = genPlane(cw * ch, cw)
      val crP = genPlane(cw * ch, cw)
      val blob = Jpeg.encodeYcc420(yP, cbP, crP, w, h)
      val (dw, dh, nc, planes) = Jpeg.decode(blob)
        .getOrElse(fail(s"decode failed: w=$w h=$h seed=$seed"))
      assert(dw == w && dh == h && nc == 3)
      val refY = refRoundTrip(yP, w, h)
      val refCb = refRoundTrip(cbP, cw, ch)
      val refCr = refRoundTrip(crP, cw, ch)
      var py = 0
      while (py < h) {
        var px = 0
        while (px < w) {
          val i = py * w + px
          val ci = (py / 2) * cw + (px / 2) // decoder NN chroma upsampling
          assert(math.abs(planes(0)(i) - refY(i)) <= 1,
            s"Y($px,$py) ${planes(0)(i)} vs ${refY(i)} w=$w h=$h seed=$seed")
          assert(math.abs(planes(1)(i) - refCb(ci)) <= 1,
            s"Cb($px,$py) ${planes(1)(i)} vs ${refCb(ci)} w=$w h=$h seed=$seed")
          assert(math.abs(planes(2)(i) - refCr(ci)) <= 1,
            s"Cr($px,$py) ${planes(2)(i)} vs ${refCr(ci)} w=$w h=$h seed=$seed")
          px += 1
        }
        py += 1
      }
    }
  }

  test("property: APNG compositing matches an independent reference on random frame stacks") {
    // 30 seeded random APNGs: random canvas, 1-5 frames with random
    // rectangles, random dispose (NONE/BACKGROUND/PREVIOUS) and blend
    // (SOURCE/OVER) ops, RGBA pixels with alphas spanning 0/partial/255.
    // Expected canvases come from an INDEPENDENT straight-line
    // compositor over raw pixel arrays (no chunks, no deflate, no
    // filters) — so a bug anywhere in the container walk, sequence
    // numbers, per-frame inflate/unfilter, or region bookkeeping breaks
    // byte equality. The blend/dispose FORMULAS are shared with the
    // decoder by design (independently pinned by ApngSpec's
    // hand-derived OVER case: (100,0,0,102) over (0,200,0,255) →
    // (40,120,0,255)); what this sweep adds is the ordering and
    // region-arithmetic coverage across random dispose/blend stacks.
    // Per-trial seeds: a failing trial replays alone.
    import graft.operators.Apng
    (1 to 30).foreach { trial =>
      val rnd = new scala.util.Random(5000L + trial)
      val w = 3 + rnd.nextInt(16); val h = 3 + rnd.nextInt(12)
      val nF = 1 + rnd.nextInt(5)
      val frames = (0 until nF).map { k =>
        val (fw, fh, fx, fy) =
          if (k == 0) (w, h, 0, 0) // IDAT frame must cover the canvas
          else {
            val fw = 1 + rnd.nextInt(w); val fh = 1 + rnd.nextInt(h)
            (fw, fh, rnd.nextInt(w - fw + 1), rnd.nextInt(h - fh + 1))
          }
        val pix = Array.fill(4 * fw * fh)(0.toByte)
        (0 until fw * fh).foreach { i =>
          pix(4 * i) = rnd.nextInt(256).toByte
          pix(4 * i + 1) = rnd.nextInt(256).toByte
          pix(4 * i + 2) = rnd.nextInt(256).toByte
          pix(4 * i + 3) = (rnd.nextInt(6) * 51).toByte // 0,51,...,255
        }
        Apng.FrameSpec(fw, fh, fx, fy, rnd.nextInt(3), rnd.nextInt(2), pix)
      }
      val blob = Apng.encodeApng(trial.toLong, w, h, frames, colorType = 6)
      val (gw, gh, got) = Apng.decodeApngCanvases(blob)
        .getOrElse(fail(s"trial $trial: decode returned None"))
      assert(gw == w && gh == h && got.size == nF)

      // independent reference compositor
      val canvas = Array.fill(4 * w * h)(0.toByte)
      var saved: Array[Byte] = null
      val expect = Seq.newBuilder[Array[Byte]]
      frames.zipWithIndex.foreach { case (f, k) =>
        if (k > 0) {
          val p = frames(k - 1)
          val d = if (k - 1 == 0 && p.dispose == 2) 1 else p.dispose
          if (d == 1)
            for (yy <- 0 until p.h; xx <- 0 until p.w; c <- 0 until 4)
              canvas(4 * ((p.y + yy) * w + p.x + xx) + c) = 0
          else if (d == 2)
            for (yy <- 0 until p.h; xx <- 0 until p.w; c <- 0 until 4)
              canvas(4 * ((p.y + yy) * w + p.x + xx) + c) = saved(4 * (yy * p.w + xx) + c)
        }
        if (f.dispose == 2 && k != 0) {
          saved = new Array[Byte](4 * f.w * f.h)
          for (yy <- 0 until f.h; xx <- 0 until f.w; c <- 0 until 4)
            saved(4 * (yy * f.w + xx) + c) = canvas(4 * ((f.y + yy) * w + f.x + xx) + c)
        } else saved = null
        for (yy <- 0 until f.h; xx <- 0 until f.w) {
          val s = 4 * (yy * f.w + xx)
          val dOff = 4 * ((f.y + yy) * w + (f.x + xx))
          val sa = f.pix(s + 3) & 0xff
          if (f.blend == 0 || sa == 255) (0 until 4).foreach(c => canvas(dOff + c) = f.pix(s + c))
          else if (sa != 0) {
            val da = canvas(dOff + 3) & 0xff
            val outA = sa + da * (255 - sa) / 255.0
            (0 until 3).foreach { c =>
              val v = ((f.pix(s + c) & 0xff) * sa +
                (canvas(dOff + c) & 0xff) * da * (255 - sa) / 255.0) / outA
              canvas(dOff + c) = math.floor(v + 0.5).toInt.toByte
            }
            canvas(dOff + 3) = math.floor(outA + 0.5).toInt.toByte
          }
        }
        expect += canvas.clone()
      }
      expect.result().zip(got).zipWithIndex.foreach { case ((e, g), k) =>
        assert(java.util.Arrays.equals(e, g), s"trial $trial frame $k differs")
      }
    }
  }
}
