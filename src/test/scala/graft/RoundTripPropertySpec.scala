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
}
