package graft

import graft.operators.Winnow

/** [[Winnow]] — selection equals the brute-force per-window
  * argmin-rightmost definition, the MOSS match guarantee holds, and the
  * df-capped matcher finds planted plagiarism while dropping
  * corpus-wide boilerplate.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: every full window's minimum, rightmost
    * among ties, distinct — the SIGMOD 2003 definition verbatim.
    */
  private def bruteWinnow(s: String, k: Int, w: Int): Set[(Int, String)] = {
    val g = s.length - k + 1
    if (g < w) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Int): Long = {
      md.reset()
      val d = md.digest(s.substring(i, i + k).getBytes("UTF-8"))
      (d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))) >>> 4
    }
    val hs = (0 until g).map(h)
    (0 to g - w).map { q =>
      val win = (q until q + w)
      val mn = win.map(hs).min
      val sel = win.filter(i => hs(i) == mn).max
      (sel + 1, s.substring(sel, sel + k))
    }.toSet
  }

  test("deque winnow equals the brute-force window definition on random strings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 40) {
      // tiny alphabet → plenty of equal k-grams → the tie rule is exercised
      val s = (1 to (20 + rnd.nextInt(120))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val k = 2 + rnd.nextInt(3)
      val w = 2 + rnd.nextInt(4)
      val got = Winnow.winnow(s, k, w).map(t => (t._1, t._3)).toSet
      assert(got == bruteWinnow(s, k, w), s"trial $trial k=$k w=$w s=$s")
    }
  }

  test("fingerprint positions carry the true gram and hashes are the sqlHash60 of it") {
    val s = "abcabcababab"
    for ((p, h, gr) <- Winnow.winnow(s, 3, 3)) {
      assert(gr == s.substring(p - 1, p - 1 + 3))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gr.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      assert(h == java.lang.Long.parseLong(hex, 16))
    }
  }

  test("MOSS guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    val k = 5; val w = 4
    for (trial <- 1 to 20) {
      def junk(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val shared = junk(w + k - 1) // exactly the guarantee threshold
      val d1 = junk(30) + shared + junk(30)
      val d2 = junk(45) + shared + junk(15)
      val f1 = Winnow.winnow(d1, k, w).map(_._3).toSet
      val f2 = Winnow.winnow(d2, k, w).map(_._3).toSet
      val common = f1 & f2
      assert(common.exists(shared.contains),
        s"trial $trial: no fingerprint from the shared run survived")
    }
  }

  test("documents shorter than w k-grams yield no fingerprints") {
    assert(Winnow.winnow("abcd", 3, 3).isEmpty) // 2 grams < w
    assert(Winnow.winnow("ab", 3, 2).isEmpty)   // shorter than k
  }

  test("matches() finds planted plagiarism, drops boilerplate above maxDf, verifies grams") {
    val boiler = "copyrightallrightsreserved2024"
    val plag = "thequickbrownfoxjumpsoverthelazydog"
    def noise(seed: Int) = {
      val r = new scala.util.Random(seed)
      (1 to 80).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    // all 12 docs share the boilerplate run; only 1 and 2 share the plag run
    val docs = (1L to 12L).map { i =>
      val extra = if (i <= 2) plag else ""
      (i, noise(i.toInt) + boiler + extra + noise(100 + i.toInt))
    }.toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 4)
    val got = Winnow.matches(fp, maxDf = 3, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)),
      s"expected exactly the planted pair, got $got")
    // sanity: without the df cap the boilerplate links everything
    val uncapped = Winnow.matches(fp, maxDf = 12, minShared = 1).count()
    assert(uncapped > 1)
  }
}
