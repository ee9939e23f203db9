package graft

import graft.operators.Unigram

/** [[Unigram]] — the DP equals brute-force enumeration under the
  * declared global tie order (score desc, reversed length sequence
  * desc), global-vs-greedy separation, UNK coverage, and hand cases.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations by brute force, ranked by the declared rule. */
  private def brute(word: String, scores: Map[String, Long]): (Seq[String], Long, Int) = {
    def segs(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to w.length).flatMap { l =>
        val p = w.substring(0, l)
        val ok = scores.contains(p) || l == 1
        if (!ok) Nil else segs(w.substring(l)).map(p :: _)
      }
    def score(s: Seq[String]) = s.map(p => scores.getOrElse(p, 0L)).sum
    // rank: score, then reversed length sequence lexicographically —
    // zero-padded so string compare == numeric compare (length seqs of
    // complete segmentations are never prefix-equal: sums match)
    val best = segs(word).maxBy(s =>
      (score(s), s.reverse.map(p => f"${p.length}%09d").mkString))
    (best, score(best), best.count(p => !scores.contains(p)))
  }

  test("DP equals brute force under the declared tie order on random lexicons") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 60) {
      val alpha = "abc"
      def rs(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(3))).mkString
      val lexicon = (1 to 8).map(_ => rs(1 + rnd.nextInt(3)) -> rnd.nextInt(10).toLong)
        .toMap
      val word = rs(3 + rnd.nextInt(6))
      val got = Unigram.segment(word, lexicon, lexicon.keys.map(_.length).max)
      val want = brute(word, lexicon)
      assert(got == want, s"trial $trial word=$word lex=$lexicon")
    }
  }

  test("global optimum beats greedy: the parts outscore the whole") {
    val lex = Map("table" -> 8L, "ta" -> 4L, "ble" -> 5L)
    val (pieces, score, unk) = Unigram.segment("table", lex, 5)
    assert(pieces == Seq("ta", "ble") && score == 9L && unk == 0)
    // flip the economics and the whole word wins
    val lex2 = Map("table" -> 12L, "ta" -> 4L, "ble" -> 5L)
    assert(Unigram.segment("table", lex2, 5)._1 == Seq("table"))
  }

  test("score ties prefer the longer final piece") {
    // 'abcd': ab+cd (3+3) vs abc+d where d is UNK... make exact tie:
    // a+bcd = 2+4 = 6 and ab+cd = 3+3 = 6 → final piece 'cd' (2) vs
    // 'bcd' (3): the longer final piece wins
    val lex = Map("a" -> 2L, "bcd" -> 4L, "ab" -> 3L, "cd" -> 3L)
    val (pieces, score, _) = Unigram.segment("abcd", lex, 3)
    assert(score == 6L)
    assert(pieces == Seq("a", "bcd"), pieces)
  }

  test("unknown characters become UNK singletons with score 0; segmentation is total") {
    val lex = Map("ok" -> 5L)
    val (pieces, score, unk) = Unigram.segment("xokz", lex, 2)
    assert(pieces == Seq("x", "ok", "z") && score == 5L && unk == 2)
    assert(Unigram.segment("", lex, 2) == ((Nil, 0L, 0)))
  }

  test("viterbiSegment: distributed over a word frame; hostile lexicons refused") {
    val got = Unigram.viterbiSegment(
        Seq("table", "scans").toDF("word"), "word",
        Map("ta" -> 4L, "ble" -> 5L, "scan" -> 9L, "s" -> 1L))
      .as[(String, String, Long, Int, Int)].collect()
      .map { case (w, p, s, n, u) => w -> ((p, s, n, u)) }.toMap
    assert(got("table") == (("ta ble", 9L, 2, 0)))
    assert(got("scans") == (("scan s", 10L, 2, 0)))
    intercept[IllegalArgumentException](
      Unigram.viterbiSegment(Seq("x").toDF("word"), "word", Map.empty))
    intercept[IllegalArgumentException](
      Unigram.viterbiSegment(Seq("x").toDF("word"), "word", Map("" -> 1L)))
  }
}
