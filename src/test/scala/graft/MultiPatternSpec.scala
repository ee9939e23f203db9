package graft

import graft.operators.MultiPattern

/** [[MultiPattern]] — Aho-Corasick counts equal brute-force overlapping
  * occurrence counts, including the classic prefix/suffix-sharing
  * pattern sets the failure links exist for.
  */
class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, pat: String): Int =
    (0 to text.length - pat.length).count(i => text.startsWith(pat, i))

  test("classic he/she/his/hers: suffix matches fire through failure links") {
    val ac = MultiPattern.automaton(Seq("he", "she", "his", "hers"))
    val got = ac.count("ushers and she said his hers")
    // "ushers": she@1, he@2, hers@2 ... verify against brute force
    val want = Seq("he", "she", "his", "hers")
      .map(brute("ushers and she said his hers", _))
    assert(got.toSeq == want)
    assert(got.toSeq == Seq(3, 2, 1, 2))
  }

  test("overlapping occurrences all count: aa in aaaa is 3") {
    val ac = MultiPattern.automaton(Seq("aa", "aaa"))
    assert(ac.count("aaaa").toSeq == Seq(3, 2))
  }

  test("randomized equivalence with brute force on a tiny alphabet") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 30) {
      val text = (1 to 200).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val pats = scala.util.Random.shuffle(
        (1 to 12).map(_ => (1 to (1 + rnd.nextInt(4)))
          .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString).distinct.toList)
      val ac = MultiPattern.automaton(pats)
      val got = ac.count(text).toSeq
      val want = pats.map(brute(text, _))
      assert(got == want, s"trial $trial pats=$pats")
    }
  }

  test("a pattern that is a proper prefix of another still matches standalone") {
    val ac = MultiPattern.automaton(Seq("tab", "table", "able"))
    assert(ac.count("a table, a tab, tables").toSeq == Seq(3, 2, 2))
  }

  test("hostile pattern lists are refused") {
    intercept[IllegalArgumentException](MultiPattern.automaton(Nil))
    intercept[IllegalArgumentException](MultiPattern.automaton(Seq("a", "")))
    intercept[IllegalArgumentException](MultiPattern.automaton(Seq("a", "a")))
  }

  test("countMatches scans distributively and omits zero-count pairs") {
    val docs = Seq((1L, "she sells seashells"), (2L, "nothing here"),
      (3L, "he he he")).toDF("doc_id", "text")
    val got = MultiPattern.countMatches(docs, "doc_id", "text", Seq("she", "he", "hells"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "she", 2L), (1L, "he", 2L), (1L, "hells", 1L),
      (2L, "he", 1L), // "here" contains he
      (3L, "he", 3L)))
  }
}
