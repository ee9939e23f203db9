package graft

import graft.operators.GopherFilter

/** [[GopherFilter]] — each rule pinned by a document built to trip
  * exactly that rule while staying clean on the others.
  */
class GopherFilterSpec extends SparkSpec {
  import spark.implicits._

  // 180 ordinary words incl. stopwords, ten distinct sentences: passes
  // every rule
  private val good = (1 to 10).map(i =>
    s"the quick brown fox $i jumps over and that lazy dog again with energy to spare here now")
    .mkString(". ")

  private def sig(docs: (Long, String)*) =
    GopherFilter.signals(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("clean prose passes; each rule trips its own violator") {
    val tooShort = "the cat sat on the mat with that dog to be sure"
    val symbols = (1 to 60).map(i => s"w$i ###").mkString(" ") +
      " the of and that be to have with"
    val dupLines = (1 to 10).map(_ => "the same sentence repeats here with that group of words")
      .mkString(". ")
    val bullets = (1 to 10).map(i => s"- bullet item $i listing the thing of and that")
      .mkString(". ")
    val noStop = (1 to 60).map(i => s"word$i").mkString(" ")

    val m = sig(1L -> good, 2L -> tooShort, 3L -> symbols, 4L -> dupLines,
      5L -> bullets, 6L -> noStop)

    assert(m(1L).getAs[Long]("pass") == 1L, s"good doc failed: ${m(1L)}")

    assert(m(2L).getAs[Long]("n_words") < 50L)
    assert(m(2L).getAs[Long]("pass") == 0L)

    assert(m(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(m(3L).getAs[Long]("pass") == 0L)

    assert(m(4L).getAs[Double]("dup_line_frac") > 0.3)
    assert(m(4L).getAs[Double]("dup_line_char_frac") > 0.2)
    assert(m(4L).getAs[Long]("pass") == 0L)

    assert(m(5L).getAs[Double]("bullet_frac") > 0.9)
    assert(m(5L).getAs[Long]("pass") == 0L)

    assert(m(6L).getAs[Long]("n_stop") < 2L)
    assert(m(6L).getAs[Long]("pass") == 0L)
  }

  test("empty and degenerate documents never throw, always fail") {
    val m = sig(1L -> "", 2L -> "   ", 3L -> "...")
    m.values.foreach(r => assert(r.getAs[Long]("pass") == 0L))
    assert(m(1L).getAs[Long]("n_words") == 0L)
    assert(m(1L).getAs[Long]("n_lines") == 0L)
  }

  test("ellipsis-line rule: trailing dots on most segments trip it") {
    // joined by "; " so no ". " boundary exists — ONE segment whose tail
    // is the final "..." (a " " join would hide a ". " inside "... ")
    val dots = (1 to 10).map(i => s"trailing thought number $i of the story goes on...")
      .mkString("; ")
    val m = sig(1L -> dots)
    assert(m(1L).getAs[Double]("ellipsis_frac") == 1.0)
  }

  test("fleschSignals: hand-computed counts and score; empty text yields NULL score") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "The table. Nice code here!"),
      (2L, "rhythm") /* no vowels in runs? y counts: 'y' IS a vowel run */,
      (3L, "")).toDF("doc_id", "text")
    val got = graft.operators.GopherFilter.fleschSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // words: the(1) table.(2) nice(2-1=1) code(2-1=1) here!(2) → 7 syllables
    val r1 = got(1L)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 2L && r1.getLong(3) == 7L)
    val want = math.rint((206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (7.0 / 5.0)) * 1e4) / 1e4
    assert(r1.getDouble(4) == want)
    // 'rhythm': one vowel run ('y'), floor at 1
    assert(got(2L).getLong(3) == 1L)
    // empty text: zero counts, NULL score (never a 0/0)
    val r3 = got(3L)
    assert(r3.getLong(1) == 0L && r3.isNullAt(4))
  }
}
