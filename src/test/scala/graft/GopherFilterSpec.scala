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
}
