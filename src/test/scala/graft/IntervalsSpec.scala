package graft

import graft.operators.Intervals

/** Interval union sweep: overlap, touching, nesting, disjoint, the
  * end<start refusal, and the coverage/gap summary.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def merged(rows: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long)] =
    Intervals.mergeIntervals(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet

  test("overlapping, touching and nested intervals merge; disjoint stay apart") {
    val got = merged(Seq(
      ("a", 1L, 3L), ("a", 2L, 5L),   // overlap -> [1,5]
      ("a", 5L, 7L),                  // touching -> [1,7]
      ("a", 2L, 4L),                  // nested inside
      ("a", 9L, 10L),                 // disjoint
      ("b", 0L, 0L)))                 // zero-length, separate key
    assert(got == Set(("a", 1L, 7L, 4L), ("a", 9L, 10L, 1L), ("b", 0L, 0L, 1L)))
  }

  test("duplicate intervals and single rows: counts absorbed correctly") {
    val got = merged(Seq(("a", 1L, 2L), ("a", 1L, 2L), ("a", 4L, 6L)))
    assert(got == Set(("a", 1L, 2L, 2L), ("a", 4L, 6L, 1L)))
  }

  test("end < start refuses loudly") {
    val e = intercept[Exception](merged(Seq(("a", 5L, 3L))))
    assert(e.getMessage != null && e.getMessage.contains("end < start"),
      s"unexpected: ${e.getMessage}")
  }

  test("coverage: totals, interval counts and the largest gap; single interval has NULL gap") {
    val rows = Seq(
      ("a", 1L, 3L), ("a", 2L, 5L), ("a", 9L, 10L), ("a", 20L, 21L),
      ("b", 0L, 4L)).toDF("k", "s", "e")
    val got = Intervals.coverage(rows, Seq("k"), "s", "e")
      .as[(String, Long, Long, Option[Long])].collect()
      .map { case (k, n, c, g) => k -> ((n, c, g)) }.toMap
    // a: [1,5],[9,10],[20,21] -> covered 4+1+1 = 6, gaps 4 and 10 -> max 10
    assert(got("a") == ((3L, 6L, Some(10L))))
    assert(got("b") == ((1L, 4L, None)))
  }
}
