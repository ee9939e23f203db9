package graft

import graft.operators.Quality
import graft.operators.Quality.Rule._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), Some("OK"), Some("A-1")),
    (Some(2L), Some(-5.0), Some("OK"), Some("B-2")),   // range violation
    (Some(2L), Some(20.0), Some("BAD"), Some("C-3")),  // dup key + bad status
    (None, Some(200.0), Some("OK"), None),             // null key + range + null fmt ok
    (Some(4L), None, None, Some("nope")))              // format violation
    .toDF("id", "price", "status", "code")

  test("every rule family counts exactly its violations, in caller order") {
    val got = Quality.check(df, Seq(
        NotNull("id"),
        InRange("price", 0.0, 100.0),
        AcceptedValues("status", Seq("OK")),
        Matches("code", "[A-C]-[0-9]"),
        Unique("id")))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("not_null(id)", 1L, false),
      ("in_range(price, 0.0, 100.0)", 2L, false), // -5 and 200
      ("accepted_values(status)", 1L, false),     // BAD; nulls exempt
      ("matches(code)", 1L, false),               // "nope"; nulls exempt
      ("unique(id)", 1L, false)))                 // one extra row for id=2
  }

  test("referential integrity counts unmatched non-null foreign keys") {
    val ref = Seq(1L, 2L).toDF("k")
    val got = Quality.check(df, Seq(RefIntegrity("id", ref, "k")))
      .as[(String, Long, Boolean)].collect().head
    assert(got == (("ref_integrity(id)", 1L, false))) // id=4; null exempt
  }

  test("a clean table passes everything; scalar rules share one aggregation") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "price")
    val rules = Seq(NotNull("id"), InRange("price", 0.0, 10.0), Unique("id"))
    val got = Quality.check(clean, rules)
      .as[(String, Long, Boolean)].collect()
    assert(got.forall(r => r._2 == 0L && r._3))
    // plan audit: the two scalar rules must NOT scan the table twice —
    // exactly one Aggregate over the scan feeds the stack()
    val scalarOnly = Quality.check(clean, Seq(NotNull("id"),
      InRange("price", 0.0, 10.0)))
    val nAggs = scalarOnly.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggs == 1, s"scalar rules must fold into one aggregation:\n" +
      scalarOnly.queryExecution.optimizedPlan)
  }

  test("matches is FULL-string: a trailing newline is a violation") {
    val d = Seq((1L, "A-1"), (2L, "A-1\n"), (3L, "xA-1")).toDF("id", "code")
    val got = Quality.check(d, Seq(Matches("code", "[A-C]-[0-9]")))
      .as[(String, Long, Boolean)].collect().head
    // ^...$ anchors would pass the \n row (Java $ matches before a final
    // line terminator); the full-string contract counts both bad rows
    assert(got._2 == 2L, s"got $got")
  }

  test("rule names containing quotes/backslashes survive the unpivot and keep order") {
    // names flow through typed lit() columns, never SQL-literal text, so
    // they are immune to the parser's escaping mode
    // (spark.sql.parser.escapedStringLiterals flips the backslash
    // convention between sessions — an embedded literal breaks in one)
    val d = Seq((Some(1L), Some(2L), Some(3L))).toDF("it's", "b", "a\\b")
    val got = Quality.check(d, Seq(NotNull("b"), NotNull("it's"), NotNull("a\\b")))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(("not_null(b)", 0L, true), ("not_null(it's)", 0L, true),
      ("not_null(a\\b)", 0L, true)))
  }

  test("empty input: zero violations everywhere (vacuous pass)") {
    val empty = Seq.empty[(Option[Long], Option[Double])].toDF("id", "price")
    val got = Quality.check(empty, Seq(NotNull("id"),
        InRange("price", 0.0, 1.0), Unique("id")))
      .as[(String, Long, Boolean)].collect()
    assert(got.length == 3 && got.forall(r => r._2 == 0L && r._3))
  }
}
