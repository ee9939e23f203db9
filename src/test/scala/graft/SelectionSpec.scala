package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

/** Distributed exact selection: the counting-bisection k-th smallest
  * against a sort-based reference, duplicates/negatives, convergence on
  * constant groups, and the k-bounds guard.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("per-group lower median equals the sort-based reference, ties and negatives included") {
    val rows = Seq(
      ("a", 5L), ("a", -3L), ("a", 5L), ("a", 9L), ("a", 0L),   // sorted: -3,0,5,5,9 → median 5
      ("b", 2L), ("b", 2L), ("b", 2L),                           // constant group → 2
      ("c", 10L), ("c", -10L))                                   // even n: lower median -10
    val got = Selection.kthSmallestByGroup(rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map("a" -> (5L, 5L), "b" -> (3L, 2L), "c" -> (2L, -10L)))
  }

  test("arbitrary k matches a full sort on a deterministic spread") {
    val vs = (1 to 200).map(i => ("g", ((i * 7919L) % 1000) - 500))
    val df = vs.toDF("g", "v")
    val sorted = vs.map(_._2).sorted
    for (k <- Seq(1, 37, 100, 101, 200)) {
      val got = Selection.kthSmallestByGroup(df, "g", "v", _ => k.toLong)
        .select("g", "kth").as[(String, Long)].collect().head._2
      assert(got == sorted(k - 1), s"k=$k")
    }
  }

  test("global kthSmallest and the k-bounds guard") {
    val df = Seq(4L, 1L, 3L, 2L).toDF("v")
    assert(Selection.kthSmallest(df, "v", 1) == 1L)
    assert(Selection.kthSmallest(df, "v", 4) == 4L)
    val e = intercept[IllegalArgumentException] {
      Selection.kthSmallest(df, "v", 5)
    }
    assert(e.getMessage.contains("out of [1, 4]"))
  }

  test("nulls are excluded before counting (k ranges over non-null rows)") {
    val df = Seq(Some(10L), None, Some(20L), None, Some(30L))
      .toDF("v").select(lit("g").as("g"), col("v"))
    val got = Selection.kthSmallestByGroup(df, "g", "v", _ => 2L)
      .select("g", "kth").as[(String, Long)].collect().head._2
    assert(got == 20L)
  }
}
