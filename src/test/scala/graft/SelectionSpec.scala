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

  test("quantile-seeded round 1 collapses a concentrated domain: ≤4 rounds vs >8 unseeded, identical result") {
    // a population concentrated near 10^6 inside a ~2^61-wide [min, max]
    // span — the theilSenSelection shape (slopes near the trend mapped
    // into the full double-bit domain). Pure equi-spaced bisection pays
    // ~log16(2^61) ≈ 15 counting rounds to walk from the global span
    // down to the cluster; the percentile_approx grid lands round 1
    // inside the cluster directly.
    val cluster = (1 to 999).map(i => ("s", 1000000L + ((i * 7919L) % 1000) - 500))
    val rows = cluster ++ Seq(("s", Long.MinValue / 4), ("s", Long.MaxValue / 4))
    val df = rows.toDF("g", "v")
    val sorted = rows.map(_._2).sorted
    val expected = sorted((rows.size + 1) / 2 - 1)

    val (seededDf, seededRounds) =
      Selection.kthSmallestByGroupCounted(df, "g", "v")
    val seeded = seededDf.select("kth").as[Long].collect().head
    assert(seeded == expected)
    assert(seededRounds <= 4, s"seeded rounds = $seededRounds")

    val (unseededDf, unseededRounds) =
      Selection.kthSmallestByGroupCounted(df, "g", "v", seed = false)
    assert(unseededDf.select("kth").as[Long].collect().head == expected)
    assert(unseededRounds > 8, s"unseeded rounds = $unseededRounds")
    assert(seededRounds < unseededRounds)
  }

  test("seeding stays exact when the sketch grid misses: k at the extreme tail") {
    // k = 1 sits below every interior grid quantile the seed probes —
    // the seeded round then only tightens hi, and the equi-spaced
    // rounds certify the exact answer. Wrong seed costs rounds, never
    // correctness.
    val rows = (1 to 500).map(i => ("t", i * 1000003L)) :+ (("t", -7L))
    val df = rows.toDF("g", "v")
    val (got, _) = Selection.kthSmallestByGroupCounted(df, "g", "v", _ => 1L)
    assert(got.select("kth").as[Long].collect().head == -7L)
  }

  test("nulls are excluded before counting (k ranges over non-null rows)") {
    val df = Seq(Some(10L), None, Some(20L), None, Some(30L))
      .toDF("v").select(lit("g").as("g"), col("v"))
    val got = Selection.kthSmallestByGroup(df, "g", "v", _ => 2L)
      .select("g", "kth").as[(String, Long)].collect().head._2
    assert(got == 20L)
  }
}
