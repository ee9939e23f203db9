package graft

import org.apache.spark.sql.functions._

import graft.plans.BoundedLevenshteinRewrite

/** The custom Rule[LogicalPlan] path (SparkSessionExtensions →
  * injectOptimizerRule): banded rewrite of edit-distance predicates.
  */
class PlanRewriteSpec extends SparkSpec {
  import spark.implicits._

  // routed through parquet: a literal LocalRelation would be constant-
  // folded by ConvertToLocalRelation before the rewrite is observable
  private lazy val names = {
    val p = java.nio.file.Files.createTempDirectory("graft-lev").toString + "/names"
    Seq(
      ("alpha", "alphb"),       // distance 1
      ("alpha", "alpha"),       // distance 0
      ("alpha", "alxxx"),       // distance 3
      ("alpha", "alphaXY"),     // distance 2 (inserts)
      ("alpha", "betagamma"),   // far, length diff 4 — prefilter kills it
      ("", "ab"))               // empty edge, distance 2
      .toDF("a", "b").write.parquet(p)
    spark.read.parquet(p)
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BoundedLevenshteinRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BoundedLevenshteinRewrite)
  }

  test("rewrites lev(a,b) <= k to length guard + banded form, same results") {
    // build the DataFrame FRESH inside/outside the rule scope: a Dataset
    // caches its queryExecution, so reusing one would pin the pre-rule plan
    def q() = names.filter(expr("levenshtein(a, b) <= 2"))
    val want = q().collect().map(r => (r.getString(0), r.getString(1))).toSet
    withRule {
      val plan = q().queryExecution.optimizedPlan.toString
      assert(plan.contains("Some(2)") && plan.contains("levenshtein"),
        s"expected the thresholded levenshtein in:\n$plan")
      assert(plan.contains("length"), s"expected the length prefilter in:\n$plan")
      val got = q().collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == want)
      assert(got == Set(("alpha", "alphb"), ("alpha", "alpha"),
        ("alpha", "alphaXY"), ("", "ab")))
    }
  }

  test("strict < and flipped comparisons rewrite with the adjusted bound") {
    withRule {
      // lev < 2 ⇒ banded at k = 1
      val lt = names.filter(expr("levenshtein(a, b) < 2"))
      assert(lt.queryExecution.optimizedPlan.toString.contains("Some(1)"))
      assert(lt.collect().length == 2) // distances 0 and 1
      // 2 >= lev ⇒ banded at k = 2
      val flipped = names.filter(expr("2 >= levenshtein(a, b)"))
      assert(flipped.queryExecution.optimizedPlan.toString.contains("Some(2)"))
      assert(flipped.collect().length == 4)
    }
  }

  test("projection context and null inputs keep exact tri-state semantics") {
    val withNulls = Seq(
      (Some("abc"), Some("abd")), (Some("abc"), None), (None, None))
      .toDF("a", "b")
    val exprStr = "levenshtein(a, b) <= 1"
    val want = withNulls.select(expr(exprStr)).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    withRule {
      val got = withNulls.select(expr(exprStr)).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
      assert(got == want && got == Seq(Some(true), None, None))
    }
  }

  test("already-thresholded calls and non-literal bounds are left alone") {
    withRule {
      val p1 = names.filter(expr("levenshtein(a, b, 2) >= 0"))
        .queryExecution.optimizedPlan.toString
      // must not double-wrap: exactly one levenshtein occurrence
      assert(p1.split("levenshtein").length - 1 == 1, p1)
      val p2 = names.filter(expr("levenshtein(a, b) <= length(a)"))
        .queryExecution.optimizedPlan.toString
      assert(p2.contains("levenshtein(") && !p2.contains("Some("),
        s"non-literal bound must not rewrite:\n$p2")
    }
  }
}
