package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (deequ-style "expectations") — the
  * validation pass a pipeline runs on every ingest batch before promoting
  * it: null rates, range/set membership, format, key uniqueness,
  * referential integrity. SURVEY.md §2.11 operational scope; the
  * reference's only quality notion is the per-reading OPC quality enum
  * (/root/reference/OPC2MongoDB/Program.cs:81), which P1 normalization
  * already carries through.
  *
  * Plan shape: every SCALAR rule (null/range/set/regex) folds into ONE
  * aggregation over a single scan — a sum of CASE masks per rule, so 20
  * rules cost one pass, not 20. [[Rule.Unique]] needs the key's
  * duplication profile (one groupBy on the key — map-side combining) and
  * [[Rule.RefIntegrity]] one anti-join per referenced table; both are
  * irreducible shuffles, kept per-rule. Results union into one tiny
  * (rule, n_violations, pass) report.
  */
object Quality {

  sealed trait Rule { def name: String }

  object Rule {
    /** `col` must be non-null. */
    final case class NotNull(col: String) extends Rule {
      def name = s"not_null($col)"
    }
    /** Non-null values of `col` must lie in [lo, hi]. */
    final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
      def name = s"in_range($col, $lo, $hi)"
    }
    /** Non-null values of `col` must be one of `values`. */
    final case class AcceptedValues(col: String, values: Seq[String]) extends Rule {
      def name = s"accepted_values($col)"
    }
    /** Non-null values of `col` must match `regex` (full-string). */
    final case class Matches(col: String, regex: String) extends Rule {
      def name = s"matches($col)"
    }
    /** `col` must be unique; every row beyond the first per value counts
      * as a violation (nulls are exempt — use NotNull to forbid them). */
    final case class Unique(col: String) extends Rule {
      def name = s"unique($col)"
    }
    /** Every non-null `col` value must exist in `ref`'s `refCol`. */
    final case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
        extends Rule {
      def name = s"ref_integrity($col)"
    }
  }

  /** Evaluate `rules` against `df`: one row per rule —
    * (rule, n_violations, pass) — in the given rule order.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    import Rule._
    require(rules.nonEmpty, "no rules given")
    val spark = df.sparkSession

    def scalarMask(r: Rule): Option[Column] = r match {
      case NotNull(c) => Some(when(col(c).isNull, 1L).otherwise(0L))
      case InRange(c, lo, hi) => Some(
        when(col(c).isNotNull &&
          (col(c).cast("double") < lo || col(c).cast("double") > hi), 1L)
          .otherwise(0L))
      case AcceptedValues(c, vs) => Some(
        when(col(c).isNotNull && !col(c).cast("string").isin(vs: _*), 1L)
          .otherwise(0L))
      case Matches(c, re) => Some(
        // \A...\z, not ^...$: Java's $ matches before a trailing newline,
        // which would silently pass "OK\n" against a full-string contract
        when(col(c).isNotNull && !col(c).cast("string").rlike(s"\\A(?:$re)\\z"), 1L)
          .otherwise(0L))
      case _ => None
    }

    val scalars = rules.flatMap(r => scalarMask(r).map(r -> _))
    val scalarReport: Option[DataFrame] =
      if (scalars.isEmpty) None
      else {
        // ONE aggregation row: sum of each rule's violation mask
        val agg = df.agg(
          sum(scalars.head._2).as("v0"),
          scalars.tail.zipWithIndex.map { case ((_, m), i) =>
            sum(m).as(s"v${i + 1}") }: _*)
        // unpivot the single row into (rule, n_violations) — the row is
        // 1×N, driver-free. Rule names go through typed lit() columns,
        // never through SQL-literal text: string escaping depends on
        // session config (spark.sql.parser.escapedStringLiterals flips
        // the backslash convention), so any embedded-literal build would
        // corrupt or fail on a quote/backslash in a rule name under one
        // of the two parser modes
        val entries = scalars.zipWithIndex.map { case ((r, _), i) =>
          struct(lit(r.name).as("rule"),
            coalesce(col(s"v$i"), lit(0L)).as("n_violations"))
        }
        Some(agg.select(explode(array(entries: _*)).as("__kv"))
          .select(col("__kv.rule"), col("__kv.n_violations")))
      }

    val others: Seq[DataFrame] = rules.collect {
      case r @ Unique(c) =>
        df.filter(col(c).isNotNull).groupBy(col(c))
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
      case r @ RefIntegrity(c, ref, rc) =>
        df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as("__ref")).distinct(),
            col(c) === col("__ref"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
    }

    val all = (scalarReport.toSeq ++ others).reduce(_ unionAll _)
    // restore the caller's rule order (union order interleaves families):
    // a literal CASE chain over the N rule names — no UDF, codegen'd
    val ord = rules.zipWithIndex.foldLeft(lit(Int.MaxValue)) {
      case (acc, (r, i)) => when(col("rule") === r.name, i).otherwise(acc)
    }
    all
      .withColumn("__ord", ord)
      .orderBy("__ord")
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
  }
}
