package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed (start, end) rows — the telemetry
  * coverage family (sensor uptime, maintenance windows, shipping
  * activity): merge overlapping/touching intervals into maximal ones,
  * and from there coverage totals and gap detection. No reference
  * analog (the reference keeps only last values); SURVEY §2.11 scale
  * extension.
  *
  * The sweep is the classic sort-by-start formulation expressed as two
  * windows: an interval STARTS a new merged group iff its start exceeds
  * the running max of all previous ends in its key (strictly —
  * touching intervals [1,3],[3,5] merge); group id = running sum of
  * those flags; the merged interval is (min start, max end) per group.
  * Window partitions are PER KEY — the per-key interval count is
  * bounded by contract (a device's maintenance windows, a supplier's
  * shipping spells — thousands, not corpus-sized), the same bounded-
  * series contract as [[TimeSeries.holtSmooth]]; keys themselves scale
  * horizontally. Everything is integer/orderable compares, so the
  * whole construction replays exactly in SQL (q277's oracle).
  *
  * An interval with end < start is refused loudly (raise_error riding
  * the value path — a silent drop or swap would corrupt coverage
  * totals downstream).
  */
object Intervals {

  /** Merge overlapping/touching intervals per key. Input: keyCols ++
    * (startCol, endCol) — any orderable numeric/date type, compared
    * with its natural order. Output: keyCols ++ (interval_start,
    * interval_end, n_source) — one row per MAXIMAL merged interval,
    * n_source = how many input rows it absorbed.
    */
  def mergeIntervals(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    val checkedEnd = when(col(endCol) >= col(startCol), col(endCol))
      .otherwise(raise_error(concat(
        lit(s"mergeIntervals: end < start ("), col(endCol).cast("string"),
        lit(" < "), col(startCol).cast("string"), lit(")"))))
    // collapse DUPLICATE intervals before the sweep: identical (s, e)
    // rows are tied under the sort, and two windows that sort ties
    // independently (a SQL engine evaluating flag and running-sum in
    // separate subqueries) can pair one row's flag with the other's
    // running position — mis-grouping the sweep (caught at sf0.1: two
    // equal intervals split an unrelated earlier interval's group).
    // After the collapse (s, e) is UNIQUE per key, the order is total,
    // and the window input shrinks to distinct intervals as a bonus.
    val keyed = df.select(
        keyCols.map(col) :+ col(startCol).as("__s") :+ checkedEnd.as("__e"): _*)
      .groupBy(keyCols.map(col) :+ col("__s") :+ col("__e"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val order = Seq(col("__s"), col("__e"))
    val prev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runMax = max(col("__e")).over(prev)
    val flagged = keyed.withColumn("__new",
      when(runMax.isNull || col("__s") > runMax, 1L).otherwise(0L))
    flagged
      .withColumn("__grp", sum(col("__new")).over(upTo))
      .groupBy(keyCols.map(col) :+ col("__grp"): _*)
      .agg(min(col("__s")).as("interval_start"),
        max(col("__e")).as("interval_end"),
        sum(col("__cnt")).as("n_source"))
      .drop("__grp")
  }

  /** Per-key coverage summary over the merged intervals: interval
    * count, total covered length Σ(end − start) and the largest gap
    * between consecutive merged intervals (NULL for keys with a single
    * interval). Lengths subtract in the column's native arithmetic —
    * use integer day/epoch columns for exact cross-engine totals.
    */
  def coverage(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    val merged = mergeIntervals(df, keyCols, startCol, endCol)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("interval_start"))
    merged
      .withColumn("__gap",
        col("interval_start") - lag(col("interval_end"), 1).over(w))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("interval_end") - col("interval_start")).as("covered"),
        max(col("__gap")).as("max_gap"))
  }

  /** Convenience: a timestamp column as integer epoch days — the exact
    * integer domain [[coverage]] wants for date intervals.
    */
  def epochDays(ts: Column): Column = datediff(to_date(ts), lit("1970-01-01"))
}
