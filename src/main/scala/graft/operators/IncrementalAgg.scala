package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — refresh a keyed aggregate from a
  * change data feed instead of rescanning the base table (SURVEY.md
  * §2.11 scale extension; no reference analog — the reference's only
  * state is the last-value table itself).
  *
  * The 100 TB argument: a grouped sum/count over the full base table is
  * a full scan + shuffle per refresh. With a CDF
  * ([[Snapshot.changeDataFeed]] or a TxTable version diff), the refresh
  * cost is O(|changes|) + one key-partitioned merge join against the
  * (much smaller) aggregate state: inserts/post-images contribute +value,
  * deletes/pre-images −value — sum and count are abelian-group
  * aggregates, so signed deltas compose exactly. Groups whose count
  * reaches zero leave the state. Avg/derived ratios come from the
  * maintained (sum, count) pair; non-invertible aggregates (min/max
  * under deletes) need a rescan of the affected groups and are out of
  * scope by design — document, don't pretend.
  *
  * EXACTNESS requires an order-insensitive value domain: integer or
  * DECIMAL sums are exact under any grouping/merge order, so the
  * maintained state is bit-identical to a from-scratch recompute (q185's
  * oracle proves this cross-engine). Floating-point sums are NOT —
  * maintain decimals, not doubles.
  */
object IncrementalAgg {

  /** Signed per-group deltas from a CDF: for each group, `d_cnt` =
    * Σ sign and `d_sum_<c>` = Σ sign·c, where sign is +1 for
    * insert/update_postimage and −1 for delete/update_preimage rows.
    * The aggregation is map-side partial — the shuffle carries one row
    * per AFFECTED group, never per change row.
    */
  def sumCountDeltas(
      cdf: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .when(col("change_type").isin("delete", "update_preimage"), -1L)
    // an unknown change_type must fail loudly, not silently drop weight
    val checked = cdf.withColumn("__sign",
      coalesce(sign, raise_error(concat(lit("unknown change_type: "),
        col("change_type")))))
    checked.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("d_cnt"),
        sumCols.map(c => sum(col(c) * col("__sign")).as(s"d_sum_$c")): _*)
  }

  /** Merge signed deltas into the previous aggregate state.
    *
    * @param prevAgg previous state: groupCols ++ (cntCol, sum columns) —
    *                the schema [[sumCountDeltas]] maintains
    * @param deltas  output of [[sumCountDeltas]] over the CDF
    * @return the refreshed state: same schema as `prevAgg`; groups with
    *         zero remaining rows are dropped, brand-new groups appear.
    *         One full-outer equi-join on the group key — co-located for
    *         free when the state table is bucketed by it.
    */
  def applySumCount(
      prevAgg: DataFrame,
      deltas: DataFrame,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame = {
    def z(c: Column) = coalesce(c, lit(0L))
    prevAgg.join(deltas, groupCols, "full_outer")
      .select((groupCols.map(col) :+
        (z(col(cntCol)) + z(col("d_cnt"))).as(cntCol)) ++
        sumCols.map(c =>
          (coalesce(col(c), lit(0)) + coalesce(col(s"d_sum_$c"), lit(0)))
            .as(c)): _*)
      .filter(col(cntCol) > 0)
  }

  /** One-call refresh: state' = apply(state, deltas(cdf)). */
  def refreshSumCount(
      prevAgg: DataFrame,
      cdf: DataFrame,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Seq[String]): DataFrame =
    applySumCount(prevAgg, sumCountDeltas(cdf, groupCols, sumCols),
      groupCols, cntCol, sumCols)
}
