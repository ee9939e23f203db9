package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-value-per-key — the reference's core materialization semantic.
  *
  * The reference's sink keeps exactly one document per tag via a replace
  * upsert (/root/reference/OPC2MongoDB/Program.cs:1179-1182), with "latest"
  * meaning queue-arrival order. We tighten that to event order — the row
  * with the greatest (orderCol, tieBreak...) wins — which is deterministic
  * and out-of-order safe (documented deviation, SURVEY.md §2.9).
  *
  * Implementation: `max_by(struct(*), struct(orderCol, tieBreak...))` —
  * a single hash aggregation with map-side partial aggregation, so the
  * shuffle carries at most one row per key per input partition. That is
  * the 100 TB-safe shape: shuffle volume is O(distinct keys), not O(rows),
  * and there is no window sort.
  */
object LastValue {

  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(col("__latest.*"))
  }

  /** Skew-safe variant: pre-reduce each key within `saltBuckets` salted
    * sub-groups, then reduce the ≤ saltBuckets survivors per key. For a hot
    * key (one tag producing a large share of all events — common in
    * telemetry) the single-phase aggregation funnels every pre-aggregated
    * partial of that key through one reducer task; salting bounds any
    * task's input to ~1/saltBuckets of the hot key's partials. Same result,
    * two shuffles — use when key skew is known/measured, not by default.
    *
    * The salt is a deterministic hash of the order columns, not `rand()`:
    * a retried task re-derives identical salts (rand() re-rolls on
    * recompute, which breaks idempotent-replay assumptions in foreachBatch
    * sinks), and hot-key rows still spread because their order values
    * differ.
    */
  def latestPerKeySalted(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      saltBuckets: Int = 32): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val ord = struct(orderCols.map(col): _*)
    val salted = df
      .withColumn("__salt", pmod(xxhash64(orderCols.map(col): _*), lit(saltBuckets)).cast("int"))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(max_by(payload, ord).as("__latest"), max(ord).as("__ord"))
    salted
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(col("__latest"), col("__ord")).as("__latest"))
      .select(col("__latest.*"))
  }
}
