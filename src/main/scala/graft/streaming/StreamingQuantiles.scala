package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key quantile tracking — the telemetry-profile surface
  * (p50/p90/p99 per tag, forever) next to the existing streaming anomaly
  * and heavy-hitter twins. Batch analogs: q45/q57 percentiles,
  * `Histogram.equiDepthApprox`.
  *
  * Sketch: a DETERMINISTIC reservoir per key (Algorithm R with the random
  * draws replaced by a stable 64-bit mix of (key, arrival index), and
  * trigger rows folded in sorted order) — replays and shuffle
  * nondeterminism cannot change the sample, so checkpoint recovery and
  * the exactly-once sink contract hold bit-for-bit. Min/max/count are
  * tracked exactly alongside (extremes are what reservoirs lose first).
  * Rank error is the standard uniform-sample bound O(n/√capacity);
  * capacity ≥ distinct stream length makes the estimates exact.
  *
  * State is O(capacity) doubles per key regardless of stream length; one
  * stateful stage; emission is one snapshot row per key per trigger.
  */
object StreamingQuantiles {

  final case class Sample(key: String, value: Double)

  /** Per-trigger snapshot of a key's distribution. Quantiles are
    * nearest-rank over the reservoir (exact while n ≤ capacity).
    */
  final case class QuantileSnapshot(
      key: String, n: Long, min: Double, max: Double,
      p50: Double, p90: Double, p99: Double)

  final case class ReservoirState(
      n: Long, min: Double, max: Double, slots: List[Double])

  /** Stable 64-bit mix (splitmix64 over the key hash and index) — the
    * determinism backbone; java.util.Random would replay differently
    * across recoveries.
    */
  private[streaming] def mix(key: String, idx: Long): Long = {
    // null-keyed streams are legal (SQL group-by semantics) — hash the
    // null key as 0 rather than NPE on the first replacement draw
    val kh = if (key == null) 0 else scala.util.hashing.MurmurHash3.stringHash(key)
    var z = kh.toLong * 0x9e3779b97f4a7c15L + idx
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def snapshots(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      capacity: Int = 256): Dataset[QuantileSnapshot] = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("double").as("value"))
      // null values are ignored like every SQL aggregate (a null would
      // also fail deserialization into the primitive Double field)
      .filter(col("value").isNotNull)
      .as[Sample]
      .groupByKey(_.key)
      .flatMapGroupsWithState[ReservoirState, QuantileSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[ReservoirState]) =>
          var st = state.getOption.getOrElse(
            ReservoirState(0L, Double.PositiveInfinity, Double.NegativeInfinity, Nil))
          val slots = st.slots.toBuffer
          var n = st.n
          var mn = st.min
          var mx = st.max
          // sorted fold: the reservoir becomes a pure function of the
          // (multi)set of values seen per trigger, not arrival order
          rows.toSeq.map(_.value).sorted.foreach { v =>
            n += 1
            if (v < mn) mn = v
            if (v > mx) mx = v
            if (slots.length < capacity) slots += v
            else {
              val j = java.lang.Math.floorMod(mix(key, n), n)
              if (j < capacity) slots(j.toInt) = v
            }
          }
          st = ReservoirState(n, mn, mx, slots.toList)
          state.update(st)
          if (n == 0L) Iterator.empty
          else {
            val sorted = slots.sorted
            def q(p: Double): Double =
              sorted(math.min(sorted.length - 1,
                math.ceil(p * sorted.length).toInt - 1).max(0))
            Iterator.single(QuantileSnapshot(key, n, mn, mx, q(0.5), q(0.9), q(0.99)))
          }
      }
  }
}
