package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment — the streaming twin of the batch as-of
  * join (`operators.AsOfJoin`, q27) and the reference's core read
  * semantic "attach the latest reading at or before t"
  * (/root/reference/OPC2MongoDB/Program.cs keeps only the last value per
  * tag; trend clients ask "value as of t"): for every probe row
  * (key, ts), emit exactly ONE row carrying the LATEST reading of the
  * same key with reading.ts ≤ probe.ts within `lookback` — across
  * micro-batches, late data, and restarts. Probes with no admissible
  * reading emit with NULL enrichment (left semantics), once the
  * watermark proves none can arrive.
  *
  * Shape (SURVEY §2.3, last row): a stream-stream LEFT OUTER join with
  * watermarks on BOTH sides and an event-time RANGE condition
  * (probe.ts − lookback ≤ reading.ts ≤ probe.ts) — the range bounds both
  * join states, so state is O(lookback × arrival rate), never
  * O(history) — followed by an event-time aggregation that collapses
  * each probe's candidate set to the as-of row (max over reading time,
  * value as deterministic tie-break). Join → aggregation is the chained
  * stateful-operator topology Structured Streaming supports in append
  * mode; emission of a probe waits for the combined watermark, so any
  * admissible late reading has been folded in before the probe's
  * enrichment is fixed.
  *
  * 100 TB posture: both states are watermark-bounded and keyed, the join
  * and the aggregation shuffle on the same key, and nothing touches the
  * driver.
  */
object StreamingAsOf {

  /** Enrich `probes` (keyCol STRING, tsCol TIMESTAMP) with the latest
    * row of `readings` (keyCol STRING, tsCol TIMESTAMP, valueCol DOUBLE)
    * at or before each probe's ts, at most `lookback` old. Output:
    * (key, ts, asof_ts, asof_value) — one row per distinct probe
    * (key, ts) once the watermark passes it; duplicate probes collapse
    * (their enrichment is identical by construction).
    */
  def enrich(
      probes: DataFrame,
      readings: DataFrame,
      keyCol: String = "key",
      tsCol: String = "ts",
      valueCol: String = "value",
      lookback: String = "10 minutes",
      watermarkDelay: String = "1 minute"): DataFrame = {
    val p = probes.select(
        col(keyCol).cast("string").as("pkey"),
        col(tsCol).cast("timestamp").as("pts"))
      .withWatermark("pts", watermarkDelay)
    val r = readings.select(
        col(keyCol).cast("string").as("rkey"),
        col(tsCol).cast("timestamp").as("rts"),
        col(valueCol).cast("double").as("rvalue"))
      .withWatermark("rts", watermarkDelay)
    p.join(r,
        col("pkey") === col("rkey") &&
          col("rts") <= col("pts") &&
          col("rts") >= col("pts") - expr(s"interval $lookback"),
        "leftOuter")
      // candidates → the as-of row: max over (rts, rvalue) structs picks
      // the latest reading; the when() keeps outer-null probes as a NULL
      // aggregate instead of a null-field struct outranking real ones
      .groupBy(col("pkey").as("key"), col("pts"))
      .agg(max(when(col("rts").isNotNull,
        struct(col("rts"), col("rvalue")))).as("__asof"))
      .select(col("key"), col("pts").as("ts"),
        col("__asof.rts").as("asof_ts"),
        col("__asof.rvalue").as("asof_value"))
  }

  /** FORWARD streaming as-of — the streaming twin of the batch
    * `AsOfJoin.leftAsOf(direction = "forward", tolerance)` (q177's
    * attribution-window join): enrich each probe with the EARLIEST
    * reading at or after its ts, at most `lookahead` later. The exact
    * mirror of [[enrich]]: the event-time range flips to
    * `probe.ts ≤ reading.ts ≤ probe.ts + lookahead` (both states stay
    * watermark-bounded) and the collapse flips to `min` over
    * (rts, rvalue). A probe emits once the combined watermark passes
    * `pts + lookahead` — i.e. once no admissible future reading can
    * still arrive; probes whose window closes empty emit NULLs.
    */
  def enrichForward(
      probes: DataFrame,
      readings: DataFrame,
      keyCol: String = "key",
      tsCol: String = "ts",
      valueCol: String = "value",
      lookahead: String = "10 minutes",
      watermarkDelay: String = "1 minute"): DataFrame = {
    val p = probes.select(
        col(keyCol).cast("string").as("pkey"),
        col(tsCol).cast("timestamp").as("pts"))
      .withWatermark("pts", watermarkDelay)
    val r = readings.select(
        col(keyCol).cast("string").as("rkey"),
        col(tsCol).cast("timestamp").as("rts"),
        col(valueCol).cast("double").as("rvalue"))
      .withWatermark("rts", watermarkDelay)
    p.join(r,
        col("pkey") === col("rkey") &&
          col("rts") >= col("pts") &&
          col("rts") <= col("pts") + expr(s"interval $lookahead"),
        "leftOuter")
      .groupBy(col("pkey").as("key"), col("pts"))
      .agg(min(when(col("rts").isNotNull,
        struct(col("rts"), col("rvalue")))).as("__asof"))
      .select(col("key"), col("pts").as("ts"),
        col("__asof.rts").as("asof_ts"),
        col("__asof.rvalue").as("asof_value"))
  }

  /** NEAREST streaming as-of — the streaming twin of the batch
    * `AsOfJoin.leftAsOf(direction = "nearest")` (q178): enrich each
    * probe with the reading closest in ABSOLUTE gap, looking up to
    * `lookback` behind and `lookahead` ahead; exact gap ties resolve
    * BACKWARD (the batch/pandas rule). One stream-stream join covers
    * both directions — the event-time range is
    * `pts − lookback ≤ rts ≤ pts + lookahead` (both states stay
    * watermark-bounded) — and the collapse is a lexicographic `min`
    * over (|gap|, direction-rank, rts, rvalue): smallest gap first,
    * backward (rank 0) beating forward (rank 1) on equal gap. The two
    * bounds are the per-direction tolerances, applied BEFORE the
    * choice exactly as the batch operator documents — a too-far
    * backward candidate never shadows an in-range forward one. A probe
    * emits once the combined watermark passes `pts + lookahead`;
    * windows that close empty emit NULLs.
    */
  def enrichNearest(
      probes: DataFrame,
      readings: DataFrame,
      keyCol: String = "key",
      tsCol: String = "ts",
      valueCol: String = "value",
      lookback: String = "10 minutes",
      lookahead: String = "10 minutes",
      watermarkDelay: String = "1 minute"): DataFrame = {
    val p = probes.select(
        col(keyCol).cast("string").as("pkey"),
        col(tsCol).cast("timestamp").as("pts"))
      .withWatermark("pts", watermarkDelay)
    val r = readings.select(
        col(keyCol).cast("string").as("rkey"),
        col(tsCol).cast("timestamp").as("rts"),
        col(valueCol).cast("double").as("rvalue"))
      .withWatermark("rts", watermarkDelay)
    p.join(r,
        col("pkey") === col("rkey") &&
          col("rts") >= col("pts") - expr(s"interval $lookback") &&
          col("rts") <= col("pts") + expr(s"interval $lookahead"),
        "leftOuter")
      .groupBy(col("pkey").as("key"), col("pts"))
      .agg(min(when(col("rts").isNotNull,
        struct(
          abs(unix_micros(col("rts")) - unix_micros(col("pts"))).as("gap"),
          when(col("rts") <= col("pts"), lit(0)).otherwise(lit(1)).as("dir"),
          col("rts"), col("rvalue")))).as("__asof"))
      .select(col("key"), col("pts").as("ts"),
        col("__asof.rts").as("asof_ts"),
        col("__asof.rvalue").as("asof_value"))
  }
}
