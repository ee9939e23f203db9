package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LOCF resampler — the historian "sampled mode" the reference's
  * current-value store implies but never materializes (its Mongo documents
  * hold last value only; trend clients poll): emit, per key, one row at
  * every `tickMs` boundary carrying the last value at or before that
  * boundary — across micro-batches, restarts, and idle stretches. The
  * streaming twin of the batch gap-fill (q72 LOCF).
  *
  * Correctness contract (event-time, not processing-time): a tick t is
  * emitted only once the WATERMARK passes t, so any in-order-or-late event
  * with ts ≤ t that the watermark still admits has been folded in before
  * t's value is fixed. Events beyond the watermark wait in per-key pending
  * state (bounded by the watermark delay × arrival rate). Idle keys keep
  * ticking via event-time TIMEOUTS (fired by watermark advance from OTHER
  * keys' traffic — the standard Structured Streaming idiom); after
  * `maxStale` consecutive event-free ticks the key's state is dropped
  * (bounded state for dead tags — the next event re-registers it).
  *
  * One stateful stage, keyed by tag: state is O(pending + constants) per
  * key; emission per trigger is O(ticks elapsed), not O(history).
  */
object StreamingResample {

  /** One incoming reading; the TIMESTAMP column stays a timestamp so the
    * watermark tracks it through to the stateful operator.
    */
  final case class Reading(key: String, eventTime: java.sql.Timestamp, value: Double)

  /** One resampled output row. `stale` = no event fell in (prevTick, tick]
    * — the value is carried (LOCF), not observed.
    */
  final case class Tick(key: String, tickMs: Long, value: Double, stale: Boolean)

  /** Per-key state. `lastTick` = last emitted boundary; `pending` holds
    * events not yet fixed into any emitted tick (ts > lastTick emission
    * watermark), ts-ascending. `haveValue` guards the pre-first-event
    * window; `staleRun` counts consecutive carried ticks for the
    * `maxStale` cutoff.
    */
  final case class ResampleState(
      lastTick: Long,
      lastValue: Double,
      haveValue: Boolean,
      pending: List[(Long, Double)],
      staleRun: Int)

  /** Resample `df` (keyCol STRING, tsCol TIMESTAMP, valueCol DOUBLE) to
    * `tickMs` LOCF ticks. The first tick of a key is the first boundary ≥
    * its first event. `watermarkDelay` sets the lateness bound (and thus
    * the emission lag and pending-state size).
    */
  def locfTicks(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tickMs: Long,
      watermarkDelay: String = "0 seconds",
      maxStale: Int = 8): Dataset[Tick] = {
    require(tickMs > 0 && maxStale >= 0, "tickMs must be positive, maxStale >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("eventTime"),
        col(valueCol).cast("double").as("value"))
      .withWatermark("eventTime", watermarkDelay)
      .as[Reading]
      .groupByKey(_.key)
      .flatMapGroupsWithState[ResampleState, Tick](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[ResampleState]) =>
          val wm = state.getCurrentWatermarkMs()
          val fresh: List[(Long, Double)] = if (state.hasTimedOut) Nil
            else rows.toList.map(r => (r.eventTime.getTime, r.value)).sorted
          var st = state.getOption match {
            case Some(s) => s.copy(pending = mergeAsc(s.pending, fresh))
            case None =>
              // first boundary ≥ first event: lastTick one step below it
              val first = fresh.head._1
              val firstBoundary = math.floorDiv(first + tickMs - 1, tickMs) * tickMs
              ResampleState(firstBoundary - tickMs, 0.0, haveValue = false, fresh, 0)
          }
          val out = List.newBuilder[Tick]
          var dropped = false
          var continue = true
          while (continue && st.lastTick + tickMs <= wm) {
            val tick = st.lastTick + tickMs
            val (applied, rest) = st.pending.span(_._1 <= tick)
            val observed = applied.nonEmpty
            val value = if (observed) applied.last._2 else st.lastValue
            val have = st.haveValue || observed
            if (have) {
              val run = if (observed) 0 else st.staleRun + 1
              if (run > maxStale && st.pending.isEmpty) {
                // dead tag: stop carrying; next event re-registers the key
                dropped = true
                continue = false
              } else if (run > maxStale) {
                // stale budget spent but data IS in flight: suspend (emit
                // nothing) and fast-forward to the boundary just below the
                // next pending event — never drop admitted events. The
                // jump is CAPPED at the watermark boundary: ticks beyond
                // the watermark are not yet fixed, and a still-admissible
                // event may land in them on a later trigger (skipping past
                // the watermark would silently swallow it)
                val next = st.pending.head._1
                val wmBoundary = math.floorDiv(wm, tickMs) * tickMs
                val resumeTick = math.min(
                  math.max(tick, math.floorDiv(next + tickMs - 1, tickMs) * tickMs - tickMs),
                  wmBoundary)
                st = st.copy(lastTick = resumeTick)
              } else {
                out += Tick(key, tick, value, !observed)
                st = ResampleState(tick, value, haveValue = true, rest, run)
              }
            } else {
              // watermark passed a boundary before the key's first event
              // (possible only transiently on re-registration): skip it
              st = st.copy(lastTick = tick, pending = rest)
            }
          }
          if (dropped || (st.pending.isEmpty && !st.haveValue)) state.remove()
          else {
            state.update(st)
            // fire when the watermark passes the next boundary even if no
            // further events arrive for this key; must sit strictly above
            // the current watermark or the registration throws
            state.setTimeoutTimestamp(math.max(st.lastTick + tickMs, wm + 1))
          }
          out.result().iterator
      }
  }

  /** Merge two ts-ascending lists (state pending + this trigger's sorted
    * arrivals) preserving order — O(n), no re-sort of the carried tail.
    */
  private def mergeAsc(
      a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] = {
    val out = List.newBuilder[(Long, Double)]
    var x = a
    var y = b
    while (x.nonEmpty && y.nonEmpty) {
      if (x.head._1 <= y.head._1) { out += x.head; x = x.tail }
      else { out += y.head; y = y.tail }
    }
    out ++= x
    out ++= y
    out.result()
  }
}
