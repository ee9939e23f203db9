package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** As-of join: for each left row, attach the right row nearest in time
  * for the same key (the temporal generalization of the reference's
  * last-value-per-tag table,
  * /root/reference/OPC2MongoDB/Program.cs:1179-1182). Directions:
  *
  *   - `backward` (default): latest right with `right.ts <= left.ts` —
  *     DuckDB `ASOF JOIN ... ON l.ts >= r.ts`, pandas `merge_asof`
  *     backward.
  *   - `forward`: earliest right with `right.ts >= left.ts`.
  *   - `nearest`: whichever of the two is closer in absolute gap; exact
  *     ties resolve BACKWARD (deterministic, matches pandas).
  *
  * `toleranceMicros` bounds the match gap: a candidate farther than the
  * tolerance is no match (the left row keeps null payload). Under
  * `nearest` the tolerance applies to each direction BEFORE choosing, so
  * a too-far backward match never shadows an in-range forward one.
  *
  * Spark-first implementation: instead of a non-equi join (which Spark
  * plans as a broadcast-nested-loop — O(n*m) and never acceptable at
  * 100 TB), tag both inputs, UNION them, and run window passes per key:
  * right rows carry their payload as a single struct via
  * `last(struct, ignoreNulls = true)` (all fields from the same matched
  * right row — carrying columns independently would let a null field
  * borrow from an older row), left rows read it. Cost: exactly ONE
  * shuffle on the key; `backward` adds one sort, `forward`/`nearest` a
  * second sort of the same exchange (no extra shuffle — the descending
  * pass reuses the partitioning). At equal timestamps the right row
  * sorts first in BOTH passes, so equality is inclusive in every
  * direction (DuckDB ASOF semantics).
  *
  * Requirement: at most one right row per (key, ts) — pre-aggregate the
  * right side if that doesn't hold (ties would otherwise be resolved by
  * an arbitrary carried row).
  */
object AsOfJoin {

  /** @param left            left rows; must contain `keyCol` and `tsCol`
    * @param right           right rows; must contain `keyCol` and `tsCol`, unique per (key, ts)
    * @param keyCol          equi-join key column name
    * @param tsCol           event-time column name (same name on both sides)
    * @param payload         right-side column names to attach to each left row
    * @param direction       "backward" | "forward" | "nearest"
    * @param toleranceMicros max |left.ts - right.ts| in microseconds
    *                        (timestamp ts) or plain units (numeric ts)
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String],
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(keyCol) && !payload.contains(tsCol),
      "payload must not repeat the key/ts columns")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(toleranceMicros.forall(_ >= 0), "tolerance must be non-negative")

    // the carried struct leads with the matched right row's OWN ts (gap
    // computation for tolerance/nearest), then the payload fields
    val leftOnly = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val payloadStruct = struct((col(tsCol).as("__rts") +: payload.map(col)): _*)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(right.select(payloadStruct).schema.head.dataType))
    val r = leftOnly.foldLeft(
        right.withColumn("__side", lit(0)).withColumn("__payload", payloadStruct)) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val outCols = leftCols ++ Seq("__payload", "__side")
    val unioned = l.select(outCols.map(col): _*)
      .unionByName(r.select(outCols.map(col): _*))

    // ascending pass = backward carry; descending pass = forward carry.
    // side asc in both: at equal ts the right row precedes the left row,
    // making the equality inclusive in both directions.
    val wBack = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // gap math is only needed for a tolerance or for nearest's choice;
    // it restricts the ts axis to types with a numeric distance, so the
    // plain backward/forward carries skip it entirely — any ORDERABLE ts
    // axis (strings, dates, ...) keeps working there, exactly like the
    // original backward-only implementation
    val needsGap = toleranceMicros.isDefined || direction == "nearest"
    def asGapUnits(c: Column): Column = left.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.DateType =>
        // calendar-day semantics: a day gap is exactly 86 400 s of µs
        // regardless of the session time zone. Casting date→timestamp
        // instead would route through the session zone, where DST
        // transitions make some days 23 h/25 h and shift tolerance
        // comparisons by an hour under non-UTC zones.
        (unix_date(c).cast("long") * lit(86400000000L)).cast("double")
      case TimestampType | TimestampNTZType =>
        // exact up to 2^53 µs ≈ 285 years of gap — far past any tolerance
        unix_micros(c.cast(TimestampType)).cast("double")
      case _: org.apache.spark.sql.types.NumericType =>
        c.cast("double") // fractional axes keep fractional gaps
      case other =>
        throw new IllegalArgumentException(
          s"direction=nearest / tolerance need a timestamp, date, or numeric " +
            s"ts axis to measure gaps; got $other for $tsCol")
    }
    if (needsGap) asGapUnits(col(tsCol)) // validate the axis at plan time
    // gap is null when the carry found nothing — every comparison below
    // treats null as "no candidate"
    def withinTol(gap: Column): Column = toleranceMicros
      .map(t => gap <= lit(t.toDouble)).getOrElse(gap.isNotNull)

    val carried = direction match {
      case "backward" if !needsGap =>
        unioned.withColumn("__payload",
          last(col("__payload"), ignoreNulls = true).over(wBack))
      case "forward" if !needsGap =>
        unioned.withColumn("__payload",
          last(col("__payload"), ignoreNulls = true).over(wFwd))
      case "backward" =>
        unioned.withColumn("__p", last(col("__payload"), ignoreNulls = true).over(wBack))
          .withColumn("__gap",
            asGapUnits(col(tsCol)) - asGapUnits(col("__p").getField("__rts")))
          .withColumn("__payload", when(withinTol(col("__gap")), col("__p")))
      case "forward" =>
        unioned.withColumn("__p", last(col("__payload"), ignoreNulls = true).over(wFwd))
          .withColumn("__gap",
            asGapUnits(col("__p").getField("__rts")) - asGapUnits(col(tsCol)))
          .withColumn("__payload", when(withinTol(col("__gap")), col("__p")))
      case "nearest" =>
        unioned
          .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wBack))
          .withColumn("__f", last(col("__payload"), ignoreNulls = true).over(wFwd))
          .withColumn("__bg", asGapUnits(col(tsCol)) - asGapUnits(col("__b").getField("__rts")))
          .withColumn("__fg", asGapUnits(col("__f").getField("__rts")) - asGapUnits(col(tsCol)))
          // tolerance per direction FIRST, then nearest-wins, ties
          // backward. coalesce: a missing candidate makes withinTol NULL
          // under a tolerance (null gap <= t), and three-valued logic
          // would then void the OTHER direction's valid match in the
          // `!__fOk` disjunct below — absence must be a hard false
          .withColumn("__bOk", coalesce(withinTol(col("__bg")), lit(false)))
          .withColumn("__fOk", coalesce(withinTol(col("__fg")), lit(false)))
          .withColumn("__payload",
            when(col("__bOk") && (!col("__fOk") || col("__bg") <= col("__fg")), col("__b"))
              .when(col("__fOk"), col("__f")))
    }
    payload.foldLeft(carried.filter(col("__side") === 1)) { (df, c) =>
        df.withColumn(c, col("__payload").getField(c))
      }
      .select((leftCols ++ payload).map(col): _*)
  }
}
