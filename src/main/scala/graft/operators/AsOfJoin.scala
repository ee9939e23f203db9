package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` for the same key (the temporal generalization of
  * the reference's last-value-per-tag table,
  * /root/reference/OPC2MongoDB/Program.cs:1179-1182).
  *
  * Spark-first implementation: instead of a non-equi join (which Spark
  * plans as a broadcast-nested-loop — O(n*m) and never acceptable at
  * 100 TB), tag both inputs, UNION them, and run one window pass per key
  * ordered by (ts, side): right rows carry their payload forward as a
  * single struct via `last(struct, ignoreNulls = true)` (all fields from
  * the same matched right row), left rows read it. Cost: exactly one
  * shuffle on the key, linear scan per partition, no state blow-up. At
  * equal timestamps the right row sorts first, so the semantics match an
  * inclusive `left.ts >= right.ts` as-of (DuckDB's ASOF JOIN).
  *
  * Requirement: at most one right row per (key, ts) — pre-aggregate the
  * right side if that doesn't hold (ties would otherwise be resolved by
  * an arbitrary carried row).
  */
object AsOfJoin {

  /** @param left       left rows; must contain `keyCol` and `tsCol`
    * @param right      right rows; must contain `keyCol` and `tsCol`, unique per (key, ts)
    * @param keyCol     equi-join key column name
    * @param tsCol      event-time column name (same name on both sides)
    * @param payload    right-side column names to attach to each left row
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(keyCol) && !payload.contains(tsCol),
      "payload must not repeat the key/ts columns")

    // align schemas: left gets a null payload struct, right gets null
    // left-only slots. The payload travels as ONE struct column so that
    // `last(ignoreNulls)` either carries a whole right row or none of it —
    // carrying each payload column independently would let a right row
    // with a null field borrow that field from an older right row (row
    // tearing). A right row whose payload fields are all null still
    // produces a non-null struct, so it is matched as-is.
    val leftOnly = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val payloadStruct = struct(payload.map(col): _*)
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

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("__side") === 1)) { (df, c) =>
        df.withColumn(c, col("__payload").getField(c))
      }
      .drop("__side", "__payload")
  }
}
