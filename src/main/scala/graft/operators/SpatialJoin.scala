package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial join: points × axis-aligned rectangles with
  * INCLUSIVE bounds — the 2-D sibling of [[RangeJoin]] (1-D intervals).
  * No reference analog (SURVEY.md §2.11 surface).
  *
  * Spark shape — the same never-cross-product discipline as the dedup
  * family: rectangles explode to the grid cells they cover, points map
  * to their ONE cell, candidates come from a plain equi-join on
  * (cx, cy), and the exact containment predicate filters after. A
  * (point, rect) pair can meet in exactly one cell (the point's), so
  * the join emits no duplicates to deduplicate — no `distinct`, no
  * window, no shuffle beyond the one equi-join.
  *
  * Cell size is the tuning knob: cells ≫ rects waste the filter, cells
  * ≪ rects explode the build side. A rectangle covering more than
  * `maxCellsPerRect` cells fails LOUDLY — a world-sized rectangle
  * belongs on a broadcast plan, not a 10⁶-row explode, and silently
  * accepting it is how grid joins die at scale.
  */
object SpatialJoin {

  /** Join `points` (with numeric `px`, `py`) to `rects` (with numeric
    * `xlo` ≤ `xhi`, `ylo` ≤ `yhi`): returns point-columns × rect-columns
    * for every containment hit. Malformed rectangles (lo > hi) and
    * oversized rectangles fail loudly.
    */
  def pointInRect(
      points: DataFrame, px: String, py: String,
      rects: DataFrame, xlo: String, ylo: String, xhi: String, yhi: String,
      cellSize: Long,
      maxCellsPerRect: Long = 100000L): DataFrame = {
    require(cellSize > 0, s"cellSize $cellSize must be positive")
    def cellOf(c: Column): Column = floor(c / lit(cellSize.toDouble)).cast("long")
    val checked = rects.withColumn("__span", {
      val bad = col(xlo) > col(xhi) || col(ylo) > col(yhi)
      val span = (cellOf(col(xhi)) - cellOf(col(xlo)) + 1) *
        (cellOf(col(yhi)) - cellOf(col(ylo)) + 1)
      when(bad, raise_error(concat(lit("malformed rectangle: lo > hi at "),
          col(xlo).cast("string"), lit(","), col(ylo).cast("string"))))
        .when(span > maxCellsPerRect, raise_error(concat(
          lit(s"rectangle covers more than $maxCellsPerRect grid cells "),
          lit("(span "), span.cast("string"),
          lit(") — broadcast it instead of exploding the grid"))))
        .otherwise(span)
    })
    val rectCells = checked
      .withColumn("__cx", explode(sequence(cellOf(col(xlo)), cellOf(col(xhi)))))
      .withColumn("__cy", explode(sequence(cellOf(col(ylo)), cellOf(col(yhi)))))
      .drop("__span")
    val pts = points
      .withColumn("__cx", cellOf(col(px)))
      .withColumn("__cy", cellOf(col(py)))
    pts.join(rectCells, Seq("__cx", "__cy"))
      .filter(col(px) >= col(xlo) && col(px) <= col(xhi) &&
        col(py) >= col(ylo) && col(py) <= col(yhi))
      .drop("__cx", "__cy")
  }
}
