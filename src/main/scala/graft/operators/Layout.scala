package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-dimension
  * data skipping — the Delta/Iceberg `OPTIMIZE ZORDER BY` idea, expressed
  * with plain Spark primitives. Interleaving the bits of two key columns
  * gives a 1-D sort order under which ranges of BOTH columns are spatially
  * clustered, so per-file min/max statistics prune files for predicates on
  * either column (a single-column sort clusters one dimension perfectly
  * and leaves the other scattered across every file).
  *
  * 100 TB posture: the z-value is a pure codegen'd column expression (bit
  * shifts/ors — no UDF), and the layout write is one
  * `repartitionByRange(z)` (range-exchange with sampled bounds) +
  * `sortWithinPartitions` — exactly one shuffle, no global sort barrier.
  * Pairs with `TxTable` per-file column stats: write z-ordered, commit
  * with stats, and point/range reads on either dimension skip most files.
  */
object Layout {

  /** Morton interleave of the low 16 bits of two non-negative integral
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    * bitwise Column arithmetic (codegen'd, no carries — terms combine with
    * OR).
    */
  def zorder16(x: Column, y: Column): Column = {
    val xm = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ym = y.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16)
      .map { i =>
        shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce(_ bitwiseOR _)
  }

  /** DuckDB-SQL twin of [[zorder16]] (identical bit arithmetic), for
    * oracle pairing. `x`/`y` are SQL expressions of integral type.
    */
  def zorder16Sql(x: String, y: String): String = {
    val terms = (0 until 16).map { i =>
      s"(((((($x)::BIGINT & 65535) >> $i) & 1) << ${2 * i}) | " +
        s"((((($y)::BIGINT & 65535) >> $i) & 1) << ${2 * i + 1}))"
    }
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` clustered by the z-order of (xCol, yCol) into `numFiles`
    * parquet files: range-partition on the z-value (sampled bounds — no
    * global sort), sort within each partition, drop the helper column.
    */
  def zorderWrite(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numFiles: Int): Unit =
    df.withColumn("__z", zorder16(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
